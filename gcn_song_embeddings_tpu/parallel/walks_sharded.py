"""Edge-partitioned random walks: the graph CSR sharded across devices.

`ops/walks.py` assumes the whole bipartite CSR fits in one chip's HBM
(true to ~10^8 edges).  Beyond that, the north-star design (SURVEY §2.2)
edge-partitions the graph: each device owns a contiguous row range of the
item->collection table and of the collection->item table, plus the
corresponding slices of the flat `indices` arrays.  Walkers stay pinned to
their device; every hop performs its two neighbor lookups REMOTELY through
the same all_gather + psum_scatter exchange used for sharded feature
tables (parallel/gather.py):

    1. gather (start, degree) for each walker's current node from the
       row-sharded offset table,
    2. pick a uniform slot, gather the neighbor id from the nnz-sharded
       indices array.

Four collective gathers per hop (2 per bipartite step) ride ICI; all
shapes static.  Distribution is identical to the single-chip kernel
(statistical test on the virtual CPU mesh).

Sharding layout (built by `shard_graph`):
    i2c_off  [n_items, 2] int32  (start, degree), row-sharded
    i2c_idx  [nnz] int32         neighbor ids, sharded by nnz ranges
    c2i_off / c2i_idx            likewise for the reverse direction
Row/nnz counts are padded to multiples of the graph-axis size.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcn_song_embeddings_tpu.data.device import DeviceGraph
from gcn_song_embeddings_tpu.parallel.gather import sharded_table_gather
from gcn_song_embeddings_tpu.parallel.mesh import pad_to_multiple
from gcn_song_embeddings_tpu.ops.walks import uniform_slot
from gcn_song_embeddings_tpu.utils.pipeline import lagged


class ShardedGraph(NamedTuple):
    i2c_off: jnp.ndarray   # [n_items_pad, 2] (start, deg), row-sharded
    i2c_idx: jnp.ndarray   # [nnz_pad, 1], nnz-sharded
    c2i_off: jnp.ndarray
    c2i_idx: jnp.ndarray
    n_items: int
    n_cols: int


def _check_int32_extent(n_edges: int) -> None:
    """Edge offsets ride int32 gathers; past 2^31 they would wrap silently
    (clamped gathers returning row-0 garbage).  int64 edge tables are the
    upgrade path when a single shard's extent exceeds this."""
    if n_edges >= np.iinfo(np.int32).max:
        raise ValueError(
            f"graph has {n_edges} directed edges, exceeding the int32 "
            f"offset range of the sharded walk tables; split the edge "
            f"arrays further or extend the tables to int64")


def shard_graph(graph: DeviceGraph, mesh: Mesh, axis: str = "graph"
                ) -> ShardedGraph:
    """Partition the bipartite CSR across `axis` (edge partitioning)."""
    g = mesh.shape[axis]
    spec = NamedSharding(mesh, P(axis, None))
    _check_int32_extent(max(len(graph.i2c_indices), len(graph.c2i_indices)))

    def offsets(indptr):
        ptr = np.asarray(indptr, dtype=np.int64)
        out = np.stack([ptr[:-1], np.diff(ptr)], axis=1).astype(np.int32)
        pad = pad_to_multiple(out.shape[0], g) - out.shape[0]
        return jax.device_put(np.pad(out, ((0, pad), (0, 0))), spec)

    def flat(indices):
        arr = np.asarray(indices, dtype=np.int32)[:, None]
        pad = pad_to_multiple(arr.shape[0], g) - arr.shape[0]
        return jax.device_put(np.pad(arr, ((0, pad), (0, 0))), spec)

    return ShardedGraph(
        i2c_off=offsets(graph.i2c_indptr), i2c_idx=flat(graph.i2c_indices),
        c2i_off=offsets(graph.c2i_indptr), c2i_idx=flat(graph.c2i_indices),
        n_items=graph.n_items, n_cols=graph.n_cols)


class ShardedFusedGraph(NamedTuple):
    """Extent-joined edge tables, sharded (see ops.walks.fused_walk_tables):
    each edge row carries its target's (start, degree), so a two-step hop
    costs TWO collective gathers instead of four — on the partitioned path
    every eliminated gather is an all_gather/psum_scatter (or ppermute
    ring) over ICI, so this halves the per-hop collective traffic too."""

    origin_ext: jnp.ndarray  # [n_items_pad, 2] (i2c start, deg), row-sharded
    i2c_ext: jnp.ndarray     # [nnz_pad, 2] target col's (c2i start, deg)
    c2i_ext: jnp.ndarray     # [nnz_pad, 3] (item id, i2c start, i2c deg)
    n_items: int
    n_cols: int


def shard_graph_fused(graph: DeviceGraph, mesh: Mesh, axis: str = "graph"
                      ) -> ShardedFusedGraph:
    """Partition extent-joined edge tables across `axis`."""
    g = mesh.shape[axis]
    spec = NamedSharding(mesh, P(axis, None))
    _check_int32_extent(max(len(graph.i2c_indices), len(graph.c2i_indices)))

    i2c_ptr = np.asarray(graph.i2c_indptr, dtype=np.int64)
    c2i_ptr = np.asarray(graph.c2i_indptr, dtype=np.int64)
    i2c_deg = np.diff(i2c_ptr)
    c2i_deg = np.diff(c2i_ptr)
    cols = np.asarray(graph.i2c_indices, dtype=np.int64)
    items = np.asarray(graph.c2i_indices, dtype=np.int64)

    def put(arr):
        arr = arr.astype(np.int32)
        pad = pad_to_multiple(arr.shape[0], g) - arr.shape[0]
        return jax.device_put(np.pad(arr, ((0, pad), (0, 0))), spec)

    return ShardedFusedGraph(
        origin_ext=put(np.stack([i2c_ptr[:-1], i2c_deg], axis=1)),
        i2c_ext=put(np.stack([c2i_ptr[cols], c2i_deg[cols]], axis=1)),
        c2i_ext=put(np.stack([items, i2c_ptr[items], i2c_deg[items]],
                             axis=1)),
        n_items=graph.n_items, n_cols=graph.n_cols)


def _remote_neighbor(off_local, idx_local, nodes, u, axis):
    """Uniform random neighbor via two collective gathers."""
    off = sharded_table_gather(off_local, nodes, axis)      # [W, 2]
    start, deg = off[:, 0], off[:, 1]
    nb = sharded_table_gather(idx_local, start + uniform_slot(u, deg),
                              axis)                          # [W, 1]
    return nb[:, 0]


def make_sharded_walker_fused(mesh: Mesh, sg: ShardedFusedGraph,
                              n_hops: int, alpha: float,
                              axis: str = "graph", n_chains: int = 1):
    """Edge-partitioned walker over extent-joined tables: 2 collective
    gathers per hop (vs 4 in make_sharded_walker), same trace contract."""
    all_axes = tuple(mesh.axis_names)
    if n_chains > 1 and n_hops % n_chains:
        raise ValueError(f"n_chains={n_chains} must divide n_hops={n_hops}")
    hops = n_hops // n_chains if n_chains > 1 else n_hops

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None),
                       P(all_axes), P()),
             out_specs=P(all_axes, None), check_vma=False)
    def walk(origin_ext, i2c_ext, c2i_ext, nodeset, key):
        dev = lax.axis_index(all_axes)
        key = jax.random.fold_in(key, dev)
        origins = (jnp.repeat(nodeset, n_chains) if n_chains > 1
                   else nodeset)
        w = origins.shape[0]
        uniforms = jax.random.uniform(key, (hops, w, 3))
        org_ext = sharded_table_gather(origin_ext, origins, axis)  # once

        def hop(cur_ext, u):
            s1, d1 = cur_ext[:, 0], cur_ext[:, 1]
            col_ext = sharded_table_gather(
                i2c_ext, s1 + uniform_slot(u[:, 0], d1), axis)     # [W, 2]
            s2, d2 = col_ext[:, 0], col_ext[:, 1]
            row = sharded_table_gather(
                c2i_ext, s2 + uniform_slot(u[:, 1], d2), axis)     # [W, 3]
            item = row[:, 0]
            nxt = jnp.where(u[:, 2, None] < alpha, org_ext, row[:, 1:3])
            return nxt, item

        _, trace = lax.scan(hop, org_ext, uniforms)
        trace = trace.T
        if n_chains > 1:
            trace = trace.reshape(nodeset.shape[0], n_hops)
        return trace

    def walks(nodeset: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        return walk(sg.origin_ext, sg.i2c_ext, sg.c2i_ext,
                    nodeset.astype(jnp.int32), key)

    return walks


def make_sharded_walker(mesh: Mesh, sg: ShardedGraph, n_hops: int,
                        alpha: float, axis: str = "graph",
                        n_chains: int = 1):
    """Returns jitted walks(nodeset [W], key) -> trace [W, n_hops] with the
    nodeset sharded over ALL mesh axes and the graph sharded over `axis`.

    `n_chains` splits each origin's hop budget into that many lockstep
    sub-chains (same near-exact semantics as ops.walks.walks_from_tables);
    each collective gather carries n_chains x more walker rows while the
    sequential hop count drops by the same factor."""
    all_axes = tuple(mesh.axis_names)
    if n_chains > 1 and n_hops % n_chains:
        raise ValueError(f"n_chains={n_chains} must divide n_hops={n_hops}")
    hops = n_hops // n_chains if n_chains > 1 else n_hops

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None),
                       P(axis, None), P(all_axes), P()),
             out_specs=P(all_axes, None), check_vma=False)
    def walk(i2c_off, i2c_idx, c2i_off, c2i_idx, nodeset, key):
        dev = lax.axis_index(all_axes)
        key = jax.random.fold_in(key, dev)
        origins = (jnp.repeat(nodeset, n_chains) if n_chains > 1
                   else nodeset)
        w = origins.shape[0]
        uniforms = jax.random.uniform(key, (hops, w, 3))

        def hop(cur, u):
            col = _remote_neighbor(i2c_off, i2c_idx, cur, u[:, 0], axis)
            item = _remote_neighbor(c2i_off, c2i_idx, col, u[:, 1], axis)
            nxt = jnp.where(u[:, 2] < alpha, origins, item)
            return nxt, item

        _, trace = lax.scan(hop, origins, uniforms)
        trace = trace.T                              # [w_local, hops]
        if n_chains > 1:
            trace = trace.reshape(nodeset.shape[0], n_hops)
        return trace

    def walks(nodeset: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        return walk(sg.i2c_off, sg.i2c_idx, sg.c2i_off, sg.c2i_idx,
                    nodeset.astype(jnp.int32), key)

    return walks


def precompute_neighborhoods_partitioned(graph: DeviceGraph, cfg, mesh: Mesh,
                                         path: str | None = None,
                                         seed: int = 0,
                                         verbose: bool = False):
    """All-node PPR sweep over an edge-partitioned graph.

    The counterpart of ops.ppr.precompute_neighborhoods for graphs whose
    CSR exceeds one chip's HBM: the graph lives sharded across the mesh's
    `graph` axis and walkers are spread over every device.  Counting/top-T
    runs on the gathered [W, n_hops] traces (graph-size independent).
    """
    from gcn_song_embeddings_tpu.ops.ppr import (
        _load_cache,
        _save_cache,
        effective_chains,
        visit_counts_topt,
    )

    n_items = graph.n_items
    T = cfg.t_precompute
    cached = _load_cache(path, n_items, T, cfg, seed, graph.n_edges)
    if cached is not None:
        return cached

    chains = effective_chains(cfg.n_hops, cfg.parallel_chains)
    if cfg.fused_tables:
        walker = make_sharded_walker_fused(
            mesh, shard_graph_fused(graph, mesh), cfg.n_hops, cfg.alpha,
            n_chains=chains)
    else:
        walker = make_sharded_walker(mesh, shard_graph(graph, mesh),
                                     cfg.n_hops, cfg.alpha,
                                     n_chains=chains)
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    sweep = pad_to_multiple(cfg.batch_walkers, n_dev)

    all_w = np.zeros((n_items, T), dtype=np.float32)
    all_n = np.zeros((n_items, T), dtype=np.int32)
    base_key = jax.random.PRNGKey(seed)

    # One-deep software pipeline (utils/pipeline.py): the host copy-out of
    # sweep i-1 rides behind sweep i's collective walk instead of
    # serializing after it.
    def dispatch(start):
        stop = min(start + sweep, n_items)
        nodeset = np.arange(start, start + sweep, dtype=np.int32) % n_items
        trace = walker(jnp.asarray(nodeset),
                       jax.random.fold_in(base_key, start))
        w, n = visit_counts_topt(trace, jnp.asarray(nodeset), T)
        return start, stop, w, n

    for start, stop, w, n in lagged(
            dispatch(s) for s in range(0, n_items, sweep)):
        valid = stop - start
        all_w[start:stop] = np.asarray(w)[:valid]
        all_n[start:stop] = np.asarray(n)[:valid]
        if verbose:
            print(f"neighborhoods[partitioned]: {stop}/{n_items} done")
    _save_cache(path, all_w, all_n, cfg, seed, graph.n_edges)
    return all_w, all_n
