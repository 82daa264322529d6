"""On-device random-walk simulation over the HBM-resident bipartite CSR.

Reference behavior (pinsage_model.py:32-53): for each node in a nodeset, run
`n_hops` two-step walks (item -> uniform random collection -> uniform random
item), record the reached item after every hop, and restart to the origin
with probability `alpha` AFTER each hop (note: alpha is the *restart*
probability — the reference's inverted-PPR convention, pinsage_model.py:50-51).

The reference executes this as a doubly-nested interpreted Python loop over
DGL `g.successors` calls — its #1 hot spot (SURVEY §3.1).  Here the entire
batch of walkers advances in lockstep inside a single `lax.scan` over hops:
each hop is two vectorized CSR gathers + threefry PRNG, so the TPU runs
O(B) walkers per step at HBM-gather throughput with zero host round-trips.

The hop loop is gather-latency-bound, so the CSR row extents are packed:
a (start, degree) pair lives in one [N, 2] int32 row and costs ONE gather
instead of two indptr lookups (same trick as models.pinsage.pack_nbhds) —
4 gathers per two-step hop instead of 6.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from gcn_song_embeddings_tpu.data.device import DeviceGraph


def walk_tables(graph: DeviceGraph) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Packed CSR row extents: ([n_items, 2], [n_cols, 2]) int32 rows of
    (row start, degree) for the i2c and c2i directions.  Build ONCE outside
    any scan that advances walkers (cheap O(N), but inside a scan body it
    would re-materialize every step)."""
    def pack(indptr):
        return jnp.stack([indptr[:-1], jnp.diff(indptr)], axis=1)

    return pack(graph.i2c_indptr), pack(graph.c2i_indptr)


def uniform_slot(u: jnp.ndarray, deg: jnp.ndarray) -> jnp.ndarray:
    """Uniform neighbor slot: min(floor(u * deg), deg - 1), degree-0 rows
    clamped to slot 0.  THE single definition — every walker variant
    (packed, fused, sharded) must replay bit-identical chains, which
    requires byte-for-byte identical slot arithmetic."""
    return jnp.minimum((u * deg.astype(u.dtype)).astype(jnp.int32),
                       jnp.maximum(deg - 1, 0))


def _uniform_neighbor_packed(extents: jnp.ndarray, indices: jnp.ndarray,
                             nodes: jnp.ndarray, u: jnp.ndarray
                             ) -> jnp.ndarray:
    """Pick a uniform random neighbor for each node in `nodes`.

    `extents` is the packed [N, 2] (start, degree) table; `u` is uniform
    [0, 1) per node.  Degree-0 nodes are clamped to their own first slot
    (the reference would crash on them; datasets guarantee degree >= 1 —
    see data/synth.py).
    """
    row = extents[nodes]                       # one gather: [m, 2]
    start, deg = row[:, 0], row[:, 1]
    return indices[start + uniform_slot(u, deg)]


def walks_from_tables(tables: tuple[jnp.ndarray, jnp.ndarray],
                      graph: DeviceGraph, nodeset: jnp.ndarray, n_hops: int,
                      alpha: float, key: jax.Array,
                      n_chains: int = 1) -> jnp.ndarray:
    """`random_walks` body over prebuilt packed tables (see walk_tables).

    `n_chains > 1` splits each origin's `n_hops` budget across that many
    LOCKSTEP-PARALLEL chains of n_hops/n_chains hops each (all starting at
    the origin, independent threefry streams).  The restart structure makes
    this near-exact: with restart probability `alpha` after every hop, a
    length-H chain is a bundle of i.i.d. origin-rooted segments of expected
    length 1/alpha hops, so cutting it into W sub-chains only *forces* a
    restart at W-1 boundaries where one would have occurred with
    probability alpha anyway — at alpha=0.85 that perturbs ~(W-1)*0.18
    of n_hops visits (<1% for W=25, validated by a distribution-distance
    test).  The payoff is hardware-shaped: the hop loop is HBM-gather-
    latency-bound, and the chip's gather throughput rises ~3.6x when the
    row batch grows from 4k to 100k+ (RESULTS.md), while sequential scan
    steps drop by W.
    """
    i2c, c2i = tables
    nodeset = nodeset.astype(jnp.int32)
    if n_chains > 1:
        if n_hops % n_chains:
            raise ValueError(f"n_chains={n_chains} must divide "
                             f"n_hops={n_hops}")
        origins = jnp.repeat(nodeset, n_chains)
        hops = n_hops // n_chains
    else:
        origins = nodeset
        hops = n_hops
    b = origins.shape[0]
    uniforms = jax.random.uniform(key, (hops, b, 3))

    def hop(cur: jnp.ndarray, u: jnp.ndarray):
        col = _uniform_neighbor_packed(i2c, graph.i2c_indices, cur, u[:, 0])
        item = _uniform_neighbor_packed(c2i, graph.c2i_indices, col, u[:, 1])
        nxt = jnp.where(u[:, 2] < alpha, origins, item)
        return nxt, item

    _, trace = lax.scan(hop, origins, uniforms)
    trace = trace.T                                   # [B*W, hops]
    if n_chains > 1:
        trace = trace.reshape(nodeset.shape[0], n_hops)
    return trace  # [B, n_hops]


def fused_walk_tables(graph: DeviceGraph
                      ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Extent-joined edge tables: 2 dependent gathers per two-step hop
    instead of 4.

    The hop loop is HBM-gather-LATENCY-bound (RESULTS.md: rate flat in
    batch size), so its speed is set by the length of the dependent-gather
    chain per hop: extents(cur) -> index -> extents(col) -> index.  The
    fix is a TPU-native space/latency trade — pre-join each edge target's
    row extents into the edge array itself:

      i2c_ext [nnz, 2] int32: for edge (item -> col), (c2i start, deg) OF
          THAT col — the walker never needs the collection id itself;
      c2i_ext [nnz, 3] int32: for edge (col -> item), (item id, i2c start,
          i2c deg) — the item id feeds the trace, the extents feed the
          next hop;
      origin_ext [n_items, 2]: (i2c start, deg) for restart targets,
          gathered ONCE per walker batch.

    The walker then carries its current (start, deg) through the scan and
    each hop costs exactly two dependent gathers.  HBM cost: 8 bytes/edge
    (i2c) + 12 bytes/edge (c2i) ≈ 2.5x the plain CSR — at dataset_large
    scale (11.7M directed edges) that is ~120 MB, trivial next to the
    feature table.  The chain is BIT-IDENTICAL to walks_from_tables under
    the same key (exactness test in tests/test_walks_ppr.py).
    """
    i2c_ptr = graph.i2c_indptr.astype(jnp.int32)
    c2i_ptr = graph.c2i_indptr.astype(jnp.int32)
    i2c_deg = jnp.diff(i2c_ptr)
    c2i_deg = jnp.diff(c2i_ptr)
    cols = graph.i2c_indices.astype(jnp.int32)
    items = graph.c2i_indices.astype(jnp.int32)
    i2c_ext = jnp.stack([c2i_ptr[cols], c2i_deg[cols]], axis=1)
    c2i_ext = jnp.stack([items, i2c_ptr[items], i2c_deg[items]], axis=1)
    origin_ext = jnp.stack([i2c_ptr[:-1], i2c_deg], axis=1)
    return origin_ext, i2c_ext, c2i_ext


def walks_from_fused_tables(tables, nodeset: jnp.ndarray, n_hops: int,
                            alpha: float, key: jax.Array,
                            n_chains: int = 1) -> jnp.ndarray:
    """`random_walks` body over fused_walk_tables (2 gathers/hop)."""
    origin_ext, i2c_ext, c2i_ext = tables
    nodeset = nodeset.astype(jnp.int32)
    if n_chains > 1:
        if n_hops % n_chains:
            raise ValueError(f"n_chains={n_chains} must divide "
                             f"n_hops={n_hops}")
        origins = jnp.repeat(nodeset, n_chains)
        hops = n_hops // n_chains
    else:
        origins = nodeset
        hops = n_hops
    b = origins.shape[0]
    uniforms = jax.random.uniform(key, (hops, b, 3))
    org_ext = origin_ext[origins]                     # gathered once

    def hop(cur_ext: jnp.ndarray, u: jnp.ndarray):
        s1, d1 = cur_ext[:, 0], cur_ext[:, 1]
        col_ext = i2c_ext[s1 + uniform_slot(u[:, 0], d1)]  # (c2i start, deg)
        s2, d2 = col_ext[:, 0], col_ext[:, 1]
        row = c2i_ext[s2 + uniform_slot(u[:, 1], d2)]  # (item, start, deg)
        item = row[:, 0]
        nxt = jnp.where(u[:, 2, None] < alpha, org_ext, row[:, 1:3])
        return nxt, item

    _, trace = lax.scan(hop, org_ext, uniforms)
    trace = trace.T                                   # [B*W, hops]
    if n_chains > 1:
        trace = trace.reshape(nodeset.shape[0], n_hops)
    return trace


@partial(jax.jit, static_argnames=("n_hops", "n_chains"))
def random_walks_fused(graph: DeviceGraph, nodeset: jnp.ndarray,
                       n_hops: int, alpha: float, key: jax.Array,
                       n_chains: int = 1) -> jnp.ndarray:
    """random_walks over extent-joined tables — same chain, half the
    dependent gathers per hop (see fused_walk_tables)."""
    return walks_from_fused_tables(fused_walk_tables(graph), nodeset,
                                   n_hops, alpha, key, n_chains=n_chains)


@partial(jax.jit, static_argnames=("n_hops", "n_chains"))
def random_walks(graph: DeviceGraph, nodeset: jnp.ndarray, n_hops: int,
                 alpha: float, key: jax.Array,
                 n_chains: int = 1) -> jnp.ndarray:
    """Simulate restart walks; returns trace [B, n_hops] of visited item ids.

    Matches reference `do_random_walks` (pinsage_model.py:32-53) in
    distribution: trace[i, j] is the item reached on hop j of walker i
    (hop order is permuted when `n_chains > 1`; downstream visit counting
    is order-blind).

    All randomness is generated in ONE vectorized threefry call up front
    ([n_hops, B, 3]); the scan then only does gathers + compares per hop,
    which keeps the inner loop at HBM-gather speed instead of paying a
    PRNG invocation per step.
    """
    return walks_from_tables(walk_tables(graph), graph, nodeset, n_hops,
                             alpha, key, n_chains=n_chains)
