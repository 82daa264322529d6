"""PPR visit-count estimation + top-T neighborhood selection, on device.

Reference math (pinsage_model.py:88-107): scatter walk traces into a
[B, n_all_nodes] float64 visit-count matrix, normalize rows to probabilities,
zero the self column, take top-T.  Materializing B x N is hostile to HBM and
to XLA (the matrix is 99.9% zeros).  The TPU-native equivalent used here is
sort-based run-length counting with fully static shapes:

    sort each trace row  ->  run starts  ->  run ids (cumsum)  ->
    per-run counts (segment_sum)  ->  per-run node values  ->  top-T of runs

A trace row of H hops has at most H distinct nodes, so every intermediate is
[B, H] — independent of graph size.  Numerics match the reference exactly:
weight(node) = visits / H (row sums of visit counts are always H because every
hop records a visit), and the self column is zeroed before top-T
(pinsage_model.py:98-99), which is why top-T weights do NOT sum to 1 — the
conv layer re-normalizes (SURVEY §7b.2).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gcn_song_embeddings_tpu.config import WalkConfig
from gcn_song_embeddings_tpu.data.device import DeviceGraph
from gcn_song_embeddings_tpu.utils.pipeline import lagged
from gcn_song_embeddings_tpu.ops.walks import (
    fused_walk_tables,
    random_walks,
    random_walks_fused,
    walk_tables,
    walks_from_fused_tables,
    walks_from_tables,
)


@partial(jax.jit, static_argnames=("T",))
def visit_counts_topt(trace: jnp.ndarray, nodeset: jnp.ndarray, T: int
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-T visited nodes per trace row.

    Args:
      trace: [B, H] int32 — items visited per hop (from `random_walks`).
      nodeset: [B] int32 — walk origins (their visits are zeroed out).
      T: neighborhood size.

    Returns:
      (weights [B, T] float32, nodes [B, T] int32) — visit probabilities
      (visits / H) sorted descending, self excluded.  If a row has fewer than
      T distinct visited nodes, the tail has weight 0 (node id undefined but
      harmless: zero weight contributes nothing to the weighted aggregate,
      mirroring the reference where zero-visit nodes fill the tail).
    """
    B, H = trace.shape
    nodeset = nodeset.astype(jnp.int32)

    # Materialize the trace before sorting: when fused with the walk scan's
    # [H, B] output, XLA otherwise folds the transpose into the sort as a
    # strided access pattern (measured +15 ms per [8192, 500] block).
    trace = jax.lax.optimization_barrier(trace)
    s = jnp.sort(trace, axis=1)                                   # [B, H]
    is_start = jnp.concatenate(
        [jnp.ones((B, 1), dtype=bool), s[:, 1:] != s[:, :-1]], axis=1)

    # Run lengths WITHOUT scatter ops (TPU scatter is ~100x slower than the
    # sort itself — measured 81 ms vs 0.9 ms per [8192, 500] block): the
    # count of the run starting at j is (next run start after j) - j, where
    # "next start" comes from a reverse cummin over start positions.  Count
    # mass sits at each run's start position; other positions get weight 0
    # (their node ids are duplicates — harmless in the zero-weight tail,
    # same contract as the reference's zero-visit fill).
    idx = jax.lax.broadcasted_iota(jnp.int32, (B, H), 1)
    aux = jnp.where(is_start, idx, H)
    next_start = jax.lax.cummin(aux[:, ::-1], axis=1)[:, ::-1]    # >= j
    next_after = jnp.concatenate(
        [next_start[:, 1:], jnp.full((B, 1), H, jnp.int32)], axis=1)  # > j
    counts = jnp.where(is_start, next_after - idx, 0)
    values = s

    weights = counts.astype(jnp.float32) / jnp.float32(H)
    weights = jnp.where(values == nodeset[:, None], 0.0, weights)  # zero self
    if T > H:
        pad = T - H
        weights = jnp.pad(weights, ((0, 0), (0, pad)))
        values = jnp.pad(values, ((0, 0), (0, pad)))
    # Descending top-T via one multi-operand sort: lax.top_k +
    # take_along_axis costs 43 ms per [8192, 500] block on v5e, the stable
    # pair sort ~1 ms.  Stability keeps top_k's tie order (lowest node id
    # first, since runs lie in ascending value order).
    neg_w, top_nodes = jax.lax.sort((-weights, values), dimension=1,
                                    is_stable=True, num_keys=1)
    return -neg_w[:, :T], top_nodes[:, :T]


@partial(jax.jit, static_argnames=("n_hops", "T", "n_chains", "fused"))
def sample_neighborhood_topt(graph: DeviceGraph, nodeset: jnp.ndarray,
                             n_hops: int, alpha: float, T: int,
                             key: jax.Array, n_chains: int = 1,
                             fused: bool = True
                             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Walks + top-T in one jit — reference `sample_neighborhood_topt`
    (pinsage_model.py:103-107).  `fused` selects the extent-joined walker
    (bit-identical chain, 2.2x faster — ops/walks.py)."""
    if fused:
        trace = random_walks_fused(graph, nodeset, n_hops, alpha, key,
                                   n_chains=n_chains)
    else:
        trace = random_walks(graph, nodeset, n_hops, alpha, key,
                             n_chains=n_chains)
    return visit_counts_topt(trace, nodeset, T)


@partial(jax.jit, static_argnames=("n_hops", "T", "n_chains"))
def sample_neighborhood_topt_tables(tables, nodeset: jnp.ndarray,
                                    n_hops: int, alpha: float, T: int,
                                    key: jax.Array, n_chains: int = 1
                                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """sample_neighborhood_topt over PREBUILT fused_walk_tables.

    Callers that dispatch many walk batches (PersPageRank's query sweep,
    the multichip sweep) hoist the O(nnz) extent join out of the per-batch
    jit — inside `sample_neighborhood_topt(fused=True)` it would re-run on
    device every dispatch."""
    trace = walks_from_fused_tables(tables, nodeset, n_hops, alpha, key,
                                    n_chains=n_chains)
    return visit_counts_topt(trace, nodeset, T)


def _sweep_scan(graph: DeviceGraph, nodeset_of, n_hops: int,
                alpha: float, T: int, key: jax.Array, n_blocks: int,
                n_chains: int, fused: bool):
    """Shared body of the two sweep entry points: edge tables built once
    per dispatch, then `n_blocks` walk+top-T batches under one lax.scan
    (amortizes per-dispatch latency).  `nodeset_of(i)` supplies block i's
    [batch] origin ids — an arithmetic range for the contiguous all-node
    sweep, a dynamic slice of an explicit array for the incremental
    refresh."""
    tables = (fused_walk_tables(graph) if fused else walk_tables(graph))

    def block(_, i):
        nodeset = nodeset_of(i)
        bkey = jax.random.fold_in(key, i)
        if fused:
            trace = walks_from_fused_tables(tables, nodeset, n_hops,
                                            alpha, bkey, n_chains=n_chains)
        else:
            trace = walks_from_tables(tables, graph, nodeset, n_hops,
                                      alpha, bkey, n_chains=n_chains)
        return None, visit_counts_topt(trace, nodeset, T)

    _, (w, n) = jax.lax.scan(block, None,
                             jnp.arange(n_blocks, dtype=jnp.int32))
    return w.reshape(-1, T), n.reshape(-1, T)


@partial(jax.jit, static_argnames=("n_hops", "T", "batch", "n_blocks",
                                   "n_chains", "fused"))
def _neighborhood_sweep_blocks(graph: DeviceGraph, start: jnp.ndarray,
                               n_items: int, n_hops: int, alpha: float,
                               T: int, key: jax.Array, batch: int,
                               n_blocks: int, n_chains: int = 1,
                               fused: bool = True):
    """All-node sweep over consecutive id ranges (block i covers
    [start + i*batch, ...) mod n_items) — see _sweep_scan."""
    offsets = jnp.arange(batch, dtype=jnp.int32)
    return _sweep_scan(
        graph, lambda i: (start + i * batch + offsets) % n_items,
        n_hops, alpha, T, key, n_blocks, n_chains, fused)


def precompute_neighborhoods(graph: DeviceGraph, cfg: WalkConfig,
                             path: str | None, seed: int = 0,
                             verbose: bool = False
                             ) -> tuple[np.ndarray, np.ndarray]:
    """All-node top-`cfg.t_precompute` PPR neighborhood sweep with caching.

    Reference `precompute_neighborhoods_topt` (pinsage_model.py:109-132):
    batched sweep, artifact save/load with shape validation.  The artifact is
    a .npz holding float32 `weights` [N, T] and int32 `nodes` [N, T]
    (instead of the reference's weights-first torch tuple).
    """
    n_items = graph.n_items
    T = cfg.t_precompute

    cached = _load_cache(path, n_items, T, cfg, seed, graph.n_edges)
    if cached is not None:
        return cached

    bs = cfg.batch_walkers
    chains = effective_chains(cfg.n_hops, cfg.parallel_chains)
    n_blocks = max(min(cfg.sweep_blocks, -(-n_items // bs)), 1)
    stride = bs * n_blocks
    all_w = np.zeros((n_items, T), dtype=np.float32)
    all_n = np.zeros((n_items, T), dtype=np.int32)
    base_key = jax.random.PRNGKey(seed)

    # One-deep software pipeline (utils/pipeline.py): the [stride, T]
    # device->host copy of chunk i-1 rides under chunk i's compute instead
    # of serializing after it (3.2 s -> 3.0 s on the tunneled chip, where a
    # fixed ~2 s round-trip floor dominates; the on-chip compute for the
    # same 100k x 500-hop sweep is 1.05 s — RESULTS.md decomposition).
    def dispatch(start):
        stop = min(start + stride, n_items)
        key = jax.random.fold_in(base_key, start)
        w, n = _neighborhood_sweep_blocks(
            graph, jnp.int32(start), n_items, cfg.n_hops, cfg.alpha, T,
            key, bs, n_blocks, n_chains=chains, fused=cfg.fused_tables)
        return start, stop, w, n

    for start, stop, w, n in lagged(
            dispatch(s) for s in range(0, n_items, stride)):
        valid = stop - start
        all_w[start:stop] = np.asarray(w)[:valid]
        all_n[start:stop] = np.asarray(n)[:valid]
        if verbose:
            print(f"neighborhoods: {stop}/{n_items} done")

    _save_cache(path, all_w, all_n, cfg, seed, graph.n_edges)
    return all_w, all_n


@partial(jax.jit, static_argnames=("n_hops", "T", "batch", "n_blocks",
                                   "n_chains", "fused"))
def _neighborhood_sweep_nodeset(graph: DeviceGraph, origins: jnp.ndarray,
                                n_hops: int, alpha: float, T: int,
                                key: jax.Array, batch: int, n_blocks: int,
                                n_chains: int = 1, fused: bool = True):
    """Sweep over an EXPLICIT [batch * n_blocks] origin array instead of
    a contiguous id range (the incremental refresh walks only affected
    origins) — see _sweep_scan."""
    return _sweep_scan(
        graph,
        lambda i: jax.lax.dynamic_slice_in_dim(origins, i * batch, batch),
        n_hops, alpha, T, key, n_blocks, n_chains, fused)


def affected_origins(old_w: np.ndarray, old_n: np.ndarray,
                     added_pairs: np.ndarray, n_items: int) -> np.ndarray:
    """Origins whose cached top-T PPR neighborhood can change when the
    item pairs in `added_pairs` gain edges (colisten pseudo-collections,
    data/device.augment_with_colisten).

    Walks are origin-local: origin o's visit distribution shifts only if
    its walks reach a node whose adjacency changed.  With restart prob
    alpha after every hop, visit mass outside the cached top-T is
    negligible — that is the premise of the top-T cache itself
    (reference pinsage_model.py:109-132 stores exactly this truncation) —
    so the affected set is { o : ({o} ∪ top-T(o)) ∩ endpoints != {} }.
    Computed with one boolean-LUT gather over the [N, T] node table
    (no sort/isin at 10^8 elements)."""
    touched = np.unique(np.asarray(added_pairs, np.int64)[:, :2].ravel())
    touched = touched[(touched >= 0) & (touched < n_items)]
    lut = np.zeros(n_items, dtype=bool)
    lut[touched] = True
    mask = lut[old_n] & (old_w > 0)
    aff = np.flatnonzero(mask.any(axis=1))
    return np.union1d(aff, touched).astype(np.int32)


def refresh_neighborhoods(graph: DeviceGraph, cfg: WalkConfig,
                          old_w: np.ndarray, old_n: np.ndarray,
                          added_pairs: np.ndarray,
                          path: str | None = None, seed: int = 0,
                          verbose: bool = False
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Incremental PPR cache refresh after a graph augmentation
    (round-5 VERDICT item 4; TPU-era extension of the reference's
    precompute cache, pinsage_model.py:109-132).

    `graph` is the ALREADY-AUGMENTED graph (the added pairs' edges are
    in it); `old_w`/`old_n` is the artifact swept on the pre-augmentation
    graph.  Only origins in `affected_origins` are re-walked; everything
    else keeps its cached rows (their reachable-set distributions are
    unchanged up to the top-T truncation the cache already makes).  The
    refreshed artifact is saved under the AUGMENTED graph's cache meta,
    so a later `precompute_neighborhoods` call on the same augmented
    graph serves it directly.

    Wins when the update is incremental (new co-listen events trickling
    into an already-augmented graph: affected fraction ~ O(pairs * T /
    N)); a from-scratch colisten augmentation touches nearly every
    origin and degrades gracefully to ~a full sweep.
    """
    n_items = graph.n_items
    T = cfg.t_precompute
    if old_w.shape != (n_items, T):
        raise ValueError(f"old artifact shape {old_w.shape} != "
                         f"({n_items}, {T})")
    aff = affected_origins(old_w, old_n, added_pairs, n_items)
    new_w = np.array(old_w, dtype=np.float32, copy=True)
    new_n = np.array(old_n, dtype=np.int32, copy=True)
    if verbose:
        print(f"refresh: {len(aff)}/{n_items} origins affected "
              f"({100 * len(aff) / max(n_items, 1):.1f}%)")

    if len(aff):
        bs = cfg.batch_walkers
        chains = effective_chains(cfg.n_hops, cfg.parallel_chains)
        n_blocks = max(min(cfg.sweep_blocks, -(-len(aff) // bs)), 1)
        stride = bs * n_blocks
        base_key = jax.random.fold_in(jax.random.PRNGKey(seed),
                                      0x5EF5E5)  # disjoint from the sweep

        def dispatch(start):
            stop = min(start + stride, len(aff))
            block = np.full((stride,), aff[stop - 1], dtype=np.int32)
            block[: stop - start] = aff[start:stop]
            key = jax.random.fold_in(base_key, start)
            w, n = _neighborhood_sweep_nodeset(
                graph, jnp.asarray(block), cfg.n_hops, cfg.alpha, T, key,
                bs, n_blocks, n_chains=chains, fused=cfg.fused_tables)
            return start, stop, w, n

        for start, stop, w, n in lagged(
                dispatch(s) for s in range(0, len(aff), stride)):
            valid = stop - start
            new_w[aff[start:stop]] = np.asarray(w)[:valid]
            new_n[aff[start:stop]] = np.asarray(n)[:valid]
            if verbose:
                print(f"refresh: {stop}/{len(aff)} re-swept")

    _save_cache(path, new_w, new_n, cfg, seed, graph.n_edges)
    return new_w, new_n


def effective_chains(n_hops: int, parallel_chains: int) -> int:
    """Largest divisor of `n_hops` that is <= `parallel_chains` (the walk
    splitter needs equal-length chains; a non-dividing request degrades
    gracefully instead of erroring on unusual hop counts)."""
    w = max(1, min(parallel_chains, n_hops))
    while n_hops % w:
        w -= 1
    return w


def _cache_meta(cfg: WalkConfig, seed: int, n_edges: int
                ) -> tuple[np.ndarray, np.float64]:
    # seed is deliberately NOT part of the cache key: the artifact is a
    # statistical estimate whose distribution does not depend on the seed
    # (reloading across seeds matches the reference's load-if-present
    # pragmatics); n_hops/alpha — and the chain split, which perturbs the
    # distribution slightly (ops/walks.py) — DO change it.  n_edges pins
    # the swept GRAPH (e.g. a colisten-augmented graph must not reuse the
    # plain graph's cache; legacy 2-element metas fail the compare and
    # recompute).
    del seed
    chains = effective_chains(cfg.n_hops, cfg.parallel_chains)
    return (np.array([cfg.n_hops, chains, n_edges], dtype=np.int64),
            np.float64(cfg.alpha))


def _save_cache(path, all_w, all_n, cfg, seed, n_edges) -> None:
    if path is None:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    meta, alpha = _cache_meta(cfg, seed, n_edges)
    np.savez_compressed(path, weights=all_w, nodes=all_n, meta=meta,
                        alpha=alpha)


def _load_cache(path, n_items, T, cfg, seed, n_edges):
    """Shape + walk-hyperparameter validated reload (the reference only
    shape-checks, pinsage_model.py:113-116 — that silently serves stale
    neighborhoods when alpha/n_hops change, e.g. in a walk-param grid)."""
    if path is None or not os.path.isfile(path):
        return None
    with np.load(path) as z:
        weights, nodes = z["weights"], z["nodes"]
        meta = z["meta"] if "meta" in z.files else None
        alpha = float(z["alpha"]) if "alpha" in z.files else None
    if weights.shape != (n_items, T):
        return None
    want_meta, want_alpha = _cache_meta(cfg, seed, n_edges)
    if meta is None or alpha is None:
        return None  # legacy cache without provenance: recompute
    if not (np.array_equal(meta, want_meta)
            and np.isclose(alpha, float(want_alpha))):
        return None
    return weights, nodes


def precompute_neighborhoods_multichip(graph: DeviceGraph, cfg: WalkConfig,
                                       path: str | None = None,
                                       seed: int = 0, devices=None,
                                       verbose: bool = False
                                       ) -> tuple[np.ndarray, np.ndarray]:
    """Multi-device all-node PPR sweep.

    The sweep is embarrassingly parallel over origin nodes: the CSR graph
    is replicated in every chip's HBM and the walker batch is sharded
    across a 1-D device mesh, so each jit dispatch runs
    `batch_walkers * n_devices` walkers (SPMD via sharding propagation —
    no code changes to the walk kernel).
    """
    import jax.sharding as shd

    devices = list(devices if devices is not None else jax.devices())
    n_dev = len(devices)
    if n_dev == 1:
        return precompute_neighborhoods(graph, cfg, path, seed=seed,
                                        verbose=verbose)
    mesh = shd.Mesh(np.array(devices), axis_names=("dev",))
    shard = shd.NamedSharding(mesh, shd.PartitionSpec("dev"))
    replicate = shd.NamedSharding(mesh, shd.PartitionSpec())

    n_items = graph.n_items
    T = cfg.t_precompute
    cached = _load_cache(path, n_items, T, cfg, seed, graph.n_edges)
    if cached is not None:
        return cached

    graph_repl = jax.device_put(graph, replicate)
    sweep = cfg.batch_walkers * n_dev
    all_w = np.zeros((n_items, T), dtype=np.float32)
    all_n = np.zeros((n_items, T), dtype=np.int32)
    base_key = jax.random.PRNGKey(seed)

    chains = effective_chains(cfg.n_hops, cfg.parallel_chains)
    tables = fused_walk_tables(graph_repl) if cfg.fused_tables else None

    # One-deep software pipeline (utils/pipeline.py), same as the
    # single-chip sweep: drain sweep i-1 while sweep i computes.
    def dispatch(start):
        stop = min(start + sweep, n_items)
        nodeset = np.arange(start, start + sweep, dtype=np.int32) % n_items
        nodeset = jax.device_put(jnp.asarray(nodeset), shard)
        key = jax.random.fold_in(base_key, start)
        if tables is not None:
            w, n = sample_neighborhood_topt_tables(
                tables, nodeset, cfg.n_hops, cfg.alpha, T, key,
                n_chains=chains)
        else:
            w, n = sample_neighborhood_topt(
                graph_repl, nodeset, cfg.n_hops, cfg.alpha, T, key,
                n_chains=chains, fused=False)
        return start, stop, w, n

    for start, stop, w, n in lagged(
            dispatch(s) for s in range(0, n_items, sweep)):
        valid = stop - start
        all_w[start:stop] = np.asarray(w)[:valid]
        all_n[start:stop] = np.asarray(n)[:valid]
        if verbose:
            print(f"neighborhoods[{n_dev}dev]: {stop}/{n_items} done")

    _save_cache(path, all_w, all_n, cfg, seed, graph.n_edges)
    return all_w, all_n
