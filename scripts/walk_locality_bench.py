"""Walk-kernel locality experiment (round-2 VERDICT item 4).

Round 1 measured the PPR sweep's gather rate dropping 100M -> 59M hops/s
from the 100k-track graph (~10 MB edge tables) to the 1M-track graph
(~120 MB): the sweep walks origins in consecutive-id blocks, so when node
ids carry no community locality every gather batch sprays the whole edge
array; when ids are community-sorted, a block's walkers stay inside a
small slice of the tables (HBM row-buffer / cache locality).

Because `uniform_slot` picks by (degree, within-row order) only, any node
relabeling that preserves within-row edge order leaves the visited-item
chain BIT-IDENTICAL — only the memory layout moves.  This script measures
the fused walker on a 1M-track clustered bipartite graph under:

  random   — ids randomly permuted (status quo for real catalogs)
  cluster  — oracle community-sorted ids (upper bound)
  rcm      — reverse-Cuthill-McKee order recovered from the RANDOM-labeled
             graph (what production can actually compute)
  uniform-graph control — a structureless graph (no ordering can help;
             bounds the unavoidable large-table cost)

Timing: R walk repetitions inside ONE jit with a materialized scalar,
difference two Rs (RESULTS.md methodology).  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_clustered(n_items, n_cols, per_col, n_clusters, rng):
    """Cluster-contiguous bipartite memberships (ids ARE cluster-sorted)."""
    import numpy as np

    items_per_cluster = n_items // n_clusters
    col_cluster = rng.integers(0, n_clusters, size=n_cols)
    offs = rng.integers(0, items_per_cluster, size=(n_cols, per_col))
    tracks = (col_cluster[:, None] * items_per_cluster + offs).ravel()
    cols = np.repeat(np.arange(n_cols), per_col)
    # ensure every item has degree >= 1
    missing = np.setdiff1d(np.arange(n_items), np.unique(tracks))
    if missing.size:
        mcols = (missing // items_per_cluster)  # any col of the cluster
        # map cluster -> one of its cols
        first_col = np.full(n_clusters, -1, np.int64)
        for c in range(n_clusters):
            hit = np.where(col_cluster == c)[0]
            first_col[c] = hit[0] if hit.size else 0
        tracks = np.concatenate([tracks, missing])
        cols = np.concatenate([cols, first_col[mcols]])
    return tracks.astype(np.int64), cols.astype(np.int64)


def build_uniform(n_items, n_cols, per_col, rng):
    import numpy as np

    tracks = rng.integers(0, n_items, size=n_cols * per_col)
    cols = np.repeat(np.arange(n_cols), per_col)
    missing = np.setdiff1d(np.arange(n_items), np.unique(tracks))
    if missing.size:
        tracks = np.concatenate([tracks, missing])
        cols = np.concatenate([cols, rng.integers(0, n_cols, missing.size)])
    return tracks.astype(np.int64), cols.astype(np.int64)


def csr_from_pairs(tracks, cols, n_items, n_cols):
    import numpy as np

    order = np.lexsort((cols, tracks))
    t_s, c_s = tracks[order], cols[order]
    i2c_indptr = np.searchsorted(t_s, np.arange(n_items + 1)).astype(np.int32)
    i2c_indices = c_s.astype(np.int32)
    order2 = np.lexsort((tracks, cols))
    t_2, c_2 = tracks[order2], cols[order2]
    c2i_indptr = np.searchsorted(c_2, np.arange(n_cols + 1)).astype(np.int32)
    c2i_indices = t_2.astype(np.int32)
    return i2c_indptr, i2c_indices, c2i_indptr, c2i_indices


def relabel_pairs(tracks, cols, item_perm=None, col_perm=None):
    """Apply permutations (new_id = perm[old_id]) to membership pairs."""
    t = tracks if item_perm is None else item_perm[tracks]
    c = cols if col_perm is None else col_perm[cols]
    return t, c


def rcm_item_order(tracks, cols, n_items, n_cols):
    """Reverse-Cuthill-McKee over the bipartite adjacency -> item perm
    (new_id = perm[old_id]) and col perm."""
    import numpy as np
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n = n_items + n_cols
    rows = np.concatenate([tracks, cols + n_items])
    cls = np.concatenate([cols + n_items, tracks])
    adj = coo_matrix((np.ones(len(rows), np.int8), (rows, cls)),
                     shape=(n, n)).tocsr()
    order = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True))
    item_nodes = order[order < n_items]          # old item ids in RCM order
    col_nodes = order[order >= n_items] - n_items
    item_perm = np.empty(n_items, np.int64)
    item_perm[item_nodes] = np.arange(n_items)
    col_perm = np.empty(n_cols, np.int64)
    col_perm[col_nodes] = np.arange(n_cols)
    return item_perm, col_perm


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=1_000_000)
    ap.add_argument("--cols", type=int, default=200_000)
    ap.add_argument("--per-col", type=int, default=29)
    ap.add_argument("--clusters", type=int, default=2000)
    ap.add_argument("--origins", type=int, default=100_000)
    ap.add_argument("--hops", type=int, default=500)
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-uniform", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from gcn_song_embeddings_tpu.data.device import DeviceGraph
    from gcn_song_embeddings_tpu.ops.walks import (
        fused_walk_tables,
        walks_from_fused_tables,
    )

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)

    def bench_layout(tracks, cols, label):
        i2c_p, i2c_i, c2i_p, c2i_i = csr_from_pairs(
            tracks, cols, args.tracks, args.cols)
        dg = DeviceGraph.from_arrays(i2c_p, i2c_i, c2i_p, c2i_i)
        tables = jax.tree_util.tree_map(
            lambda x: jax.device_put(x), fused_walk_tables(dg))
        nodeset = jnp.arange(args.origins, dtype=jnp.int32)

        def make(reps):
            @jax.jit
            def f(key):
                def rep(carry, i):
                    trace = walks_from_fused_tables(
                        tables, nodeset, args.hops, args.alpha,
                        jax.random.fold_in(key, i))
                    return carry + trace.sum(dtype=jnp.int32), 0
                total, _ = lax.scan(rep, jnp.int32(0), jnp.arange(reps))
                return total
            return f

        # ONE jit per rep count, reused across timing pairs — re-tracing
        # per call costs ~25 s through the tunnel and swamps the signal
        f1, fR = make(1), make(args.reps)
        def timed(f, s):
            t0 = time.perf_counter()
            int(f(jax.random.PRNGKey(s)))
            return time.perf_counter() - t0

        timed(f1, 0), timed(fR, 0)               # compile + warm
        diffs = []
        for s in range(1, 4):                    # median of 3 pairs
            t1 = timed(f1, 2 * s)
            tr = timed(fR, 2 * s + 1)
            diffs.append(tr - t1)
        hops_total = (args.reps - 1) * args.origins * args.hops
        d = float(np.median(diffs))
        rate = hops_total / d
        log(f"{label}: {rate / 1e6:.1f}M hops/s  (diffs "
            f"{[round(x, 2) for x in diffs]})")
        return rate

    results = {}

    # --- clustered graph, three labelings -------------------------------
    t, c = build_clustered(args.tracks, args.cols, args.per_col,
                           args.clusters, rng)
    n_edges = 2 * len(t)
    log(f"clustered graph: {len(t)} memberships ({n_edges} directed edges)")
    # oracle: BOTH sides community-sorted (items are already contiguous by
    # construction; collections get relabeled by their cluster so the c2i
    # edge ranges are contiguous too — the walker alternates item-side and
    # col-side gathers, so one-sided sorting localizes only half of them)
    import numpy as _np

    col_first_item = _np.full(args.cols, args.tracks, _np.int64)
    _np.minimum.at(col_first_item, c, t)
    col_perm_oracle = _np.empty(args.cols, _np.int64)
    col_perm_oracle[_np.argsort(col_first_item, kind="stable")] = \
        _np.arange(args.cols)
    t_o, c_o = relabel_pairs(t, c, None, col_perm_oracle)
    results["cluster_sorted"] = bench_layout(t_o, c_o,
                                             "cluster-sorted (oracle)")

    item_perm = rng.permutation(args.tracks)
    col_perm = rng.permutation(args.cols)
    t_r, c_r = relabel_pairs(t, c, item_perm, col_perm)
    results["random_labels"] = bench_layout(t_r, c_r,
                                            "random labels (status quo)")

    t0 = time.perf_counter()
    rcm_i, rcm_c = rcm_item_order(t_r, c_r, args.tracks, args.cols)
    rcm_s = time.perf_counter() - t0
    log(f"RCM ordering computed in {rcm_s:.1f} s")
    t_m, c_m = relabel_pairs(t_r, c_r, rcm_i, rcm_c)
    results["rcm_recovered"] = bench_layout(t_m, c_m, "RCM (recovered)")
    results["rcm_seconds"] = round(rcm_s, 1)

    # --- structureless control ------------------------------------------
    if not args.skip_uniform:
        tu, cu = build_uniform(args.tracks, args.cols, args.per_col, rng)
        results["uniform_control"] = bench_layout(tu, cu,
                                                  "uniform graph (control)")

    results.update(tracks=args.tracks, cols=args.cols,
                   per_col=args.per_col, clusters=args.clusters,
                   origins=args.origins, hops=args.hops,
                   n_directed_edges=int(n_edges))
    for k in ("cluster_sorted", "random_labels", "rcm_recovered",
              "uniform_control"):
        if k in results:
            results[k] = round(results[k] / 1e6, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
