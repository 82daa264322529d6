"""WalkEmbedHybrid at dataset_large scale (round-4 capstone, extended
round 5).

Reuses the scale_1m_co work dir (1M tracks / 250k playlists, colisten
T=10 trained run): resume the trainer for the embedding, run query-time
PPR walks over the augmented graph for every unique test query, merge
per-query on DEVICE (walk head, embedding tail — ops/merge.merge_topk;
the round-4 host merge alone took ~9 min for 280k queries), and score
the 300k test pairs from the merged lists next to the walk-only and
embedding-only rows.  Round 5 adds the beyond-accuracy + cold-start
columns (VERDICT item 7): catalog coverage of the test-query recs,
inter-diversity, and low-degree mrr, so the 20k-roster finding ("the
hybrid's win costs no coverage/diversity") is verified at 1M shape.

Usage: python scripts/hybrid_1m_check.py [--work-dir /tmp/scale_1m_co]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/scale_1m_co")
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--out", default="results/hybrid_1m.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gcn_song_embeddings_tpu.config import (
        RunConfig,
        config_with_overrides,
    )
    from gcn_song_embeddings_tpu.data import SongGraph
    from gcn_song_embeddings_tpu.data.device import (
        DeviceGraph,
        augment_with_colisten,
    )
    from gcn_song_embeddings_tpu.evals import metrics as M
    from gcn_song_embeddings_tpu.ops.merge import merge_topk
    from gcn_song_embeddings_tpu.ops.knn import cosine_topk_streamed
    from gcn_song_embeddings_tpu.ops.ppr import (
        sample_neighborhood_topt_tables,
    )
    from gcn_song_embeddings_tpu.ops.walks import fused_walk_tables
    from gcn_song_embeddings_tpu.train.trainer import PinSageTrainer
    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )
    from gcn_song_embeddings_tpu.utils.pipeline import lagged

    enable_compile_cache()
    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())

    ds = os.path.join(args.work_dir, "ds")
    g = SongGraph(ds, features_file=os.path.join(ds, "features.npy"))
    dg = DeviceGraph.from_graph(g)
    train_pos, test_pos = g.load_positives_split(
        os.path.join(ds, "positives.json"))
    log(f"graph: {g.n_items} tracks, {len(test_pos)} test pairs")

    # the scale_demo run's config (margin 0.1, lr 1e-3, colisten 1, T 10)
    cfg = config_with_overrides(
        RunConfig(run_name="scale_demo_m0.1_lr0.001_co1_T10"), {
            "train.epochs": 3, "train.lr": 1e-3, "train.margin": 0.1,
            "walk.batch_walkers": 8192,
            "walk.colisten_copies": 1, "model.T": 10})
    t0 = time.time()
    tr = PinSageTrainer(dg, g.n_items, g.features, train_pos, cfg=cfg,
                        base_run_dir=os.path.join(args.work_dir, "runs"),
                        nbhds_path=os.path.join(ds, "neighborhoods.npz"),
                        log=False, load_save=True, verbose=True)
    assert tr.e >= cfg.train.epochs, "expected a finished scale_demo run"
    emb = np.asarray(tr.embed(bsize=4096))
    log(f"resume+embed: {time.time() - t0:.1f}s")

    queries = np.unique(test_pos[:, 0]).astype(np.int32)
    nq, k = len(queries), args.k
    log(f"{nq} unique test queries, k={k}")

    # --- embedding lists (streamed cosine topk over the 1M catalog)
    t0 = time.time()
    unit = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                            1e-12)
    emb_n = np.empty((nq, k), np.int32)
    emb_w = np.empty((nq, k), np.float32)
    unit_dev = jnp.asarray(unit)
    bs = 4096

    def e_dispatch(s):
        e = min(s + bs, nq)
        blk = np.full((bs,), queries[e - 1], np.int32)
        blk[: e - s] = queries[s:e]
        # queries are INDICES into the table; the kernel computes
        # top-(k+1) and drops slot 0 (the self, reference convention)
        w, n = cosine_topk_streamed(unit_dev, jnp.asarray(blk), k)
        return s, e, w, n

    for s, e, w, n in lagged(e_dispatch(x) for x in range(0, nq, bs)):
        emb_w[s:e] = np.asarray(w)[: e - s]
        emb_n[s:e] = np.asarray(n)[: e - s]
    log(f"embedding lists: {time.time() - t0:.1f}s")

    # --- walk lists over the SAME augmented graph the trainer used
    t0 = time.time()
    aug = augment_with_colisten(dg, train_pos, 1)
    tables = fused_walk_tables(aug)
    walk_n = np.empty((nq, k), np.int32)
    walk_w = np.empty((nq, k), np.float32)
    key = jax.random.PRNGKey(0)
    wbs = 4096

    def w_dispatch(s):
        e = min(s + wbs, nq)
        blk = np.full((wbs,), queries[e - 1], np.int32)
        blk[: e - s] = queries[s:e]
        w, n = sample_neighborhood_topt_tables(
            tables, jnp.asarray(blk), 1000, 0.85, k,
            jax.random.fold_in(key, s))
        return s, e, w, n

    for s, e, w, n in lagged(w_dispatch(x) for x in range(0, nq, wbs)):
        walk_w[s:e] = np.asarray(w)[: e - s]
        walk_n[s:e] = np.asarray(n)[: e - s]
    log(f"walk lists: {time.time() - t0:.1f}s")

    # --- device merge, chunked over query rows (ops/merge.merge_topk;
    # was a ~9 min host set-loop in round 4)
    t0 = time.time()
    hyb_n = np.empty((nq, k), np.int32)
    hyb_w = np.empty((nq, k), np.float32)
    mbs = 8192

    def m_dispatch(s):
        e = min(s + mbs, nq)
        pad = mbs - (e - s)
        hw = np.pad(walk_w[s:e], ((0, pad), (0, 0)))
        hn = np.pad(walk_n[s:e], ((0, pad), (0, 0)))
        tw = np.pad(emb_w[s:e], ((0, pad), (0, 0)), constant_values=1.0)
        tn = np.pad(emb_n[s:e], ((0, pad), (0, 0)))
        w, n = merge_topk(jnp.asarray(hw), jnp.asarray(hn),
                          jnp.asarray(tw), jnp.asarray(tn))
        return s, e, w, n

    for s, e, w, n in lagged(m_dispatch(x) for x in range(0, nq, mbs)):
        hyb_w[s:e] = np.asarray(w)[: e - s]
        hyb_n[s:e] = np.asarray(n)[: e - s]
    merge_s = time.time() - t0
    log(f"device merge: {merge_s:.1f}s")

    # score test pairs through compacted per-query lists
    qpos = {q: i for i, q in enumerate(queries)}
    pairs = np.stack([[qpos[a] for a, _ in test_pos],
                      test_pos[:, 1]], axis=1)
    in_deg = g.in_degrees()
    low_sel = in_deg[test_pos[:, 0]] <= 1          # tables.py degree_thr=1
    out = {}
    for name, lists in (("walk", walk_n), ("embedding", emb_n),
                        ("hybrid", hyb_n)):
        out[name] = {
            **{f"hit@{K}": round(M.hit_rate(lists, pairs, K), 5)
               for K in (10, 100, 500)},
            "mrr@1000": round(M.mrr(lists, pairs, 1000), 5),
            # beyond-accuracy over the test-query rows (VERDICT r4 item
            # 7): coverage normalized by the CATALOG (reference coverage
            # divides by its all-rows knn matrix height, eval.py:342-355;
            # here rows are the 280k test queries, so the honest
            # denominator is n_items — the fraction of the 1M catalog
            # ever recommended to a test query), columns 1:K+1 quirk kept
            "coverage@500": round(float(
                np.unique(lists[:, 1:501]).shape[0] / g.n_items), 5),
            "inter_div@100": round(M.inter_diversity(lists, K=100), 5),
            "low_deg_mrr@1000": round(
                M.mrr(lists, pairs[low_sel], 1000), 5) if low_sel.any()
            else None,
            "low_deg_hit@100": round(
                M.hit_rate(lists, pairs[low_sel], 100), 5)
            if low_sel.any() else None,
        }
        log(name, json.dumps(out[name]))

    path = os.path.join(REPO, args.out)
    with open(path, "w") as f:
        json.dump({"n_tracks": g.n_items, "n_test_pairs": int(len(test_pos)),
                   "n_low_degree_pairs": int(low_sel.sum()),
                   "merge_s": round(merge_s, 1),
                   "rows": out}, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
