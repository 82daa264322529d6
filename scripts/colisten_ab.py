"""Controlled A/B: PinSage with co-listen edges + hn curriculum vs CF.

VERDICT r3 items 1 & 5.  On the hard benchmark the TrackTrackCF models
factorize the train-positive co-occurrence matrix directly (reference
baselines.py:458-487) while PinSage's walks see only playlist edges —
round 3 measured PinSage hr@100 0.389 vs ALS 0.476.  This script runs the
signal-asymmetry experiment as a controlled matrix on ONE shared hard
dataset + split:

  * PinSage tuned 30-epoch schedule: plain vs walk.colisten_copies in
    {1, 3} (x model.T in {3, 10}),
  * hard-negative curriculum A/B at 10 AND 30 epochs: easy vs static hn
    vs hn_start_epoch warmup (train.hn_start_epoch),
  * TrackTrackCF ALS + BPR reference rows on the identical split.

All arms are scored with the fused device rank evaluator (cosine, f32
ranking).  Results append to results/colisten_ab.jsonl ONE LINE PER ARM
as they finish, so a timeout keeps partial evidence; completed arms are
skipped on rerun (keyed by run name in the jsonl).

Usage: python scripts/colisten_ab.py [--work-dir /tmp/colisten_ab]
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

TUNED = {  # the hard-grid winner schedule (results/grid_search_hard.json)
    "train.epochs": 30, "train.batches_per_epoch": 500,
    "train.lr": 1e-3, "train.margin": 1e-5,
    "walk.batch_walkers": 8192,
}

ARMS = [
    # --- signal-asymmetry matrix (30-epoch tuned schedule) ---
    ("plain30", {}),
    ("co1", {"walk.colisten_copies": 1}),
    ("co3", {"walk.colisten_copies": 3}),
    ("co1_T10", {"walk.colisten_copies": 1, "model.T": 10}),
    ("co3_T10", {"walk.colisten_copies": 3, "model.T": 10}),
    # --- hn curriculum A/B, 30 epochs ---
    ("hn30", {"train.hard_negatives": True}),
    ("cur30", {"train.hard_negatives": True, "train.hn_start_epoch": 20}),
    ("co1_cur30", {"walk.colisten_copies": 1,
                   "train.hard_negatives": True,
                   "train.hn_start_epoch": 20}),
    # --- hn curriculum A/B, 10 epochs ---
    ("plain10", {"train.epochs": 10}),
    ("hn10", {"train.epochs": 10, "train.hard_negatives": True}),
    ("cur10", {"train.epochs": 10, "train.hard_negatives": True,
               "train.hn_start_epoch": 5}),
    # --- round-4 second wave: push the co1_T10 winner further ---
    ("co1_T10_60ep", {"walk.colisten_copies": 1, "model.T": 10,
                      "train.epochs": 60}),
    ("co1_T20", {"walk.colisten_copies": 1, "model.T": 20}),
    ("co1_T10_m01", {"walk.colisten_copies": 1, "model.T": 10,
                     "train.margin": 0.1}),
    ("co1_T10_cur", {"walk.colisten_copies": 1, "model.T": 10,
                     "train.hard_negatives": True,
                     "train.hn_start_epoch": 20}),
    # --- third wave: can a wider embedding capture the precision the
    # augmented-walk PPR control shows is in the graph? ---
    ("co1_T10_wide", {"walk.colisten_copies": 1, "model.T": 10,
                      "model.hidden_dim": 1024, "model.out_dim": 256}),
    ("co1_T10_d512", {"walk.colisten_copies": 1, "model.T": 10,
                      "model.hidden_dim": 1024, "model.out_dim": 512}),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/colisten_ab")
    ap.add_argument("--tracks", type=int, default=20_000)
    ap.add_argument("--collections", type=int, default=4_000)
    ap.add_argument("--positives", type=int, default=60_000)
    ap.add_argument("--out", default="results/colisten_ab.jsonl")
    ap.add_argument("--arms", default=None,
                    help="comma-separated arm names to run (default all)")
    ap.add_argument("--quick", action="store_true",
                    help="CPU smoke mode: tiny schedules, structure only")
    args = ap.parse_args()

    import jax
    import numpy as np

    from gcn_song_embeddings_tpu.config import (
        RunConfig,
        config_with_overrides,
    )
    from gcn_song_embeddings_tpu.data import SongGraph
    from gcn_song_embeddings_tpu.data.device import DeviceGraph
    from gcn_song_embeddings_tpu.evals.device_eval import rank_eval
    from gcn_song_embeddings_tpu.train.trainer import PinSageTrainer

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())

    from gcn_song_embeddings_tpu.data.synth import ensure_hard_dataset

    work = args.work_dir
    ds_path = ensure_hard_dataset(
        os.path.join(work, "ds"), n_tracks=args.tracks,
        n_collections=args.collections, n_positives=args.positives,
        seed=0, log=log)

    g = SongGraph(ds_path,
                  features_file=os.path.join(ds_path, "features.npy"))
    dg = DeviceGraph.from_graph(g)
    train_pos, test_pos = g.load_positives_split(
        os.path.join(ds_path, "positives.json"))
    log(f"graph: {g.n_items} tracks, {g.n_cols} playlists, "
        f"{dg.n_edges} edges, {len(train_pos)}/{len(test_pos)} "
        f"train/test pairs")

    out_path = os.path.join(REPO, args.out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    done = set()
    if os.path.isfile(out_path):
        for line in open(out_path):
            try:
                done.add(json.loads(line)["arm"])
            except (KeyError, json.JSONDecodeError):
                pass

    def emit(arm: str, metrics: dict, extra: dict) -> None:
        row = {"arm": arm, **{k: round(v, 5) for k, v in metrics.items()},
               **extra}
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        log("RESULT", json.dumps(row))

    sel = set(args.arms.split(",")) if args.arms else None

    # ---- CF reference rows (identical split) ----
    for arm, algo in (("cf_als", "als"), ("cf_bpr", "bpr")):
        if arm in done or (sel is not None and arm not in sel):
            log(f"skip {arm}")
            continue
        from gcn_song_embeddings_tpu.models.baselines.mf import TrackTrackCF

        t0 = time.time()
        model = TrackTrackCF(algo=algo)
        model.train(g, g.track_ids, train_pos, test_pos, g.features)
        m = rank_eval(model.model.item_factors, test_pos,
                      hit_ks=(10, 100, 500), mrr_k=1000, batch=4096)
        emit(arm, m, {"train_s": round(time.time() - t0, 1)})

    # ---- PageRank control arms: separates "the augmented GRAPH carries
    # the signal" from "the CONV adds value beyond it" — same PPR kernels
    # PersPageRank uses (reference baselines.py:107-151), evaluated from
    # top-1000 knn lists (harness-family instrument)
    for arm, copies in (("ppr_plain", 0), ("ppr_co1", 1)):
        if arm in done or (sel is not None and arm not in sel):
            log(f"skip {arm}")
            continue
        import jax.numpy as jnp

        from gcn_song_embeddings_tpu.data.device import (
            augment_with_colisten,
        )
        from gcn_song_embeddings_tpu.evals import metrics as M
        from gcn_song_embeddings_tpu.ops.ppr import (
            sample_neighborhood_topt_tables,
        )
        from gcn_song_embeddings_tpu.ops.walks import fused_walk_tables

        t0 = time.time()
        graph_arm = (dg if copies == 0
                     else augment_with_colisten(dg, train_pos, copies))
        tables = fused_walk_tables(graph_arm)
        k, bs = 1000, 2048
        knn = np.zeros((g.n_items, k), np.int32)
        key = jax.random.PRNGKey(0)
        for s_ in range(0, g.n_items, bs):
            e_ = min(s_ + bs, g.n_items)
            block = np.full((bs,), e_ - 1, np.int32)
            block[: e_ - s_] = np.arange(s_, e_, dtype=np.int32)
            _w, n_ = sample_neighborhood_topt_tables(
                tables, jnp.asarray(block), 1000, 0.85, k,
                jax.random.fold_in(key, s_))
            knn[s_:e_] = np.asarray(n_)[: e_ - s_]
        m = {f"hit@{K}": M.hit_rate(knn, test_pos, K)
             for K in (10, 100, 500)}
        m["mrr@1000"] = M.mrr(knn, test_pos, 1000)
        emit(arm, m, {"train_s": round(time.time() - t0, 1),
                      "evaluator": "knn_list"})

    for arm, overrides in ARMS:
        if arm in done or (sel is not None and arm not in sel):
            log(f"skip {arm}")
            continue
        log(f"=== arm {arm} {overrides}")
        merged = {**TUNED, **overrides}
        if args.quick:
            merged["train.epochs"] = max(merged["train.epochs"] // 10, 2)
            merged["train.batches_per_epoch"] = 30
            merged["walk.n_hops"] = 100
            merged["walk.batch_walkers"] = 1024
            if "train.hn_start_epoch" in merged:
                # keep the warmup boundary STRICTLY inside the shrunken
                # schedule so the gated-hard phase actually executes
                merged["train.hn_start_epoch"] = min(
                    max(merged["train.hn_start_epoch"] // 10, 1),
                    merged["train.epochs"] - 1)
        cfg = config_with_overrides(RunConfig(run_name=arm), merged)
        t0 = time.time()
        trainer = PinSageTrainer(
            dg, g.n_items, g.features, train_pos, cfg=cfg,
            base_run_dir=os.path.join(work, "runs"),
            nbhds_path=os.path.join(ds_path, "neighborhoods.npz"),
            log=False, load_save=True, verbose=True)
        t_pre = time.time() - t0
        t0 = time.time()
        trainer.train()
        t_train = time.time() - t0
        t0 = time.time()
        emb = np.asarray(trainer.embed(bsize=4096))
        m = rank_eval(emb, test_pos, hit_ks=(10, 100, 500), mrr_k=1000,
                      batch=4096)
        emit(arm, m, {"precompute_s": round(t_pre, 1),
                      "train_s": round(t_train, 1),
                      "embed_eval_s": round(time.time() - t0, 1),
                      "overrides": overrides})


if __name__ == "__main__":
    main()
