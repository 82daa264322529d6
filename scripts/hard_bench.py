"""Graph-beats-features benchmark (round-2 VERDICT item 1).

The uniform-cluster synthetic data used in round 1 saturates at the
raw-feature ceiling, so it can never show the framework *learning from the
graph* — the core capability of PinSage (reference grid results on real
co-listen data, grid_search_results/*.json).  This script runs the
hierarchical `make_hard_dataset` benchmark, where features reveal only a
coarse genre-group and positives are mostly same-artist co-listens, so a
model must exploit playlist co-membership to rank well:

    synth (hard) -> PPR precompute -> PinSage train -> embed ->
    rank_eval(PinSage) vs rank_eval(raw features) [vs random floor]

Prints a JSON summary including the PinSage/features hit@100 ratio
(the acceptance bar is >= 1.5x).  For the full 13-model baseline ordering,
run the CLI `eval` verb on the generated dataset afterwards.

Usage: python scripts/hard_bench.py [--tracks 20000] [--epochs 10] ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=20_000)
    ap.add_argument("--collections", type=int, default=4_000)
    ap.add_argument("--positives", type=int, default=60_000)
    ap.add_argument("--feature-dim", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batches-per-epoch", type=int, default=500)
    ap.add_argument("--margin", type=float, default=0.1)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--hard-negatives", action="store_true")
    ap.add_argument("--hn-min", type=int, default=10)
    ap.add_argument("--hn-max", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--work-dir", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    from gcn_song_embeddings_tpu.config import (
        RunConfig,
        config_with_overrides,
    )
    from gcn_song_embeddings_tpu.data import SongGraph, make_hard_dataset
    from gcn_song_embeddings_tpu.data.device import DeviceGraph
    from gcn_song_embeddings_tpu.evals.device_eval import rank_eval
    from gcn_song_embeddings_tpu.train.trainer import PinSageTrainer
    from gcn_song_embeddings_tpu.utils.profiling import Timer

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())
    work = args.work_dir or tempfile.mkdtemp(prefix="hard_bench_")
    timer = Timer()

    with timer.phase("synth"):
        ds_path = os.path.join(work, "ds")
        complete = all(
            os.path.isfile(os.path.join(ds_path, f)) for f in
            ("graph.json", "tracks.json", "collections.json",
             "positives.json", "features.npy"))
        if complete:
            log(f"reusing existing dataset in {ds_path}")
        else:
            make_hard_dataset(
                ds_path, n_tracks=args.tracks,
                n_collections=args.collections,
                n_positives=args.positives,
                feature_dim=args.feature_dim, seed=args.seed)
    with timer.phase("load_graph"):
        g = SongGraph(ds_path,
                      features_file=os.path.join(ds_path, "features.npy"))
        dg = DeviceGraph.from_graph(g)
        train_pos, test_pos = g.load_positives_split(
            os.path.join(ds_path, "positives.json"))
    log(f"graph: {g.n_items} tracks, {g.n_cols} playlists, "
        f"{dg.n_edges} directed edges, {len(test_pos)} test pairs")

    with timer.phase("features_eval"):
        r_feat = rank_eval(g.features, test_pos, hit_ks=(10, 100, 500),
                           mrr_k=1000, batch=4096)
    log("raw features:", {k: round(v, 4) for k, v in r_feat.items()})

    hn = {"train.hard_negatives": True, "train.hn_min": args.hn_min,
          "train.hn_max": args.hn_max} if args.hard_negatives else {}
    run_name = (f"hard_m{args.margin:g}_lr{args.lr:g}"
                + (f"_hn{args.hn_min}-{args.hn_max}"
                   if args.hard_negatives else ""))
    cfg = config_with_overrides(RunConfig(run_name=run_name), {
        "train.epochs": args.epochs,
        "train.batches_per_epoch": args.batches_per_epoch,
        "train.lr": args.lr,
        "train.margin": args.margin,
        "walk.batch_walkers": 8192,
        **hn,
    })
    with timer.phase("precompute"):
        trainer = PinSageTrainer(
            dg, g.n_items, g.features, train_pos, cfg=cfg,
            base_run_dir=os.path.join(work, "runs"),
            nbhds_path=os.path.join(ds_path, "neighborhoods.npz"),
            log=True, load_save=True, verbose=False)
    with timer.phase("train"):
        trainer.train()
    with timer.phase("embed"):
        emb = np.asarray(trainer.embed(bsize=4096))
    with timer.phase("eval"):
        r_ps = rank_eval(emb, test_pos, hit_ks=(10, 100, 500),
                         mrr_k=1000, batch=4096)

    summary = {
        "n_tracks": g.n_items,
        "n_edges": int(dg.n_edges),
        "config": {"epochs": args.epochs, "margin": args.margin,
                   "lr": args.lr, "hard_negatives": args.hard_negatives,
                   **({"hn_min": args.hn_min, "hn_max": args.hn_max}
                      if args.hard_negatives else {})},
        "times_s": {k: round(v, 2) for k, v in timer.times.items()},
        "features": {k: round(v, 5) for k, v in r_feat.items()},
        "pinsage": {k: round(v, 5) for k, v in r_ps.items()},
        "pinsage_over_features_hit100":
            round(r_ps["hit@100"] / max(r_feat["hit@100"], 1e-12), 3),
        "pinsage_over_features_mrr":
            round(r_ps["mrr@1000"] / max(r_feat["mrr@1000"], 1e-12), 3),
        "work_dir": work,
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
