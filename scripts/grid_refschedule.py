"""Grid search at the reference's full training schedule (reproducible).

Re-creates the 16-config margin x lr x negatives x depth sweep of
results/grid_search_refschedule.json on a 20k-track synthetic catalog at
the reference schedule (30 epochs x 500 batches x 128 — SURVEY §2.1), or
the 8-config quick sweep of results/grid_search1.json (--schedule quick).
The PPR neighborhood cache is shared across configs via the dataset dir.

Usage:
    python scripts/grid_refschedule.py [--schedule ref|quick]
        [--work-dir DIR] [--out results/grid_search_refschedule.json]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--schedule", choices=("ref", "quick", "colisten"),
                    default="ref")
    ap.add_argument("--dataset-kind", choices=("uniform", "hard"),
                    default="uniform",
                    help="'hard' = make_hard_dataset (power-law playlists, "
                         "group-only features — the benchmark where "
                         "hyperparameters can actually separate; VERDICT "
                         "r2 item 4)")
    ap.add_argument("--work-dir", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from gcn_song_embeddings_tpu.config import RunConfig, config_with_overrides
    from gcn_song_embeddings_tpu.data import (
        SongGraph,
        make_hard_dataset,
        make_synthetic_dataset,
    )
    from gcn_song_embeddings_tpu.train.grid_search import grid_search

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    work = args.work_dir or tempfile.mkdtemp(prefix="grid_ref_")
    ds_path = os.path.join(work, "ds")
    marker = os.path.join(ds_path, "dataset_kind.txt")
    complete = all(os.path.isfile(os.path.join(ds_path, f)) for f in
                   ("graph.json", "positives.json", "features.npy"))
    if complete:
        prev = (open(marker).read().strip()
                if os.path.isfile(marker) else "uniform")
        if prev != args.dataset_kind:
            raise SystemExit(
                f"work dir {ds_path} holds a {prev!r} dataset but "
                f"--dataset-kind is {args.dataset_kind!r}; use a "
                f"different --work-dir (refusing to mislabel results)")
    if not complete:
        if args.dataset_kind == "hard":
            make_hard_dataset(ds_path, n_tracks=20_000,
                              n_collections=4_000, n_positives=60_000,
                              seed=0)
        else:
            make_synthetic_dataset(ds_path, n_tracks=20_000,
                                   n_collections=4_000, n_clusters=100,
                                   tracks_per_collection=30,
                                   n_positives=60_000, feature_dim=512,
                                   seed=0)
        with open(marker, "w") as f:
            f.write(args.dataset_kind)
    graph = SongGraph(ds_path,
                      features_file=os.path.join(ds_path, "features.npy"))
    graph.nbhds_path = os.path.join(ds_path, "neighborhoods.npz")
    train_pos, test_pos = graph.load_positives_split(
        os.path.join(ds_path, "positives.json"))

    if args.schedule == "ref":
        epochs, bpe = 30, 500
        grid = {"train.margin": [0.1, 1e-5],
                "train.lr": [1e-4, 1e-3],
                "train.hard_negatives": [False, True],
                "model.n_layers": [2, 4]}
        default_out = ("results/grid_search_hard.json"
                       if args.dataset_kind == "hard"
                       else "results/grid_search_refschedule.json")
    elif args.schedule == "colisten":
        # round-4 axis: the co-listen augmentation x fan-out x margin x lr
        # at the reference schedule (pairs with results/colisten_ab.jsonl;
        # run with --dataset-kind hard)
        epochs, bpe = 30, 500
        grid = {"train.margin": [0.1, 1e-5],
                "train.lr": [1e-4, 1e-3],
                "walk.colisten_copies": [0, 1],
                "model.T": [3, 10]}
        default_out = ("results/grid_search_colisten_hard.json"
                       if args.dataset_kind == "hard"
                       else "results/grid_search_colisten.json")
    else:
        epochs, bpe = 4, 500
        grid = {"train.margin": [0.1, 1e-5],
                "train.lr": [1e-4, 1e-3],
                "model.T": [3, 5]}
        default_out = "results/grid_search1.json"

    base_cfg = config_with_overrides(
        RunConfig(), {"train.epochs": epochs,
                      "train.batches_per_epoch": bpe})
    out = args.out or default_out
    results = grid_search(graph, train_pos, test_pos, grid,
                          base_cfg=base_cfg,
                          base_run_dir=os.path.join(work, "runs_gs"),
                          out_path=out, verbose=True)
    best = results[0]
    print(f"best: {best['params']} mrr={best['mrr']:.5f} "
          f"hr@100={best['hit_rate']:.5f}", file=sys.stderr)


if __name__ == "__main__":
    main()
