"""dataset_large-scale end-to-end run (BASELINE.json configs[2]).

Synthesizes a large bipartite graph (default 100k tracks — the reference's
dataset_large graph.json is an unfetched 531MB LFS pointer, SURVEY §4),
then runs the full pipeline on one chip:

    CSR build -> all-node PPR precompute (500 hops, T=100) ->
    PinSage training (reference hyperparameters) ->
    full-catalog embedding -> streamed kNN -> hit-rate/MRR eval

Prints a JSON summary with per-phase wall times and throughputs.

Usage: python scripts/scale_demo.py [--tracks 100000] [--epochs 3]
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
    ap.add_argument("--tracks", type=int, default=100_000)
    ap.add_argument("--collections", type=int, default=20_000)
    ap.add_argument("--clusters", type=int, default=200)
    ap.add_argument("--positives", type=int, default=200_000)
    ap.add_argument("--feature-dim", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batches-per-epoch", type=int, default=500)
    ap.add_argument("--margin", type=float, default=0.1)
    ap.add_argument("--colisten-copies", type=int, default=0,
                    help="materialize train positives as pseudo-"
                         "collections (walk.colisten_copies)")
    ap.add_argument("--T", type=int, default=3, help="model.T fan-out")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--hard", action="store_true",
                    help="use make_hard_dataset (hierarchy/power-law "
                         "recipe; features reveal only the genre-group) "
                         "instead of the uniform generator, and report "
                         "the raw-features baseline alongside PinSage "
                         "(VERDICT r2 item 6)")
    ap.add_argument("--work-dir", default=None)
    args = ap.parse_args()

    import jax

    from gcn_song_embeddings_tpu.config import (
        RunConfig,
        config_with_overrides,
    )
    from gcn_song_embeddings_tpu.data import (
        SongGraph,
        make_hard_dataset,
        make_synthetic_dataset,
    )
    from gcn_song_embeddings_tpu.data.synth import make_synthetic_dataset_large
    from gcn_song_embeddings_tpu.data.device import DeviceGraph
    from gcn_song_embeddings_tpu.evals.device_eval import rank_eval
    from gcn_song_embeddings_tpu.train.trainer import PinSageTrainer
    from gcn_song_embeddings_tpu.utils.profiling import Timer

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())
    work = args.work_dir or tempfile.mkdtemp(prefix="scale_demo_")
    timer = Timer()

    with timer.phase("synth"):
        ds_path = os.path.join(work, "ds")
        complete = all(
            os.path.isfile(os.path.join(ds_path, f)) for f in
            ("graph.json", "tracks.json", "collections.json",
             "positives.json", "features.npy"))
        if complete:
            # reuse only a COMPLETE dataset (a crashed generation leaves
            # partial files); scale args are ignored on reuse.  Refuse a
            # kind mismatch (uniform vs hard) instead of mislabeling.
            marker = os.path.join(ds_path, "dataset_kind.txt")
            prev = (open(marker).read().strip()
                    if os.path.isfile(marker) else "uniform")
            want = "hard" if args.hard else "uniform"
            if prev != want:
                raise SystemExit(
                    f"work dir {ds_path} holds a {prev!r} dataset but "
                    f"this run wants {want!r}; use another --work-dir")
            log(f"reusing existing dataset in {ds_path}")
            ds = ds_path
        elif args.hard:
            # hierarchy recipe at dataset_large shape: artists of 20
            # tracks, 25 artists/genre, twin-genre groups; playlist count
            # scales with the catalog (mean Pareto size ~16 -> mean track
            # degree ~4 at 1M/250k)
            ds = make_hard_dataset(
                ds_path, n_tracks=args.tracks,
                n_collections=args.collections,
                collection_size_range=(8, 400),
                collection_size_alpha=2.0,
                n_positives=args.positives,
                feature_dim=args.feature_dim, seed=0)
        elif args.tracks >= 200_000:
            ds = make_synthetic_dataset_large(
                ds_path, n_tracks=args.tracks,
                n_collections=args.collections, n_clusters=args.clusters,
                tracks_per_collection=30, n_positives=args.positives,
                feature_dim=args.feature_dim, seed=0)
        else:
            ds = make_synthetic_dataset(
                ds_path, n_tracks=args.tracks,
                n_collections=args.collections, n_clusters=args.clusters,
                tracks_per_collection=30, n_positives=args.positives,
                feature_dim=args.feature_dim, seed=0)
    with open(os.path.join(ds_path, "dataset_kind.txt"), "w") as f:
        f.write("hard" if args.hard else "uniform")
    with timer.phase("load_graph"):
        g = SongGraph(ds, features_file=os.path.join(ds, "features.npy"))
        dg = DeviceGraph.from_graph(g)
        train_pos, test_pos = g.load_positives_split(
            os.path.join(ds, "positives.json"))
    log(f"graph: {g.n_items} tracks, {g.n_cols} playlists, "
        f"{dg.n_edges} directed edges")

    # Margin defaults to 0.1 (vs the reference's 1e-5); both are a --margin
    # flag away — see RESULTS.md "Quality" for measured hit@100 at each
    # setting under the f32-accurate rank evaluator.
    run_name = f"scale_demo_m{args.margin:g}_lr{args.lr:g}"
    if args.colisten_copies:
        run_name += f"_co{args.colisten_copies}"
    if args.T != 3:
        # run_name keys the resume checkpoint dir; param shapes are
        # T-independent, so an unsuffixed name would silently resume a
        # different-T model
        run_name += f"_T{args.T}"
    cfg = config_with_overrides(RunConfig(run_name=run_name), {
        "train.epochs": args.epochs,
        "train.batches_per_epoch": args.batches_per_epoch,
        "train.lr": args.lr,
        "train.margin": args.margin,
        "walk.batch_walkers": 8192,
        "walk.colisten_copies": args.colisten_copies,
        "model.T": args.T,
    })
    with timer.phase("precompute"):
        trainer = PinSageTrainer(
            dg, g.n_items, g.features, train_pos, cfg=cfg,
            base_run_dir=os.path.join(work, "runs"),
            nbhds_path=os.path.join(ds, "neighborhoods.npz"),
            log=True, load_save=True, verbose=False)
    with timer.phase("train"):
        trainer.train()
    with timer.phase("embed"):
        emb = trainer.embed(bsize=4096)
    with timer.phase("eval"):
        # fused on-device rank evaluation: no [N, 1000] kNN cache needed
        results = rank_eval(emb, test_pos, hit_ks=(100, 500), mrr_k=1000,
                            batch=4096)
    r_feat = None
    if args.hard:
        with timer.phase("features_eval"):
            r_feat = rank_eval(g.features, test_pos, hit_ks=(100, 500),
                               mrr_k=1000, batch=4096)
        log("raw features:", {k: round(v, 5) for k, v in r_feat.items()})

    hops = g.n_items * cfg.walk.n_hops
    summary = {
        "n_tracks": g.n_items,
        "n_edges": int(dg.n_edges),
        "times_s": {k: round(v, 2) for k, v in timer.times.items()},
        "precompute_hops_per_s": round(hops / timer.times["precompute"], 0),
        "train_batches_per_s": round(
            args.epochs * args.batches_per_epoch
            / max(timer.times["train"], 1e-9), 1)
        if timer.times["train"] > 1 else None,
        "embed_tracks_per_s": round(g.n_items / timer.times["embed"], 0),
        "eval_pairs_per_s": round(len(test_pos) / timer.times["eval"], 0),
        "metrics": {k: round(v, 5) for k, v in results.items()},
        **({"features_metrics":
            {k: round(v, 5) for k, v in r_feat.items()},
            "pinsage_over_features_hit100":
            round(results["hit@100"] / max(r_feat["hit@100"], 1e-12), 3)}
           if r_feat is not None else {}),
        "work_dir": work,
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
