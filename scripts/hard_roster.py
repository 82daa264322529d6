"""Full baseline roster on the HARD benchmark (VERDICT r2 item 4).

Round 2's only full-roster table ran on the saturated uniform synthetic
(Features at the 1.000 ceiling — inverted vs what the framework now
demonstrably does on hard data).  This script reruns the reference's
eval_baselines equivalent (/root/reference/eval.py:413-467, dashboard.py:
82-172) on `make_hard_dataset` (20k tracks, power-law playlists, features
reveal only the genre-group): synth -> PinSage train (plain + hard-neg) ->
CLI `eval` with the complete model roster -> accuracy + beyond-accuracy +
cold-start tables.

Expected ordering on this data: graph models (PinSage, PageRank, CF,
node2vec) > content (Features) > Random, with the cold-start slices
discriminating (low-degree queries lean on features).

The kNN caches (~100 MB/model) go to the scratch dataset dir; only the
CSV tables are copied into results/.

Usage: python scripts/hard_roster.py [--work-dir DIR] [--epochs 10]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/hard_roster")
    ap.add_argument("--tracks", type=int, default=20_000)
    ap.add_argument("--collections", type=int, default=4_000)
    ap.add_argument("--positives", type=int, default=60_000)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--colisten-copies", type=int, default=1)
    ap.add_argument("--out-prefix", default="results/hard_roster")
    args = ap.parse_args()

    from gcn_song_embeddings_tpu import cli

    if args.colisten_copies < 1:
        raise SystemExit("--colisten-copies must be >= 1: the *_co roster "
                         "rows are defined as co-listen-augmented runs")

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    work = args.work_dir
    ds = os.path.join(work, "ds")
    runs = os.path.join(work, "runs")
    os.makedirs(work, exist_ok=True)

    from gcn_song_embeddings_tpu.data.synth import ensure_hard_dataset

    ensure_hard_dataset(ds, n_tracks=args.tracks,
                        n_collections=args.collections,
                        n_positives=args.positives, seed=0, log=log)

    base_overrides = [
        "--set", f"train.epochs={args.epochs}",
        "--set", "train.lr=0.001",
        "--set", "train.margin=0.1",
        "--set", "walk.batch_walkers=8192",
    ]
    # pinsage_hard_tuned = the hard-grid winner's schedule
    # (results/grid_search_hard.json: 30 epochs, margin 1e-5, lr 1e-3,
    # easy negatives, 2 layers) — the roster's headline PinSage row
    # non-default copies get a run-name suffix so variants never reuse a
    # differently-configured run's checkpoint/emb (run dirs key resume)
    co_suffix = ("" if args.colisten_copies == 1
                 else f"_x{args.colisten_copies}")
    run_list = (
        ("pinsage_hard", []),
        ("pinsage_hard_hn", ["--set", "train.hard_negatives=true"]),
        ("pinsage_hard_tuned", ["--set", "train.epochs=30",
                                "--set", "train.margin=1e-05"]),
        # tuned schedule + co-listen edges + T=10: the round-4 headline
        # run — gives the walks the train-positive co-occurrence signal
        # the CF baselines factorize directly, with the wider aggregation
        # fan-out the controlled matrix measured best
        # (results/colisten_ab.jsonl: co1_T10 hit@100 0.6176 vs ALS
        # 0.4765 on the identical split, tie-fair evaluator)
        ("pinsage_hard_co" + co_suffix,
         ["--set", "train.epochs=30",
          "--set", "train.margin=1e-05",
          "--set", "model.T=10",
          "--set",
          f"walk.colisten_copies={args.colisten_copies}"]),
        # wider variant (hidden 1024 / out 512): best all-round PinSage in
        # the third-wave A/B (mrr 0.154 vs 0.144 at out 128)
        ("pinsage_hard_co512" + co_suffix,
         ["--set", "train.epochs=30",
          "--set", "train.margin=1e-05",
          "--set", "model.T=10",
          "--set", "model.hidden_dim=1024",
          "--set", "model.out_dim=512",
          "--set",
          f"walk.colisten_copies={args.colisten_copies}"]),
    )
    for run_name, extra in run_list:
        if os.path.isfile(os.path.join(runs, run_name, "emb.npy")):
            log(f"reusing trained run {run_name}")
            continue
        log(f"training {run_name} ...")
        cli.main(["train", "--dataset", ds, "--run-dir", runs,
                  "--run-name", run_name] + base_overrides + extra)

    eval_dir = os.path.join(work, "baselines")
    log("evaluating full roster ...")
    cli.main(["eval", "--dataset", ds, "--run-dir", runs,
              "--eval-dir", eval_dir,
              "--pinsage-runs"] + [r for r, _ in run_list]
             + ["--hybrid-runs", "pinsage_hard_co512" + co_suffix])

    os.makedirs(os.path.join(REPO, "results"), exist_ok=True)
    for src, dst in (("results_accuracy.csv",
                      f"{args.out_prefix}_accuracy.csv"),
                     ("results_beyond.csv",
                      f"{args.out_prefix}_beyond.csv")):
        shutil.copy(os.path.join(eval_dir, src), os.path.join(REPO, dst))
        log(f"copied {src} -> {dst}")


if __name__ == "__main__":
    main()
