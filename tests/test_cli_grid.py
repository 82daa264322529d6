"""CLI + grid-search end-to-end tests (small configs)."""

import json
import os

import numpy as np
import pytest

from gcn_song_embeddings_tpu.cli import main as cli_main
from gcn_song_embeddings_tpu.data import SongGraph, make_synthetic_dataset


@pytest.fixture(scope="module")
def cli_dataset(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "ds")
    make_synthetic_dataset(out, n_tracks=300, n_collections=80,
                           n_clusters=6, n_positives=900, feature_dim=16,
                           seed=1)
    return out


def test_cli_stats(cli_dataset, capsys):
    cli_main(["stats", "--dataset", cli_dataset])
    out = json.loads(capsys.readouterr().out)
    assert out["n_songs"] == 300
    assert out["n_positives"] > 0


def test_cli_train_and_eval(cli_dataset, tmp_path, capsys):
    run_dir = str(tmp_path / "runs")
    cli_main(["train", "--dataset", cli_dataset, "--run-dir", run_dir,
              "--run-name", "t1",
              "--set", "train.epochs=1",
              "--set", "train.batches_per_epoch=20",
              "--set", "train.batch_size=32",
              "--set", "walk.n_hops=100",
              "--set", "walk.batch_walkers=512"])
    assert os.path.isfile(os.path.join(run_dir, "t1", "emb.npy"))
    emb = np.load(os.path.join(run_dir, "t1", "emb.npy"))
    assert emb.shape == (300, 128)
    # config snapshot written
    assert os.path.isfile(os.path.join(run_dir, "t1", "config.json"))

    eval_dir = str(tmp_path / "ev")
    cli_main(["eval", "--dataset", cli_dataset, "--run-dir", run_dir,
              "--eval-dir", eval_dir, "--k", "100",
              "--pinsage-runs", "t1"])
    out = capsys.readouterr().out
    assert "PinSage:t1" in out
    assert os.path.isfile(os.path.join(eval_dir, "results_accuracy.csv"))
    assert os.path.isfile(os.path.join(eval_dir, "results_beyond.csv"))


def test_grid_search(cli_dataset, tmp_path):
    from gcn_song_embeddings_tpu.config import RunConfig, config_with_overrides
    from gcn_song_embeddings_tpu.train.grid_search import (
        get_param_sets,
        grid_search,
    )

    sets = get_param_sets({"train.lr": [1e-3, 1e-4], "model.T": [2, 3]})
    assert len(sets) == 4
    assert sets[0][0] == "0.0" and sets[-1][0] == "1.1"

    g = SongGraph(cli_dataset,
                  features_file=os.path.join(cli_dataset, "features.npy"))
    train, test = g.load_positives_split(
        os.path.join(cli_dataset, "positives.json"))
    base = config_with_overrides(RunConfig(), {
        "train.epochs": 1, "train.batches_per_epoch": 10,
        "train.batch_size": 32, "walk.n_hops": 100,
        "walk.batch_walkers": 512})
    out_path = str(tmp_path / "gs.json")
    results = grid_search(g, train, test, {"train.lr": [1e-3, 1e-4]},
                          base_cfg=base,
                          base_run_dir=str(tmp_path / "runs_gs"),
                          out_path=out_path, eval_k=100, verbose=False)
    assert len(results) == 2
    assert results[0]["mrr"] >= results[1]["mrr"]  # sorted
    assert os.path.isfile(out_path)
    # run dirs named like the reference (grid_search.py:20), suffixed with
    # a value hash so edited grids never resume stale checkpoints
    import glob

    assert glob.glob(str(tmp_path / "runs_gs" / "gridsearch#0-*"))


def test_cli_sharded_train(cli_dataset, tmp_path):
    run_dir = str(tmp_path / "runs_sh")
    cli_main(["train", "--dataset", cli_dataset, "--run-dir", run_dir,
              "--run-name", "sh1", "--mesh-graph", "2",
              "--set", "train.epochs=1",
              "--set", "train.batches_per_epoch=10",
              "--set", "train.batch_size=32",
              "--set", "walk.n_hops=100",
              "--set", "walk.batch_walkers=512"])
    emb = np.load(os.path.join(run_dir, "sh1", "emb.npy"))
    assert emb.shape == (300, 128)
    assert os.path.isfile(os.path.join(run_dir, "sh1", "state.npz"))


def test_cli_sharded_train_colisten(cli_dataset, tmp_path):
    """walk.colisten_copies on the SHARDED CLI path: the augmentation +
    '.colistenN' cache suffix go through the same shared helper as the
    single-chip trainer (data/device.apply_colisten_config)."""
    run_dir = str(tmp_path / "runs_shco")
    cli_main(["train", "--dataset", cli_dataset, "--run-dir", run_dir,
              "--run-name", "shco", "--mesh-graph", "2",
              "--set", "train.epochs=1",
              "--set", "train.batches_per_epoch=10",
              "--set", "train.batch_size=32",
              "--set", "walk.n_hops=100",
              "--set", "walk.batch_walkers=512",
              "--set", "walk.colisten_copies=1"])
    emb = np.load(os.path.join(run_dir, "shco", "emb.npy"))
    assert emb.shape == (300, 128)
    # the augmented-graph nbhds artifact landed under the suffixed path
    # (non-default n_hops=100 is encoded too — advisor round 4)
    assert glob_one(cli_dataset, "neighborhoods.colisten1.T100.h100.npz")


def glob_one(dirname, name):
    return os.path.isfile(os.path.join(dirname, name))
