"""Tests for the graph-beats-features benchmark dataset (round-2 item 1).

The generator must produce a dataset where (a) the structural invariants
hold (coverage, positive semantics, twin-genre features, power-law
degrees) and (b) the framework demonstrably learns from the graph:
PinSage's hit@100 beats raw-feature kNN by >= 1.5x (the VERDICT
acceptance bar) — the capability the reference demonstrates on real
co-listen data (grid_search_results/*.json, eval.py:413-467).
"""

import json
import os

import numpy as np
import pytest

from gcn_song_embeddings_tpu.data import SongGraph, make_hard_dataset
from gcn_song_embeddings_tpu.data.device import DeviceGraph


@pytest.fixture(scope="module")
def hard_dir(tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("data") / "dataset_hard"
    return make_hard_dataset(
        str(out), n_tracks=4000, tracks_per_artist=20, artists_per_genre=10,
        genres_per_group=2, n_collections=800, n_positives=16000,
        feature_dim=64, seed=1)


@pytest.fixture(scope="module")
def latent(hard_dir):
    return np.load(os.path.join(hard_dir, "latent.npz"))


def test_streamed_writer_matches_dict_writer(tmp_path, monkeypatch):
    """The dataset_large streaming JSON branch (n_tracks >=
    _STREAM_JSON_MIN) must emit semantically identical files to the
    small-scale dict writer — same graph, tracks, collections, positives,
    features — so 1M-scale hard runs exercise the same benchmark."""
    from gcn_song_embeddings_tpu.data import synth

    kw = dict(n_tracks=1000, tracks_per_artist=10, artists_per_genre=10,
              genres_per_group=2, n_collections=200, n_positives=3000,
              feature_dim=16, seed=5)
    a = make_hard_dataset(str(tmp_path / "dict"), **kw)
    monkeypatch.setattr(synth, "_STREAM_JSON_MIN", 1)
    b = make_hard_dataset(str(tmp_path / "stream"), **kw)
    for fname in ("tracks.json", "collections.json", "graph.json",
                  "positives.json"):
        with open(os.path.join(a, fname)) as f:
            da = json.load(f)
        with open(os.path.join(b, fname)) as f:
            db = json.load(f)
        assert da == db, fname
    np.testing.assert_array_equal(
        np.load(os.path.join(a, "features.npy")),
        np.load(os.path.join(b, "features.npy")))


def test_structure_and_coverage(hard_dir, latent):
    g = json.load(open(os.path.join(hard_dir, "graph.json")))
    n = len(g["tracks"])
    assert n == 4000
    # every track in >= 1 collection (walk kernels require degree >= 1)
    src = {e["from"] for e in g["edges"] if e["from"].startswith("t")}
    assert len(src) == n
    # both edge directions materialized (reference get_data.py:211-214)
    pairs = {(e["from"], e["to"]) for e in g["edges"]}
    assert all((b, a) in pairs for a, b in pairs)
    # hierarchy sizes
    assert latent["artist"].max() == 199
    assert latent["genre"].max() == 19
    assert latent["group"].max() == 9


def test_positive_semantics(hard_dir, latent):
    artist, genre = latent["artist"], latent["genre"]
    pos = json.load(open(os.path.join(hard_dir, "positives.json")))
    a = np.array([int(p["a"][1:]) for p in pos])
    b = np.array([int(p["b"][1:]) for p in pos])
    assert (a != b).all()
    # all positives same-genre, mostly same-artist (p_artist_positive=0.8)
    assert (genre[a] == genre[b]).all()
    same_artist = (artist[a] == artist[b]).mean()
    assert 0.7 < same_artist < 0.9


def test_power_law_degrees(hard_dir):
    g = json.load(open(os.path.join(hard_dir, "graph.json")))
    deg = {}
    for e in g["edges"]:
        if e["from"].startswith("t"):
            deg[e["from"]] = deg.get(e["from"], 0) + 1
    degs = np.array(sorted(deg.values()))
    # heavy tail: the top-1% node degree is >= 4x the median
    assert degs[int(0.99 * len(degs))] >= 4 * np.median(degs)


def test_features_reveal_group_not_genre(hard_dir, latent):
    """Twin genres share a feature centroid; cold tracks carry none."""
    genre, group, cold = latent["genre"], latent["group"], latent["cold"]
    feats = np.load(os.path.join(hard_dir, "features.npy"))
    warm = ~cold
    # same-group genre centroids are nearly identical...
    cents = np.stack([feats[warm & (genre == g0)].mean(0)
                      for g0 in range(genre.max() + 1)])
    unit = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    sims = unit @ unit.T
    twin = np.array([[group[genre == i][0] == group[genre == j][0]
                      for j in range(len(cents))]
                     for i in range(len(cents))])
    np.fill_diagonal(twin, False)
    assert sims[twin].min() > 0.8
    # ...while cross-group centroids are near-orthogonal
    off = ~twin
    np.fill_diagonal(off, False)
    assert np.abs(sims[off]).max() < 0.4
    # cold tracks: no group signal (mean cosine to own centroid ~ 0)
    gc = cents[genre[cold]]
    fc = feats[cold]
    cos = (fc * gc).sum(1) / (
        np.linalg.norm(fc, axis=1) * np.linalg.norm(gc, axis=1))
    assert abs(cos.mean()) < 0.05
    # cold fraction matches preview_url absence in tracks.json
    tracks = json.load(open(os.path.join(hard_dir, "tracks.json")))
    no_clip = np.array([not v["preview_url"] for v in tracks.values()])
    assert (no_clip == cold).all()


def test_pinsage_beats_features(hard_dir):
    """End-to-end learning check: graph model >= 1.5x raw-feature kNN."""
    from gcn_song_embeddings_tpu.config import (
        RunConfig,
        config_with_overrides,
    )
    from gcn_song_embeddings_tpu.evals.device_eval import rank_eval
    from gcn_song_embeddings_tpu.train.trainer import PinSageTrainer

    g = SongGraph(hard_dir,
                  features_file=os.path.join(hard_dir, "features.npy"))
    dg = DeviceGraph.from_graph(g)
    train_pos, test_pos = g.load_positives_split(
        os.path.join(hard_dir, "positives.json"))
    test_pos = test_pos[:2000]

    r_feat = rank_eval(g.features, test_pos, hit_ks=(100,), mrr_k=1000,
                       batch=2048)
    cfg = config_with_overrides(RunConfig(run_name="hard_test"), {
        "train.epochs": 2,
        "train.batches_per_epoch": 300,
        "train.lr": 1e-3,
        "train.margin": 0.1,
        "walk.batch_walkers": 2048,
    })
    trainer = PinSageTrainer(
        dg, g.n_items, g.features, train_pos, cfg=cfg,
        base_run_dir=os.path.join(hard_dir, "runs"),
        nbhds_path=os.path.join(hard_dir, "neighborhoods.npz"),
        log=False, load_save=False, verbose=False)
    trainer.train()
    emb = np.asarray(trainer.embed(bsize=2048))
    r_ps = rank_eval(emb, test_pos, hit_ks=(100,), mrr_k=1000, batch=2048)

    assert r_ps["hit@100"] >= 1.5 * r_feat["hit@100"], (r_ps, r_feat)
    assert r_ps["mrr@1000"] >= 1.5 * r_feat["mrr@1000"], (r_ps, r_feat)
