"""Data-layer tests: CSR build, determinism, id consistency, stats.

Models the reference's manual `inspect_dataset` invariants
(pinsage_training.py:391-439) as real assertions.
"""

import json
import os

import numpy as np

from gcn_song_embeddings_tpu.data import SongGraph
from gcn_song_embeddings_tpu.data.graph import (
    co_occurrence_counts,
    col_track_matrix,
    track_track_matrix,
    z_normalize,
)
from gcn_song_embeddings_tpu.native import jsongraph


def test_double_instantiation_deterministic(dataset_dir):
    g1 = SongGraph(dataset_dir,
                   features_file=os.path.join(dataset_dir, "features.npy"))
    g2 = SongGraph(dataset_dir,
                   features_file=os.path.join(dataset_dir, "features.npy"))
    np.testing.assert_array_equal(g1.i2c.indptr, g2.i2c.indptr)
    np.testing.assert_array_equal(g1.i2c.indices, g2.i2c.indices)
    np.testing.assert_array_equal(g1.c2i.indices, g2.c2i.indices)
    assert g1.track_ids == g2.track_ids
    assert g1.col_ids == g2.col_ids
    np.testing.assert_array_equal(g1.features, g2.features)


def test_id_mapping_matches_json(graph, dataset_dir):
    """String<->index consistency (reference pinsage_training.py:415-431)."""
    with open(os.path.join(dataset_dir, "graph.json")) as f:
        raw = json.load(f)
    sample = 69
    str_sample = graph.track_ids[sample]
    expect = sorted(e["to"] for e in raw["edges"] if e["from"] == str_sample)
    start, stop = graph.i2c.indptr[sample], graph.i2c.indptr[sample + 1]
    got = sorted(graph.col_ids[c] for c in graph.i2c.indices[start:stop])
    assert got == expect


def test_positives_mapping(graph, dataset_dir, positives):
    with open(os.path.join(dataset_dir, "positives.json")) as f:
        raw = json.load(f)
    i = 17
    assert graph.track_ids[positives[i, 0]] == raw[i]["a"]
    assert graph.track_ids[positives[i, 1]] == raw[i]["b"]


def test_positives_split_seeded(graph, dataset_dir):
    pos_path = os.path.join(dataset_dir, "positives.json")
    tr1, te1 = graph.load_positives_split(pos_path)
    tr2, te2 = graph.load_positives_split(pos_path)
    np.testing.assert_array_equal(tr1, tr2)
    np.testing.assert_array_equal(te1, te2)
    n = tr1.shape[0] + te1.shape[0]
    assert tr1.shape[0] == int(0.7 * n)


def test_z_normalize_matches_reference_semantics():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 8)).astype(np.float32) * 3 + 1
    z = z_normalize(x)
    # unbiased std + 1e-12 (spotify_graph.py:77-79)
    expect = (x - x.mean(0)) / (x.std(0, ddof=1) + 1e-12)
    np.testing.assert_allclose(z, expect, rtol=1e-5)


def test_bipartite_csr_roundtrip(graph):
    # every i->c edge has a c->i mirror (both directions materialized)
    i2c, c2i = graph.i2c, graph.c2i
    assert i2c.nnz == c2i.nnz
    # spot-check mirror for a node
    t = 3
    cols = i2c.indices[i2c.indptr[t]:i2c.indptr[t + 1]]
    for c in cols:
        items = c2i.indices[c2i.indptr[c]:c2i.indptr[c + 1]]
        assert t in items


def test_degree_and_stats(graph, positives):
    stats = graph.stats(positives)
    assert stats["n_songs"] == graph.n_items
    assert stats["mean_song_degree"] > 0
    co = co_occurrence_counts(graph.n_items, positives)
    assert co.sum() == positives.shape[0]


def test_sparse_matrices(graph, positives):
    tt = track_track_matrix(graph.n_items, positives)
    assert tt.shape == (graph.n_items, graph.n_items)
    assert tt.sum() == positives.shape[0]
    ct = col_track_matrix(graph)
    assert ct.shape == (graph.n_cols, graph.n_items)
    assert ct.nnz == graph.c2i.nnz


def test_native_parser_matches_python(dataset_dir, graph):
    """When the C++ parser is built, it must agree with the json module."""
    graph_path = os.path.join(dataset_dir, "graph.json")
    src_py, dst_py = jsongraph._load_edges_python(graph_path, graph.index_map)
    if jsongraph.native_available():
        src_c, dst_c = jsongraph.load_edges(graph_path, graph.index_map)
        np.testing.assert_array_equal(src_c, src_py)
        np.testing.assert_array_equal(dst_c, dst_py)
    else:
        src_c, dst_c = jsongraph.load_edges(graph_path, graph.index_map)
        np.testing.assert_array_equal(src_c, src_py)


def test_recommended_config_preset():
    from gcn_song_embeddings_tpu.config import RunConfig

    rc = RunConfig.recommended("x")
    assert rc.run_name == "x"
    assert rc.train.margin == 0.1 and rc.train.lr == 1e-3
    # round-4 measured winner: co-listen augmentation + widened T
    # (results/grid_search_colisten_hard.json bimodality)
    assert rc.walk.colisten_copies == 1 and rc.model.T == 10
    assert not rc.train.hard_negatives
    # remaining structural hyperparameters stay at reference values
    assert rc.model.n_layers == 2
    assert rc.walk.alpha == 0.85 and rc.walk.n_hops == 500
    assert rc.train.hn_max <= rc.walk.t_precompute
