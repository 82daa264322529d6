"""Tests for node2vec, GraphSAGE, and the SimpleSimilarity family."""

import jax
import jax.numpy as jnp
import numpy as np

from gcn_song_embeddings_tpu.evals import metrics as M
from gcn_song_embeddings_tpu.models.baselines import (
    AdamicAdar,
    FastNode2Vec,
    GraphSAGE,
    JaccardIndex,
    Preferential,
)
from gcn_song_embeddings_tpu.ops import graph_ops
from gcn_song_embeddings_tpu.ops.node2vec import (
    build_alias_graph,
    node2vec_walks,
)


def test_project_bipartite(graph):
    w = graph_ops.project_bipartite(graph)
    assert w.shape == (graph.n_items, graph.n_items)
    assert (w.diagonal() == 0).all()
    # symmetric
    assert (w != w.T).nnz == 0
    # spot check: weight = #shared collections
    a, b = w.nonzero()[0][0], w.nonzero()[1][0]
    i2c = graph.i2c
    cols_a = set(i2c.indices[i2c.indptr[a]:i2c.indptr[a + 1]].tolist())
    cols_b = set(i2c.indices[i2c.indptr[b]:i2c.indptr[b + 1]].tolist())
    assert w[a, b] == len(cols_a & cols_b)


def test_alias_sampling_distribution():
    """Alias tables must reproduce the weighted neighbor distribution."""
    indptr = np.array([0, 3, 4])
    indices = np.array([0, 1, 2, 0], dtype=np.int32)
    weights = np.array([1.0, 2.0, 7.0, 1.0])
    g = build_alias_graph(indptr, indices, weights)

    from gcn_song_embeddings_tpu.ops.node2vec import _alias_sample

    n_draw = 4000
    nodes = jnp.zeros((n_draw,), dtype=jnp.int32)
    draws = np.asarray(_alias_sample(g, nodes, jax.random.PRNGKey(0)))
    freq = np.bincount(draws, minlength=3) / n_draw
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.7], atol=0.03)


def test_node2vec_walks_valid_edges(graph):
    proj = graph_ops.project_bipartite(graph)
    alias = build_alias_graph(proj.indptr, proj.indices,
                              proj.data.astype(np.float64))
    starts = jnp.arange(32, dtype=jnp.int32)
    walks = np.asarray(node2vec_walks(alias, starts, 10, 2.0, 0.5,
                                      jax.random.PRNGKey(0)))
    assert walks.shape == (32, 10)
    np.testing.assert_array_equal(walks[:, 0], np.arange(32))
    # consecutive entries must be edges of the projection (or stuck on a
    # degree-0 node)
    indptr, indices = proj.indptr, proj.indices
    for i in range(8):
        for t in range(9):
            u, v = walks[i, t], walks[i, t + 1]
            nbrs = indices[indptr[u]:indptr[u + 1]]
            assert v in nbrs or (len(nbrs) == 0 and u == v)


def test_node2vec_learns_clusters(graph, positives):
    m = FastNode2Vec(dim=32, epochs=5, walks_per_node=5)
    train, test = positives[:1200], positives[1200:]
    m.train(graph, graph.track_ids, train, test, None)
    _, knn_n = m.knn(np.arange(graph.n_items), 100)
    hr = M.hit_rate(knn_n, test, 100)
    assert hr > 0.4, f"node2vec hit@100 {hr}"  # random ~0.2


def test_graphsage_learns_clusters(graph, positives):
    m = GraphSAGE(hidden_dim=64, out_dim=32, steps=400)
    train, test = positives[:1200], positives[1200:]
    m.train(graph, graph.track_ids, train, test, graph.features)
    assert m.embedding.shape == (graph.n_items, 32)
    _, knn_n = m.knn(np.arange(graph.n_items), 100)
    hr = M.hit_rate(knn_n, test, 100)
    assert hr > 0.4, f"graphsage hit@100 {hr}"


def test_graphsage_degree_fallback(graph):
    m = GraphSAGE(hidden_dim=16, out_dim=8, steps=30)
    m.train(graph, graph.track_ids, None, None, None)
    assert m.embedding.shape == (graph.n_items, 8)
    assert np.isfinite(m.embedding).all()


def test_similarity_scores_bruteforce(graph):
    adj = graph_ops.adjacency_tracks(graph, projected=True)
    q = np.array([0, 5])
    pref = graph_ops.preferential_scores(adj, q)
    deg = np.asarray((adj > 0).sum(axis=1)).ravel()
    np.testing.assert_allclose(pref[0], deg[0] * deg)

    jac = graph_ops.jaccard_scores(adj, q)
    a = (adj > 0).astype(np.int32)
    n0 = set(a[0].nonzero()[1].tolist())
    n5 = set(a[5].nonzero()[1].tolist())
    want = len(n0 & n5) / max(len(n0 | n5), 1)
    np.testing.assert_allclose(jac[0, 5], want, atol=1e-6)

    aa = graph_ops.adamic_adar_scores(adj, q)
    want_aa = sum(1.0 / np.log(deg[z]) for z in (n0 & n5) if deg[z] > 1)
    np.testing.assert_allclose(aa[0, 5], want_aa, rtol=1e-5)


def test_similarity_recommenders(graph, positives):
    train, test = positives[:1200], positives[1200:]
    for cls in (JaccardIndex, AdamicAdar, Preferential):
        m = cls()
        m.train(graph, graph.track_ids, train, test, None)
        w, n = m.knn(np.arange(16), 10)
        assert n.shape == (16, 10)
        assert np.isfinite(w).all()
    # Jaccard on the projection should carry real signal
    m = JaccardIndex()
    m.train(graph, graph.track_ids, train, test, None)
    _, knn_n = m.knn(np.arange(graph.n_items), 100)
    assert M.hit_rate(knn_n, test, 100) > 0.35


def test_adamic_adar_unprojected(graph):
    """Unprojected (bipartite) Adamic-Adar: common neighbors are
    collections, weighted by collection degree."""
    m = AdamicAdar(projected=False)
    m.train(graph, graph.track_ids, None, None, None)
    w, n = m.knn(np.arange(4), 5)
    assert np.isfinite(w).all()
    # brute-force for query 0 vs candidate n[0,0]
    adj = graph_ops.adjacency_tracks(graph, projected=False)
    a = (adj > 0)
    cols0 = set(a[0].nonzero()[1].tolist())
    cand = int(n[0, 0])
    colsc = set(a[cand].nonzero()[1].tolist())
    col_deg = np.asarray(a.sum(axis=0)).ravel()
    want = sum(1.0 / np.log(col_deg[z]) for z in (cols0 & colsc)
               if col_deg[z] > 1)
    np.testing.assert_allclose(w[0, 0], want, rtol=1e-5)


def test_random_baseline_varies_across_batches(graph):
    from gcn_song_embeddings_tpu.models.baselines import Random

    m = Random()
    m.train(graph, graph.track_ids, None, None, None)
    _, n1 = m.knn(np.arange(0, 8), 10)
    _, n2 = m.knn(np.arange(8, 16), 10)
    assert not np.array_equal(n1, n2)


def test_pad_rows_vectorized_and_hub_capped():
    import scipy.sparse as sp

    from gcn_song_embeddings_tpu.models.baselines.mf import _pad_rows

    rows = [
        ([0, 2, 5], [1.0, 3.0, 2.0]),
        ([1], [9.0]),
        ([], []),
        ([0, 1, 2, 3, 4, 5, 6, 7], [1, 8, 2, 7, 3, 6, 4, 5]),  # hub
    ]
    indptr = np.cumsum([0] + [len(r[0]) for r in rows])
    mat = sp.csr_matrix(
        (np.concatenate([r[1] for r in rows]).astype(np.float32),
         np.concatenate([r[0] for r in rows]).astype(np.int32),
         indptr), shape=(4, 8))

    # exact (max_nnz=max row) keeps everything
    idx, val = _pad_rows(mat, max_nnz=8)
    assert idx.shape == (4, 8)
    np.testing.assert_array_equal(idx[0, :3], [0, 2, 5])
    np.testing.assert_array_equal(val[1, :1], [9.0])
    assert val[2].sum() == 0

    # capped: hub row keeps its top-3 confidences (8, 7, 6)
    idx3, val3 = _pad_rows(mat, max_nnz=3)
    assert idx3.shape == (4, 3)
    assert set(val3[3].tolist()) == {8.0, 7.0, 6.0}
    np.testing.assert_array_equal(np.sort(idx3[3]), [1, 3, 5])


def test_random_baseline_distinct_and_fast():
    from gcn_song_embeddings_tpu.models.baselines.simple import Random

    r = Random(seed=3)
    r.train(None, list(range(50000)), None, None, None)
    w, n = r.knn(np.arange(64), k=100)
    assert n.shape == (64, 100)
    for row in n:
        assert len(set(row.tolist())) == 100        # distinct within a row
    assert n.max() < 50000 and n.min() >= 0
