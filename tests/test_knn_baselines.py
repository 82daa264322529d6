"""kNN kernel + baseline recommender tests."""

import os

import numpy as np
import pytest

from gcn_song_embeddings_tpu.ops.knn import knn_from_emb
from gcn_song_embeddings_tpu.models.baselines import (
    ColTrackCF,
    EmbLoader,
    JaccardFast,
    PersPageRank,
    Random,
    TrackTrackCF,
)
from gcn_song_embeddings_tpu.evals import metrics as M
from gcn_song_embeddings_tpu.evals.harness import get_knn_dict
from gcn_song_embeddings_tpu.evals.tables import (
    compute_beyond_accuracy_table,
    compute_results_table,
)


def test_knn_from_emb_matches_bruteforce():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(100, 16)).astype(np.float32)
    w, n = knn_from_emb(emb, k=10, batch_size=32)
    assert w.shape == (100, 10) and n.shape == (100, 10)

    # brute-force cosine (reference cosine_sim_ab + topk drop col 0,
    # baselines.py:69-103)
    norm = np.linalg.norm(emb, axis=1)
    sim = emb @ emb.T / (norm[:, None] * norm[None, :] + 1e-16)
    for q in (0, 13, 99):
        order = np.argsort(-sim[q], kind="stable")
        assert order[0] == q  # self first
        want = order[1:11]
        np.testing.assert_allclose(np.sort(w[q])[::-1],
                                   np.sort(sim[q][want])[::-1], atol=1e-5)
        assert set(n[q].tolist()) == set(want.tolist())


def test_random_baseline(graph):
    m = Random()
    m.train(graph, graph.track_ids, None, None, None)
    w, n = m.knn(np.arange(5), 10)
    assert n.shape == (5, 10)
    for row in n:  # permutations: no duplicates
        assert len(set(row.tolist())) == 10


def test_embloader_roundtrip(graph, tmp_path):
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(graph.n_items, 24)).astype(np.float32)
    np.save(tmp_path / "emb.npy", emb)
    m = EmbLoader(str(tmp_path / "emb.npy"))
    m.train(graph, graph.track_ids, None, None, None)
    np.testing.assert_array_equal(m.embed(np.array([3, 4])), emb[[3, 4]])
    w, n = m.knn(np.arange(8), 5)
    assert n.shape == (8, 5)


def test_pers_pagerank_prefers_local_neighborhood(graph, device_graph):
    m = PersPageRank(n_hops=400, batch_size=64)
    m.train(graph, graph.track_ids, None, None, None)
    queries = np.arange(8)
    w, n = m.knn(queries, 10)
    assert (w[:, 0] > 0).all()
    # top neighbors must be 2-hop reachable from the query
    i2c, c2i = graph.i2c, graph.c2i
    for qi, q in enumerate(queries):
        two_hop = set()
        for c in i2c.indices[i2c.indptr[q]:i2c.indptr[q + 1]]:
            two_hop.update(
                c2i.indices[c2i.indptr[c]:c2i.indptr[c + 1]].tolist())
        # with restart prob .85 nearly all mass is 1 hop out
        assert int(n[qi, 0]) in two_hop


def test_jaccard_fast_scores(graph):
    m = JaccardFast()
    m.train(graph, graph.track_ids, None, None, None)
    w, n = m.knn(np.arange(6), 11)
    assert w.shape == (6, 10)  # reference drops col 0 -> k-1 cols
    assert (w >= 0).all() and (w <= 1 + 1e-6).all()
    # brute-force jaccard for query 0 vs reported top-1
    ct = np.zeros((graph.n_cols, graph.n_items))
    c2i = graph.c2i
    for c in range(graph.n_cols):
        ct[c, c2i.indices[c2i.indptr[c]:c2i.indptr[c + 1]]] = 1
    inter = ct[:, 0] @ ct
    union = ct[:, 0].sum() + ct.sum(0) - inter
    jac = inter / (union + 1e-10)
    jac_sorted = np.sort(jac)[::-1]
    np.testing.assert_allclose(w[0, 0], jac_sorted[1], atol=1e-5)


@pytest.mark.parametrize("algo", ["als", "bpr", "lmf"])
def test_cf_learns_structure(graph, positives, algo):
    """MF on the synthetic clustered graph must beat random at ranking
    held-out positives."""
    train, test = positives[:1200], positives[1200:]
    m = ColTrackCF(algo=algo, factors=32)
    m.train(graph, graph.track_ids, train, test, None)
    w, n = m.knn(np.arange(graph.n_items), 100)
    hr = M.hit_rate(n, test, 100)
    # random would be ~100/500 = 0.2; clustered structure should push higher
    assert hr > 0.35, f"{algo} hit@100 {hr}"


def test_tracktrack_cf_smoke(graph, positives):
    m = TrackTrackCF(algo="als", factors=16)
    m.train(graph, graph.track_ids, positives[:1000], None, None)
    w, n = m.knn(np.arange(10), 5)
    assert n.shape == (10, 5)


def test_harness_cache_and_tables(graph, positives, tmp_path):
    train, test = positives[:1200], positives[1200:]
    models = {
        "Random": Random(),
        "OpenFeatures": EmbLoader(
            os.path.join(graph.base_dir, "features.npy")),
    }
    knn_dict = get_knn_dict(models, graph, graph.track_ids, train, test,
                            graph.features, str(tmp_path), k=50,
                            verbose=False)
    w, n = knn_dict["Random"]
    assert n.shape[0] == graph.n_items
    tt, et, kt = knn_dict.get_times("Random")
    assert tt >= 0 and kt > 0

    table = compute_results_table(knn_dict, test, graph.in_degrees())
    assert "mrr" in table.columns and len(table) == 2
    # feature-based recs on the clustered synth data beat random
    assert table.loc["OpenFeatures", "hr (k=100)"] > \
        table.loc["Random", "hr (k=100)"]

    beyond = compute_beyond_accuracy_table(knn_dict, test,
                                           graph.in_degrees(),
                                           graph.features)
    assert set(beyond.columns) == {"intra diversity", "inter diversity",
                                   "coverage", "average degree"}

    # second call must hit the cache (no retraining): poison the model and
    # confirm results unchanged
    models2 = {"Random": None, "OpenFeatures": None}
    knn_dict2 = get_knn_dict(models2, graph, graph.track_ids, train, test,
                             graph.features, str(tmp_path), k=50,
                             verbose=False)
    w2, n2 = knn_dict2["Random"]
    np.testing.assert_array_equal(n, n2)


def test_ranking_matmuls_pinned_to_highest_precision():
    """Similarity-ranking matmuls must be f32-accurate (HIGHEST).

    On TPU, JAX's default matmul precision is a single bf16 MXU pass;
    embeddings trained at the reference margin (1e-5) separate by ~1e-4
    cosine, and bf16-rounded similarities collapse hit@100 0.995 -> 0.13
    (measured on v5e — RESULTS.md "Matmul precision").  CPU ignores the
    precision flag numerically, so this guards the STRUCTURE: the traced
    kernels must carry Precision.HIGHEST on their ranking dots.
    """
    import jax
    import jax.numpy as jnp

    from gcn_song_embeddings_tpu.evals import device_eval
    from gcn_song_embeddings_tpu.ops import knn as knn_ops
    from gcn_song_embeddings_tpu import serve

    emb = jnp.zeros((64, 8), jnp.float32)
    q = jnp.zeros((4,), jnp.int32)

    jx = jax.make_jaxpr(
        lambda e, i: knn_ops.cosine_topk_block.__wrapped__(e, i, 5))(emb, q)
    assert "HIGHEST" in str(jx)
    jx = jax.make_jaxpr(
        lambda e, i: knn_ops.cosine_topk_streamed.__wrapped__(
            e, i, 5, chunk=32))(emb, q)
    assert "HIGHEST" in str(jx)
    jx = jax.make_jaxpr(
        lambda e, a, b: device_eval._rank_block.__wrapped__(
            e, a, b, chunk=32))(emb, q, q)
    assert "HIGHEST" in str(jx)
    jx = jax.make_jaxpr(
        lambda e, r: serve._query_topk.__wrapped__(e, r, 5))(
            emb, jnp.int32(0))
    assert "HIGHEST" in str(jx)
