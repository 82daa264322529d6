"""Metric unit tests seeded from the reference's hand-built 8-node fixture
(eval.py:660-683) plus brute-force cross-checks against naive loops."""

import numpy as np

from gcn_song_embeddings_tpu.evals import metrics as M


# the reference's only "mock": 8-node knn matrix + positives (eval.py:660-683)
KNN_MAT = np.array([
    [0, 1, 5, 6, 7],
    [1, 0, 6, 5, 7],
    [2, 4, 3, 0, 1],
    [3, 4, 2, 7, 6],
    [4, 2, 3, 0, 1],
    [5, 6, 0, 1, 7],
    [6, 5, 7, 3, 1],
    [7, 6, 5, 0, 1],
])
POSITIVES = np.array([
    [0, 1],
    [0, 5],
    [3, 4],
    [4, 2],
    [5, 6],
    [6, 7],
])


def _hit_rate_loop(knn_mat, pos, K):
    hits = 0
    for q, p in pos:
        if p in knn_mat[q, :K]:
            hits += 1
    return hits / len(pos)


def _mrr_loop(knn_mat, pos, K):
    total = 0.0
    for q, p in pos:
        row = knn_mat[q, :K]
        where = np.nonzero(row == p)[0]
        rank = where[0] + 1 if len(where) else K
        total += 1.0 / rank
    return total / len(pos)


def test_hit_rate_fixture():
    for K in (1, 2, 3, 5):
        assert M.hit_rate(KNN_MAT, POSITIVES, K) == \
            _hit_rate_loop(KNN_MAT, POSITIVES, K)
    # manual spot check at K=2: (0,1),(3,4),(4,2),(5,6) hit;
    # (0,5) and (6,7) sit at rank 3 -> miss
    assert M.hit_rate(KNN_MAT, POSITIVES, 2) == 4 / 6


def test_mrr_fixture_and_miss_fallback():
    for K in (1, 2, 3, 5):
        np.testing.assert_allclose(M.mrr(KNN_MAT, POSITIVES, K),
                                   _mrr_loop(KNN_MAT, POSITIVES, K))
    # miss counts as rank K (eval.py:248-249): pair (0,5) has rank 3
    # at K=5; at K=2 it must count as rank 2
    assert M.mrr(np.array([[0, 1]]), np.array([[0, 7]]), 2) == 1 / 2


def test_metrics_random_brute_force():
    rng = np.random.default_rng(0)
    n, K = 60, 20
    knn = np.stack([rng.permutation(n)[:K] for _ in range(n)])
    pos = rng.integers(0, n, (40, 2))
    for k in (1, 5, 20):
        assert M.hit_rate(knn, pos, k) == _hit_rate_loop(knn, pos, k)
        np.testing.assert_allclose(M.mrr(knn, pos, k), _mrr_loop(knn, pos, k))


def test_coverage_uses_columns_1_to_k_plus_1():
    """Quirk parity (eval.py:346): coverage looks at columns 1:K+1."""
    knn = np.array([[0, 1, 2], [1, 2, 3], [2, 3, 0]])
    # K=1 -> column 1 only -> recs {1, 2, 3} -> 3/3
    assert M.coverage(knn, K=1) == 1.0
    # K=2 -> columns 1,2 -> {1,2,3,0} -> 4/3
    np.testing.assert_allclose(M.coverage(knn, K=2), 4 / 3)


def test_intra_diversity_bounds_and_identical_lists():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(30, 8)).astype(np.float32)
    knn = np.tile(np.arange(5), (30, 1))
    d_same = M.intra_diversity(knn, None, 5, feats)
    # identical feature list for all queries; diversity equals
    # 1 - mean pairwise (incl diagonal) sim of those 5 rows
    unit = feats[:5] / np.linalg.norm(feats[:5], axis=1, keepdims=True)
    want = 1 - (unit @ unit.T).mean()
    np.testing.assert_allclose(d_same, want, atol=1e-5)


def test_inter_diversity_extremes():
    n, K = 40, 5
    same = np.tile(np.arange(K), (n, 1))
    assert abs(M.inter_diversity(same, None, K, n_pairs=200)) < 1e-9
    # disjoint halves -> sampled pairs from different halves have distance 1
    a = np.tile(np.arange(K), (n // 2, 1))
    b = np.tile(np.arange(K, 2 * K), (n // 2, 1))
    disjoint = np.concatenate([a, b], 0)
    d = M.inter_diversity(disjoint, None, K, n_pairs=2000, seed=0)
    assert 0.3 < d < 0.7  # ~half the sampled pairs cross halves
    # partial overlap: rows share exactly 2 of 5 entries -> distance 0.6
    c = np.tile(np.arange(K), (n, 1))
    c[1::2, 2:] += 100  # odd rows differ in 3 of 5 slots
    d2 = M.inter_diversity(c, None, K, n_pairs=4000, seed=1)
    assert 0.25 < d2 < 0.35  # ~half the pairs mixed: mean ≈ 0.5 * 0.6


def test_average_degree_and_degree_dist():
    deg = np.array([1, 2, 3, 4, 5, 6, 7, 8])
    got = M.average_degree(KNN_MAT, deg, K=2)
    want = deg[KNN_MAT[:, :2].reshape(-1)].mean()
    np.testing.assert_allclose(got, want)
    levels, counts = M.degree_dist(KNN_MAT, deg, 2)
    assert counts.sum() == KNN_MAT.shape[0] * 2


def test_low_degree_and_low_co_accuracy():
    deg = np.array([0, 5, 5, 1, 5, 0, 5, 5])
    # queries with degree <= 1: nodes 0, 3, 5 -> pairs 0,1,2,4
    got = M.low_degree_accuracy(KNN_MAT, deg, POSITIVES, 5, 1, M.hit_rate)
    sel = POSITIVES[np.isin(POSITIVES[:, 0], [0, 3, 5])]
    assert got == _hit_rate_loop(KNN_MAT, sel, 5)

    # low-co: query 0 appears twice -> co=2; with thr=1 it is excluded
    got = M.low_co_accuracy(KNN_MAT, POSITIVES, 5, 1, M.hit_rate)
    sel = POSITIVES[POSITIVES[:, 0] != 0]
    assert got == _hit_rate_loop(KNN_MAT, sel, 5)


def test_device_rank_eval_matches_knn_metrics():
    """rank_eval must agree with the kNN-cache path on hit@K and MRR."""
    import jax.numpy as jnp  # noqa: F401

    from gcn_song_embeddings_tpu.evals.device_eval import rank_eval
    from gcn_song_embeddings_tpu.ops.knn import knn_from_emb

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(300, 16)).astype(np.float32)
    pairs = rng.integers(0, 300, (200, 2)).astype(np.int32)
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]

    got = rank_eval(emb, pairs, hit_ks=(10, 50), mrr_k=200, batch=64)
    _, knn_n = knn_from_emb(emb, k=299)
    want_h10 = M.hit_rate(knn_n, pairs, 10)
    want_h50 = M.hit_rate(knn_n, pairs, 50)
    want_mrr = M.mrr(knn_n, pairs, 200)
    np.testing.assert_allclose(got["hit@10"], want_h10, atol=1e-9)
    np.testing.assert_allclose(got["hit@50"], want_h50, atol=1e-9)
    np.testing.assert_allclose(got["mrr@200"], want_mrr, atol=1e-6)


def test_device_rank_eval_tie_semantics():
    """Duplicate embedding rows (ties) must rank by AVERAGE rank, not
    optimistically: a positive tied with m other items gets
    rank = 1 + #better + m/2.  Guards the ALS-inflation bias found in
    round 4 (device_eval docstring)."""
    from gcn_song_embeddings_tpu.evals.device_eval import rank_eval

    # catalog: query q=0; one better item; positive (3) tied with 4
    # duplicates (4..7); rest worse
    d = 8
    base = np.eye(d, dtype=np.float32)
    q = base[0]
    better = 0.9 * q + np.sqrt(1 - 0.81) * base[1]
    tied = 0.5 * q + np.sqrt(1 - 0.25) * base[2]
    worse = base[3]
    emb = np.stack([q, better, worse] + [tied] * 5)      # ids 3..7 tied
    pairs = np.array([[0, 3]])
    r = rank_eval(emb, pairs, hit_ks=(2, 4, 8), mrr_k=10, batch=1)
    # better=rank-candidate count 1, tied others m=4 -> rank = 1+1+2 = 4
    assert r["hit@4"] == 1.0 and r["hit@2"] == 0.0
    np.testing.assert_allclose(r["mrr@10"], 1.0 / 4)

    # ODD tie count: average rank is a half-unit and must NOT be floored
    # (advisor round 4): m=3 tied others -> rank = 1 + 1 + 1.5 = 3.5
    emb_odd = np.stack([q, better, worse] + [tied] * 4)  # ids 3..6 tied
    r = rank_eval(emb_odd, pairs, hit_ks=(3, 4), mrr_k=10, batch=1)
    assert r["hit@3"] == 0.0 and r["hit@4"] == 1.0
    np.testing.assert_allclose(r["mrr@10"], 1.0 / 3.5)


def test_evaluator_divergence_mechanism_on_ties():
    """Round-5 VERDICT item 2(ii): the two instruments' documented
    divergence on ALS-like duplicate-row embeddings.

    The list-based harness (knn lists truncated at K + metrics.mrr's
    miss-as-rank-K fallback, reference eval.py:112-143 + :248-249) and
    the fused rank_eval (average direct rank) must:
      * agree exactly on continuous (untied) positives at every k,
      * agree on hit@k for cut points that don't straddle a tie block,
      * diverge in the DOCUMENTED direction when a tie block straddles
        K: the truncated list misses the positive (rank := K) while the
        average rank is < K, so rank_eval MRR >= harness MRR — the
        round-4 ALS-inflation mechanism (RESULTS.md tie audit).
    """
    from gcn_song_embeddings_tpu.evals.device_eval import rank_eval
    from gcn_song_embeddings_tpu.ops.knn import knn_from_emb

    # catalog: 9 distinct "better" items, a 160-row duplicate block
    # (ALS cold items), distinct worse tail
    d = 16
    rng = np.random.default_rng(0)
    base = rng.normal(size=(4, d))
    base, _ = np.linalg.qr(base.T)
    base = base.T.astype(np.float32)                     # 4 orthonormal
    q = base[0]

    def at_sim(s, direction):
        return s * q + np.sqrt(1 - s * s) * direction

    rows = [q]
    rows += [at_sim(0.99 - 0.01 * i, base[1]) for i in range(9)]  # 1..9
    rows += [at_sim(0.5, base[2])] * 160                 # ids 10..169 tied
    # distinct worse tail (ids 170..199)
    rows += [at_sim(0.1 - 0.002 * i, base[3]) for i in range(30)]
    emb = np.stack(rows).astype(np.float32)

    K = 100
    pairs = np.array([[0, 5],       # continuous positive, true rank 5
                      [0, 150]])    # tie-block member, out of the top-K
    # harness instrument: truncated lists + reference-quirk metrics
    _, knn_n = knn_from_emb(emb, k=K)
    h = {f"hit@{k}": M.hit_rate(knn_n, pairs, k) for k in (4, 9, 100)}
    h["mrr"] = M.mrr(knn_n, pairs, K)
    # fused instrument
    r = rank_eval(emb, pairs, hit_ks=(4, 9, 100), mrr_k=K, batch=2)

    # (a) agreement away from tie blocks (pair 1 has true rank 5)
    assert h["hit@4"] == r["hit@4"] == 0.0
    assert h["hit@9"] == r["hit@9"] == 0.5
    # (b) the straddling block diverges in the documented direction:
    # harness list (ids 10..100 fill ranks 10..100) misses id 150;
    # rank_eval average rank = 1 + 9 + 159/2 = 89.5 <= 100
    assert h["hit@100"] == 0.5 and r["hit@100"] == 1.0
    np.testing.assert_allclose(
        h["mrr"], 0.5 * (1 / 5 + 1 / K), atol=1e-9)
    np.testing.assert_allclose(
        r[f"mrr@{K}"], 0.5 * (1 / 5 + 1 / 89.5), rtol=1e-5)
    assert r[f"mrr@{K}"] >= h["mrr"]                     # inflation side
