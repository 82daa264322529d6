"""Tests for the GNN model family (models/gnnlib.py): GraphSAGE/GAT/GCN
encoders under the unsupervised, classification, and regression facades —
the capability surface of the reference's vendored lib/gnns (SURVEY #33)."""

import numpy as np
import pytest

from gcn_song_embeddings_tpu.evals import metrics as M
from gcn_song_embeddings_tpu.models.baselines import GraphSAGE
from gcn_song_embeddings_tpu.models.gnnlib import (
    GNN,
    GNNCore,
    degree_onehot,
    gnn_layer_apply,
    init_gnn_layer,
)
from gcn_song_embeddings_tpu.ops.graph_ops import adjacency_tracks


def _community_csr(n=200, k=4, intra=6, inter=1, seed=0):
    """Planted-partition graph: k communities, dense inside, sparse across.
    Returns (indptr, indices, labels)."""
    rng = np.random.default_rng(seed)
    labels = np.arange(n) % k
    rows = [[] for _ in range(n)]
    for c in range(k):
        members = np.nonzero(labels == c)[0]
        for u in members:
            for v in rng.choice(members, size=intra, replace=False):
                if u != v:
                    rows[u].append(int(v))
                    rows[v].append(int(u))
    for _ in range(n * inter):
        u, v = rng.integers(0, n, 2)
        if labels[u] != labels[v]:
            rows[u].append(int(v))
            rows[v].append(int(u))
    indptr = np.zeros(n + 1, dtype=np.int32)
    indices = []
    for u in range(n):
        nb = sorted(set(rows[u])) or [int(u)]
        indices.extend(nb)
        indptr[u + 1] = len(indices)
    return indptr, np.asarray(indices, dtype=np.int32), labels


@pytest.mark.parametrize("layer", ["sage", "gcn", "gat"])
def test_layer_apply_shapes(layer):
    import jax

    p = init_gnn_layer(jax.random.PRNGKey(0), layer, 16, 8)
    h_self = np.random.default_rng(0).normal(size=(5, 16)).astype(np.float32)
    h_nb = np.random.default_rng(1).normal(size=(5, 3, 16)).astype(np.float32)
    out = gnn_layer_apply(p, layer, h_self, h_nb)
    assert out.shape == (5, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_gat_attention_is_convex_combination():
    """With identity-like inputs the GAT output must lie in the convex hull
    of the projected self+neighbor vectors (softmax weights sum to 1)."""
    import jax
    import jax.numpy as jnp

    p = init_gnn_layer(jax.random.PRNGKey(1), "gat", 4, 4)
    p = dict(p, W=jnp.eye(4))
    h_self = jnp.array([[1.0, 0, 0, 0]])
    h_nb = jnp.array([[[0, 1.0, 0, 0], [0, 0, 1.0, 0]]])
    out = np.asarray(gnn_layer_apply(p, "gat", h_self, h_nb, activate=False))
    assert out.min() >= -1e-6
    np.testing.assert_allclose(out.sum(), 1.0, atol=1e-5)


@pytest.mark.parametrize("layer", ["gcn", "gat"])
def test_unsup_variants_learn_clusters(graph, positives, layer):
    """GCN/GAT unsupervised embeddings must beat chance on the synthetic
    cluster recovery task (GraphSAGE variant covered in
    test_more_baselines.py).  Real features are passed (attention over the
    degenerate degree-onehot fallback is uninformative by construction)."""
    m = GraphSAGE(hidden_dim=64, out_dim=32, steps=400, layer=layer)
    train, test = positives[:1200], positives[1200:]
    m.train(graph, graph.track_ids, train, test, graph.features)
    _, knn_n = m.knn(np.arange(graph.n_items), 100)
    hr = M.hit_rate(knn_n, test, 100)
    assert hr > 0.7, f"{layer} hit@100 {hr}"  # random ~0.2; measured 0.91


@pytest.mark.parametrize("layer", ["sage", "gcn", "gat"])
def test_classification_planted_partition(layer):
    """Half the nodes labeled; the rest must be classified from structure
    alone (identity features force the model to learn neighborhoods)."""
    indptr, indices, labels = _community_csr()
    n = len(labels)
    feats = np.eye(n, dtype=np.float32)
    rng = np.random.default_rng(3)
    train_mask = rng.random(n) < 0.5
    y = np.where(train_mask, labels, -1)

    core = GNNCore(layer=layer, task="classification", hidden_dim=32,
                   steps=300, batch=128, seed=1)
    core.fit(indptr, indices, feats, n, labels=y)
    pred = core.predict(np.nonzero(~train_mask)[0])
    acc = (pred == labels[~train_mask]).mean()
    assert acc > 0.6, f"{layer} test accuracy {acc}"  # chance = 0.25


def test_regression_predicts_neighbor_mean():
    """Target = mean of 1-hop neighbors' first feature — only reachable by
    aggregation, so this checks the message-passing path end to end."""
    indptr, indices, _ = _community_csr(n=500, seed=5)
    n = len(indptr) - 1
    rng = np.random.default_rng(4)
    feats = rng.normal(size=(n, 16)).astype(np.float32)
    y = np.array([feats[indices[indptr[u]:indptr[u + 1]], 0].mean()
                  for u in range(n)])
    train_mask = rng.random(n) < 0.6
    y_train = np.where(train_mask, y, np.nan)

    # n_sample=32 > max degree keeps the sampled mean close to the exact
    # mean (with-replacement sampling noise otherwise caps attainable R^2)
    core = GNNCore(layer="sage", task="regression", hidden_dim=32,
                   n_sample=32, steps=600, batch=128, seed=2)
    core.fit(indptr, indices, feats, n, labels=y_train)
    pred = core.predict(np.nonzero(~train_mask)[0], n_draws=8)
    target = y[~train_mask]
    ss_res = float(((pred - target) ** 2).sum())
    ss_tot = float(((target - target.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot
    assert r2 > 0.4, f"neighbor-mean regression R^2 {r2}"  # measured 0.63


def test_facade_roundtrip():
    indptr, indices, labels = _community_csr(n=80, k=2)
    g = GNN(model="GCN", task="classification", hidden_dim=16, steps=60,
            batch=64)
    g.fit(indptr, indices, labels=np.asarray(labels))
    emb = g.generate_embeddings()
    assert emb.shape == (80, 2)  # logits for 2 classes
    pred = g.predict(np.arange(80))
    assert pred.shape == (80,)
    assert set(np.unique(pred)) <= {0, 1}

    with pytest.raises(ValueError):
        GNN(model="transformer")
    with pytest.raises(ValueError):
        GNNCore(layer="sage", task="classification").fit(
            indptr, indices, None, 80, labels=None)


def test_degree_onehot_fallback():
    out = degree_onehot(np.array([0, 1, 10, 1000]))
    assert out.shape == (4, 32)
    np.testing.assert_array_equal(out.sum(axis=1), 1.0)


def test_graphsage_baseline_layer_kwarg(graph, positives):
    """The recommender wrapper forwards layer= to the core (smoke)."""
    m = GraphSAGE(hidden_dim=8, out_dim=4, steps=10, layer="gcn")
    m.train(graph, graph.track_ids, positives[:100], positives[100:200],
            None)
    adj = adjacency_tracks(graph, projected=True)
    assert adj.shape[0] == graph.n_items
    assert m.embedding.shape == (graph.n_items, 4)
