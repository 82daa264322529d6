"""Unsupervised GraphSAGE baseline.

Capability of the reference's vendored "GNNs easily called" library
(lib/gnns/GNNs_unsupervised.py: GNN facade with mean-aggregator SageLayers,
uniform neighbor sampling num_sample=10, unsupervised margin loss on
random-walk positives vs distant negatives) and the `GraphSAGE` baseline
that wraps it (baselines.py:517-544 — broken as shipped, SURVEY §7b.8; the
capability is implemented correctly here).

TPU re-design: fixed-fanout uniform neighbor sampling gives static-shape
[B, S] gathers; a 2-layer mean-aggregator forward and the triplet loss run
inside one jitted scan of Adam steps.  Falls back to degree-bucket one-hot
features when none are provided (like the lib's DataLoader fallback,
GNNs_unsupervised.py:229-261).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from gcn_song_embeddings_tpu.models.baselines.base import EmbeddingModel
from gcn_song_embeddings_tpu.ops.knn import knn_from_emb


def _degree_onehot(degrees: np.ndarray, n_buckets: int = 32) -> np.ndarray:
    buckets = np.clip(np.log1p(degrees).astype(np.int64), 0, n_buckets - 1)
    out = np.zeros((len(degrees), n_buckets), dtype=np.float32)
    out[np.arange(len(degrees)), buckets] = 1.0
    return out


def _uniform_neighbors(indptr, indices, nodes, n_sample, key):
    """[m] nodes -> [m, S] uniformly sampled neighbors (with replacement;
    degree-0 nodes sample themselves)."""
    m = nodes.shape[0]
    start = indptr[nodes]
    deg = indptr[nodes + 1] - start
    r = jax.random.randint(key, (m, n_sample), 0, 1 << 30)
    offs = r % jnp.maximum(deg, 1)[:, None]
    nb = indices[start[:, None] + offs]
    return jnp.where((deg > 0)[:, None], nb, nodes[:, None])


class GraphSAGEUnsup:
    """2-layer mean-aggregator GraphSAGE trained with a triplet margin loss
    on 1-hop positives (the lib's Unsup_Loss 'margin' mode semantics)."""

    def __init__(self, hidden_dim: int = 128, out_dim: int = 128,
                 n_sample: int = 10, steps: int = 1500, batch: int = 512,
                 lr: float = 1e-3, margin: float = 3.0, seed: int = 0):
        self.hidden_dim = hidden_dim
        self.out_dim = out_dim
        self.n_sample = n_sample
        self.steps = steps
        self.batch = batch
        self.lr = lr
        self.margin = margin
        self.seed = seed

    def fit(self, indptr: np.ndarray, indices: np.ndarray,
            features: np.ndarray | None, n_nodes: int) -> np.ndarray:
        if features is None:
            deg = np.diff(indptr)
            features = _degree_onehot(deg)
        feats = jnp.asarray(features, dtype=jnp.float32)
        ip = jnp.asarray(indptr, dtype=jnp.int32)
        ix = jnp.asarray(indices, dtype=jnp.int32)
        in_dim = feats.shape[1]
        S = self.n_sample

        key = jax.random.PRNGKey(self.seed)
        k1, k2, key = jax.random.split(key, 3)
        scale1 = float(np.sqrt(2.0 / (2 * in_dim)))
        scale2 = float(np.sqrt(2.0 / (2 * self.hidden_dim)))
        params = {
            "W1": jax.random.normal(k1, (2 * in_dim, self.hidden_dim))
            * scale1,
            "W2": jax.random.normal(k2, (2 * self.hidden_dim, self.out_dim))
            * scale2,
        }
        tx = optax.adam(self.lr)
        opt_state = tx.init(params)

        def encode(p, nodes, key):
            """Two-layer sampled forward for [m] nodes."""
            ka, kb, kc = jax.random.split(key, 3)
            nb1 = _uniform_neighbors(ip, ix, nodes, S, ka)        # [m, S]
            flat1 = nb1.reshape(-1)
            nb2 = _uniform_neighbors(ip, ix, flat1, S, kb)        # [mS, S]

            # layer 1 on the 1-hop frontier (self = nb1 entries)
            h_nb2 = feats[nb2]                                    # [mS, S, f]
            h1_frontier = jnp.concatenate(
                [feats[flat1], h_nb2.mean(axis=1)], axis=1) @ p["W1"]
            h1_frontier = jax.nn.relu(h1_frontier)                # [mS, h]
            # layer 1 on the batch nodes themselves
            nb1b = _uniform_neighbors(ip, ix, nodes, S, kc)
            h_nb1b = feats[nb1b]
            h1_self = jax.nn.relu(jnp.concatenate(
                [feats[nodes], h_nb1b.mean(axis=1)], axis=1) @ p["W1"])

            # layer 2: aggregate layer-1 activations of sampled neighbors
            h1_nb = h1_frontier.reshape(nodes.shape[0], S, -1)
            h2 = jnp.concatenate(
                [h1_self, h1_nb.mean(axis=1)], axis=1) @ p["W2"]
            norm = jnp.linalg.norm(h2, axis=1, keepdims=True)
            return h2 / jnp.maximum(norm, 1e-12)

        margin = self.margin
        batch = self.batch

        def loss_fn(p, key):
            ks, kp, kn, ke = jax.random.split(key, 4)
            nodes = jax.random.randint(ks, (batch,), 0, n_nodes)
            pos = _uniform_neighbors(ip, ix, nodes, 1, kp)[:, 0]
            neg = jax.random.randint(kn, (batch,), 0, n_nodes)
            emb = encode(p, jnp.concatenate([nodes, pos, neg]), ke)
            zq, zp, zn = jnp.split(emb, 3)
            d_pos = jnp.sum((zq - zp) ** 2, axis=1)
            d_neg = jnp.sum((zq - zn) ** 2, axis=1)
            return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))

        @jax.jit
        def run(params, opt_state, keys):
            def step(carry, k):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(loss_fn)(params, k)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = lax.scan(
                step, (params, opt_state), keys)
            return params, opt_state, losses

        keys = jax.random.split(key, self.steps)
        params, opt_state, losses = run(params, opt_state, keys)
        self.losses = np.asarray(losses)

        # full-catalog embedding sweep (deterministic key per block)
        out = np.empty((n_nodes, self.out_dim), dtype=np.float32)
        bs = 2048
        ekey = jax.random.PRNGKey(self.seed + 7)
        embed_block = jax.jit(encode)
        for s in range(0, n_nodes, bs):
            blk = np.arange(s, s + bs, dtype=np.int32) % n_nodes
            res = embed_block(params, jnp.asarray(blk),
                              jax.random.fold_in(ekey, s))
            out[s:min(s + bs, n_nodes)] = np.asarray(res)[
                : min(bs, n_nodes - s)]
        return out


class GraphSAGE(EmbeddingModel):
    """GraphSAGE recommender over the (optionally projected) track graph
    (the working version of reference baselines.py:517-544)."""

    def __init__(self, projected: bool = True, **kwargs):
        self.projected = projected
        self.kwargs = kwargs
        self.embedding: np.ndarray | None = None

    def train(self, graph, ids, train_set, test_set, features) -> None:
        from gcn_song_embeddings_tpu.ops.graph_ops import adjacency_tracks

        adj = adjacency_tracks(graph, projected=self.projected).tocsr()
        model = GraphSAGEUnsup(**self.kwargs)
        feats = np.asarray(features, dtype=np.float32) \
            if features is not None else None
        self.embedding = model.fit(adj.indptr, adj.indices, feats, len(ids))

    def embed(self, nodeset):
        return self.embedding[np.asarray(nodeset)]

    def knn(self, nodeset, k):
        return knn_from_emb(self.embedding, np.asarray(nodeset), k)
