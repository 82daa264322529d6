"""GNN model family: GraphSAGE / GAT / GCN encoders with unsupervised,
classification, and regression training facades.

Capability of the reference's vendored "GNNs easily called and used" library
(lib/gnns/): the ``GNN`` facade accepts model ∈ {GraphSAGE, GAT, GCN} in
unsupervised (GNNs_unsupervised.py:13-226), supervised-classification
(GNNs.py) and regression (regression_gnns/GNNs_regression.py) variants, all
sharing sampled-neighborhood minibatch forward passes (SageLayer /
Attention / GNN_model, GNNs_unsupervised.py:417-588, num_sample=10) and a
degree-one-hot feature fallback (GNNs_unsupervised.py:229-261).

TPU re-design (not a translation):
- fixed-fanout uniform neighbor sampling gives static-shape [B, S] gathers
  (the lib resamples python lists per node);
- GAT attention is batched MXU matmuls + a masked softmax over the S sampled
  edges + the self edge — no per-edge scatter softmax;
- GCN is the sampled symmetric-mean variant (self + neighbors averaged, one
  shared projection);
- the entire optimization (sampling, forward, loss, Adam) runs inside ONE
  jitted `lax.scan` over steps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

LAYERS = ("sage", "gcn", "gat")
TASKS = ("unsupervised", "classification", "regression")


def degree_onehot(degrees: np.ndarray, n_buckets: int = 32) -> np.ndarray:
    """log-degree bucket one-hot fallback features (the lib's DataLoader
    fallback capability, GNNs_unsupervised.py:229-261)."""
    buckets = np.clip(np.log1p(degrees).astype(np.int64), 0, n_buckets - 1)
    out = np.zeros((len(degrees), n_buckets), dtype=np.float32)
    out[np.arange(len(degrees)), buckets] = 1.0
    return out


def uniform_neighbors(indptr, indices, nodes, n_sample, key):
    """[m] nodes -> [m, S] uniformly sampled neighbors (with replacement;
    degree-0 nodes sample themselves)."""
    m = nodes.shape[0]
    start = indptr[nodes]
    deg = indptr[nodes + 1] - start
    r = jax.random.randint(key, (m, n_sample), 0, 1 << 30)
    offs = r % jnp.maximum(deg, 1)[:, None]
    nb = indices[start[:, None] + offs]
    return jnp.where((deg > 0)[:, None], nb, nodes[:, None])


def init_gnn_layer(key, layer: str, d_in: int, d_out: int) -> dict:
    if layer == "sage":
        scale = float(np.sqrt(2.0 / (2 * d_in)))
        return {"W": jax.random.normal(key, (2 * d_in, d_out)) * scale}
    if layer == "gcn":
        scale = float(np.sqrt(2.0 / d_in))
        return {"W": jax.random.normal(key, (d_in, d_out)) * scale}
    if layer == "gat":
        kw, kl, kr = jax.random.split(key, 3)
        scale = float(np.sqrt(2.0 / d_in))
        return {
            "W": jax.random.normal(kw, (d_in, d_out)) * scale,
            "a_l": jax.random.normal(kl, (d_out,)) * 0.1,
            "a_r": jax.random.normal(kr, (d_out,)) * 0.1,
        }
    raise ValueError(f"unknown layer type {layer!r}; choose from {LAYERS}")


def gnn_layer_apply(p: dict, layer: str, h_self: jnp.ndarray,
                    h_nb: jnp.ndarray, activate: bool = True) -> jnp.ndarray:
    """One sampled-neighborhood aggregation: [m, d] self + [m, S, d]
    neighbors -> [m, d_out]."""
    if layer == "sage":
        z = jnp.concatenate([h_self, h_nb.mean(axis=1)], axis=1) @ p["W"]
    elif layer == "gcn":
        s = h_nb.shape[1]
        z = ((h_self + h_nb.sum(axis=1)) / float(s + 1)) @ p["W"]
    elif layer == "gat":
        z_self = h_self @ p["W"]                     # [m, d_out]
        z_nb = h_nb @ p["W"]                         # [m, S, d_out]
        e_l = z_self @ p["a_l"]                      # [m]
        e_self = jax.nn.leaky_relu(e_l + z_self @ p["a_r"], 0.2)
        e_nb = jax.nn.leaky_relu(e_l[:, None] + z_nb @ p["a_r"], 0.2)
        w = jax.nn.softmax(
            jnp.concatenate([e_self[:, None], e_nb], axis=1), axis=1)
        z = w[:, :1] * z_self + jnp.einsum("ms,msd->md", w[:, 1:], z_nb)
    else:
        raise ValueError(f"unknown layer type {layer!r}")
    return jax.nn.relu(z) if activate else z


class GNNCore:
    """Two-layer sampled GNN encoder + scanned-Adam trainer for one of the
    three tasks.  `fit` consumes a CSR adjacency (indptr/indices over one
    node universe) exactly like the lib's adjacency-list DataLoader."""

    def __init__(self, layer: str = "sage", task: str = "unsupervised",
                 hidden_dim: int = 128, out_dim: int = 128,
                 n_sample: int = 10, steps: int = 1500, batch: int = 512,
                 lr: float = 1e-3, margin: float = 3.0, seed: int = 0):
        if layer not in LAYERS:
            raise ValueError(f"layer must be one of {LAYERS}, got {layer!r}")
        if task not in TASKS:
            raise ValueError(f"task must be one of {TASKS}, got {task!r}")
        self.layer = layer
        self.task = task
        self.hidden_dim = hidden_dim
        self.out_dim = out_dim
        self.n_sample = n_sample
        self.steps = steps
        self.batch = batch
        self.lr = lr
        self.margin = margin
        self.seed = seed
        self.losses: np.ndarray | None = None
        self._encode_fn = None
        self._params = None
        self._n_nodes = 0

    # -- forward ---------------------------------------------------------
    def _make_encode(self, feats, ip, ix):
        S = self.n_sample
        layer = self.layer
        final_activate = self.task == "unsupervised"

        def encode(p, nodes, key):
            ka, kb, kc = jax.random.split(key, 3)
            nb1 = uniform_neighbors(ip, ix, nodes, S, ka)          # [m, S]
            flat1 = nb1.reshape(-1)
            nb2 = uniform_neighbors(ip, ix, flat1, S, kb)          # [mS, S]

            h1_frontier = gnn_layer_apply(
                p["l1"], layer, feats[flat1], feats[nb2])          # [mS, h]
            nb1b = uniform_neighbors(ip, ix, nodes, S, kc)
            h1_self = gnn_layer_apply(
                p["l1"], layer, feats[nodes], feats[nb1b])         # [m, h]

            h1_nb = h1_frontier.reshape(nodes.shape[0], S, -1)
            h2 = gnn_layer_apply(p["l2"], layer, h1_self, h1_nb,
                                 activate=final_activate)
            if self.task == "unsupervised":
                norm = jnp.linalg.norm(h2, axis=1, keepdims=True)
                h2 = h2 / jnp.maximum(norm, 1e-12)
            return h2

        return encode

    def _init_params(self, in_dim: int, out_dim: int):
        key = jax.random.PRNGKey(self.seed)
        k1, k2, key = jax.random.split(key, 3)
        params = {
            "l1": init_gnn_layer(k1, self.layer, in_dim, self.hidden_dim),
            "l2": init_gnn_layer(k2, self.layer, self.hidden_dim, out_dim),
        }
        return params, key

    # -- training --------------------------------------------------------
    def fit(self, indptr: np.ndarray, indices: np.ndarray,
            features: np.ndarray | None, n_nodes: int,
            labels: np.ndarray | None = None) -> np.ndarray:
        """Train; returns the full-catalog [n_nodes, out] output matrix
        (embeddings for unsupervised, logits/values for supervised)."""
        if features is None:
            features = degree_onehot(np.diff(indptr))
        feats = jnp.asarray(features, dtype=jnp.float32)
        ip = jnp.asarray(indptr, dtype=jnp.int32)
        ix = jnp.asarray(indices, dtype=jnp.int32)

        if self.task == "unsupervised":
            head_dim = self.out_dim
            loss_fn = self._unsup_loss
            train_pool = None
        else:
            if labels is None:
                raise ValueError(f"task={self.task!r} requires labels")
            labels = np.asarray(labels)
            mask = (labels >= 0) if self.task == "classification" else \
                np.isfinite(labels.astype(np.float64))
            train_pool = jnp.asarray(np.nonzero(mask)[0].astype(np.int32))
            if train_pool.shape[0] == 0:
                raise ValueError("no labeled nodes to train on")
            if self.task == "classification":
                head_dim = int(labels.max()) + 1
                y = jnp.asarray(labels.astype(np.int32))
                loss_fn = partial(self._clf_loss, y=y)
            else:
                head_dim = 1
                y = jnp.asarray(
                    np.nan_to_num(labels).astype(np.float32))
                loss_fn = partial(self._reg_loss, y=y)

        params, key = self._init_params(feats.shape[1], head_dim)
        encode = self._make_encode(feats, ip, ix)
        tx = optax.adam(self.lr)
        opt_state = tx.init(params)

        batch = self.batch

        def step_loss(p, k):
            return loss_fn(p, k, encode=encode, ip=ip, ix=ix,
                           n_nodes=n_nodes, batch=batch,
                           train_pool=train_pool)

        @jax.jit
        def run(params, opt_state, keys):
            def step(carry, k):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(step_loss)(params, k)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = lax.scan(
                step, (params, opt_state), keys)
            return params, opt_state, losses

        keys = jax.random.split(key, self.steps)
        params, opt_state, losses = run(params, opt_state, keys)
        self.losses = np.asarray(losses)
        self._params = params
        self._encode_fn = jax.jit(encode)
        self._n_nodes = n_nodes
        return self.transform(np.arange(n_nodes, dtype=np.int32))

    def _unsup_loss(self, p, key, *, encode, ip, ix, n_nodes, batch,
                    train_pool):
        ks, kp, kn, ke = jax.random.split(key, 4)
        nodes = jax.random.randint(ks, (batch,), 0, n_nodes)
        pos = uniform_neighbors(ip, ix, nodes, 1, kp)[:, 0]
        neg = jax.random.randint(kn, (batch,), 0, n_nodes)
        emb = encode(p, jnp.concatenate([nodes, pos, neg]), ke)
        zq, zp, zn = jnp.split(emb, 3)
        d_pos = jnp.sum((zq - zp) ** 2, axis=1)
        d_neg = jnp.sum((zq - zn) ** 2, axis=1)
        return jnp.mean(jnp.maximum(d_pos - d_neg + self.margin, 0.0))

    def _clf_loss(self, p, key, *, y, encode, ip, ix, n_nodes, batch,
                  train_pool):
        ks, ke = jax.random.split(key)
        idx = jax.random.randint(ks, (batch,), 0, train_pool.shape[0])
        nodes = train_pool[idx]
        logits = encode(p, nodes, ke)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y[nodes]).mean()

    def _reg_loss(self, p, key, *, y, encode, ip, ix, n_nodes, batch,
                  train_pool):
        ks, ke = jax.random.split(key)
        idx = jax.random.randint(ks, (batch,), 0, train_pool.shape[0])
        nodes = train_pool[idx]
        pred = encode(p, nodes, ke)[:, 0]
        return jnp.mean((pred - y[nodes]) ** 2)

    # -- inference -------------------------------------------------------
    def transform(self, nodes: np.ndarray, block: int = 2048,
                  n_draws: int = 1) -> np.ndarray:
        """Model outputs for arbitrary nodes (deterministic key per block).
        `n_draws > 1` averages several neighbor-sampling draws, shrinking
        the sampled-aggregation variance at inference."""
        if self._encode_fn is None:
            raise RuntimeError("fit() before transform()")
        nodes = np.asarray(nodes, dtype=np.int32)
        out_dim = jax.eval_shape(
            self._encode_fn, self._params,
            jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(0)).shape[1]
        out = np.empty((len(nodes), out_dim), dtype=np.float32)
        ekey = jax.random.PRNGKey(self.seed + 7)
        for s in range(0, len(nodes), block):
            blk = nodes[s:s + block]
            pad = block - len(blk)
            blk_p = np.pad(blk, (0, pad), mode="edge") if pad else blk
            bkey = jax.random.fold_in(ekey, s)
            res = sum(
                self._encode_fn(self._params, jnp.asarray(blk_p),
                                jax.random.fold_in(bkey, d))
                for d in range(n_draws)) / n_draws
            out[s:s + len(blk)] = np.asarray(res)[: len(blk)]
        return out

    def predict(self, nodes: np.ndarray, n_draws: int = 1) -> np.ndarray:
        """Class ids (classification) or scalar values (regression)."""
        out = self.transform(nodes, n_draws=n_draws)
        if self.task == "classification":
            return out.argmax(axis=1)
        if self.task == "regression":
            return out[:, 0]
        return out


class GNN:
    """Facade mirroring the vendored lib's entry point
    (lib/gnns/GNNs_unsupervised.py:13-226 `GNN(model=...)` with
    fit / generate_embeddings / predict): pick an encoder family and a task,
    feed a CSR adjacency + optional features (+ labels for supervised)."""

    def __init__(self, model: str = "graphsage", task: str = "unsupervised",
                 **kwargs):
        aliases = {"graphsage": "sage", "sage": "sage",
                   "gat": "gat", "gcn": "gcn"}
        key = model.lower()
        if key not in aliases:
            raise ValueError(
                f"model must be one of graphsage/gat/gcn, got {model!r}")
        self.core = GNNCore(layer=aliases[key], task=task, **kwargs)
        self._output: np.ndarray | None = None

    def fit(self, indptr, indices, features=None, labels=None,
            n_nodes=None):
        n_nodes = n_nodes if n_nodes is not None else len(indptr) - 1
        self._output = self.core.fit(indptr, indices, features, n_nodes,
                                     labels=labels)
        return self

    def generate_embeddings(self) -> np.ndarray:
        if self._output is None:
            raise RuntimeError("fit() before generate_embeddings()")
        return self._output

    def predict(self, nodes) -> np.ndarray:
        return self.core.predict(np.asarray(nodes))
