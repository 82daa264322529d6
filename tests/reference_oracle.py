"""NumPy oracle of the reference model math, used for activation-parity tests.

This is an independent reimplementation of the equations in reference
pinsage_model.py:171-265 and pinsage_training.py:31-49 (NOT a copy of its
torch code): given identical weights and neighborhoods it must produce the
same per-layer activations as the TPU model — the BASELINE.json north-star
"match the reference pinsage_model.py per-layer activations (allclose)".

The oracle implements the reference's literal algorithm, including the
full-graph h buffer with `put_embeddings` zero-padding semantics
(pinsage_model.py:24-30) and dynamic `unique` frontiers
(pinsage_model.py:156-168), so the test also proves our dedup-free static
frontier expansion is equivalent to the reference's dynamic-dedup nodeflow.
"""

from __future__ import annotations

import numpy as np


def leaky_relu(x: np.ndarray, slope: float = 0.01) -> np.ndarray:
    return np.where(x >= 0, x, slope * x)


def conv_forward(params, h: np.ndarray, nodeset: np.ndarray,
                 nb_nodes: np.ndarray, nb_weights: np.ndarray,
                 in_dim: int) -> np.ndarray:
    """Reference ConvLayer.forward (pinsage_model.py:189-212)."""
    Wq, bq, Ww, bw = params
    n_nodes, T = nb_nodes.shape
    nodeset_h = h[nodeset, :in_dim]
    neighbor_h = h[nb_nodes.reshape(-1), :in_dim].reshape(n_nodes, T, in_dim)
    q = leaky_relu(neighbor_h @ Wq.T + bq)
    agg = (nb_weights[:, :, None] * q).sum(1) / nb_weights.sum(
        1, keepdims=True)
    concat = np.concatenate([nodeset_h, agg], axis=1)
    new_h = leaky_relu(concat @ Ww.T + bw)
    return new_h / np.linalg.norm(new_h, axis=1, keepdims=True)


def put_embeddings(h: np.ndarray, nodeset: np.ndarray,
                   new_vals: np.ndarray) -> np.ndarray:
    """Reference put_embeddings (pinsage_model.py:24-30): write new values
    into the first columns of a full-width buffer, zero-padding the rest."""
    out = h.copy()
    pad = np.zeros((new_vals.shape[0], h.shape[1] - new_vals.shape[1]),
                   dtype=h.dtype)
    out[nodeset, :] = np.concatenate([new_vals, pad], axis=1)
    return out


def nodeflow(nodeset: np.ndarray, n_layers: int, T: int,
             nbhd_weights: np.ndarray, nbhd_nodes: np.ndarray):
    """Reference relevant_nodes_per_layer_precomp (pinsage_model.py:156-168):
    dynamic frontiers with sorted-unique dedup."""
    S = []
    cur = nodeset
    for _ in range(n_layers):
        nb_w = nbhd_weights[cur, :T]
        nb_n = nbhd_nodes[cur, :T]
        S.insert(0, (cur, nb_w, nb_n))
        cur = np.unique(np.concatenate([nb_n.reshape(-1), cur]))
    return S


def pinsage_forward_oracle(layer_params: list, g1, g2, features: np.ndarray,
                           nbhd_weights: np.ndarray, nbhd_nodes: np.ndarray,
                           nodeset: np.ndarray, n_layers: int, T: int,
                           out_dim: int) -> np.ndarray:
    """Reference PinSageModel.forward (pinsage_model.py:246-265)."""
    G1_w, G1_b = g1
    G2_w = g2
    in_dims = [features.shape[1]] + [out_dim] * (n_layers - 1)
    S = nodeflow(nodeset, n_layers, T, nbhd_weights, nbhd_nodes)
    h = features.astype(np.float64)
    new_vals = None
    ns = None
    for i, (ns, nb_w, nb_n) in enumerate(S):
        new_vals = conv_forward(layer_params[i], h, ns, nb_n, nb_w,
                                in_dims[i])
        h = put_embeddings(h, ns, new_vals)
    head = leaky_relu(new_vals @ G1_w.T + G1_b) @ G2_w.T
    h = put_embeddings(h, ns, head)
    return h[nodeset, :out_dim]


def max_margin_loss_oracle(h_q, h_pos, h_neg, margin):
    """Reference max_margin_loss (pinsage_training.py:31-41)."""
    def norm(x):
        n = np.linalg.norm(x, axis=1, keepdims=True)
        return x / np.maximum(n, 1e-12)

    q, p, ng = norm(h_q), norm(h_pos), norm(h_neg)
    dot = (q * ng).sum(1) - (q * p).sum(1) + margin
    return np.maximum(dot, 0).mean()
