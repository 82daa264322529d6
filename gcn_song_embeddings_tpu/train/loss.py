"""Loss functions and training diagnostics.

Numerics match the reference (pinsage_training.py:31-49, 99-103).
"""

from __future__ import annotations

import jax.numpy as jnp


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize equivalent (clamped norm)."""
    norm = jnp.linalg.norm(x, axis=1, keepdims=True)
    return x / jnp.maximum(norm, eps)


def max_margin_loss(h_q: jnp.ndarray, h_pos: jnp.ndarray, h_neg: jnp.ndarray,
                    margin: float) -> jnp.ndarray:
    """Max-margin triplet loss (reference max_margin_loss,
    pinsage_training.py:31-41): rows are L2-normalized, then
    mean(relu(q.neg - q.pos + margin))."""
    q = _l2_normalize(h_q)
    pos = _l2_normalize(h_pos)
    neg = _l2_normalize(h_neg)
    q_dot_pos = jnp.sum(q * pos, axis=1)
    q_dot_neg = jnp.sum(q * neg, axis=1)
    return jnp.mean(jnp.maximum(q_dot_neg - q_dot_pos + margin, 0.0))


def cosine_triplet_loss(a: jnp.ndarray, p: jnp.ndarray, n: jnp.ndarray,
                        margin: float = 1e-4) -> jnp.ndarray:
    """Diagnostic triplet loss with cosine dissimilarity
    (reference COSINE_TRIPLET_LOSS, pinsage_training.py:43-49):
    mean(relu(d(a,p) - d(a,n) + margin)), d = 1 - cos_sim.
    The reference feeds L2-normalized raw features (pinsage_training.py:200-205);
    callers should do the same."""
    def cos(x, y):
        nx = jnp.linalg.norm(x, axis=1)
        ny = jnp.linalg.norm(y, axis=1)
        return jnp.sum(x * y, axis=1) / jnp.maximum(nx * ny, 1e-8)

    d_ap = 1.0 - cos(a, p)
    d_an = 1.0 - cos(a, n)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))


def batch_variance(h: jnp.ndarray) -> jnp.ndarray:
    """Collapse monitor (reference batch_variance, pinsage_training.py:99-103):
    sum of squared deviations from the per-dim mean over the batch, / (B-1)."""
    mean = jnp.mean(h, axis=0)
    return jnp.sum((h - mean) ** 2) / (h.shape[0] - 1)
