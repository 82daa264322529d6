"""Tiled cosine-similarity top-k on device.

Reference `knn_from_emb` (baselines.py:91-103): batched dense cosine
similarity (a @ b^T / (|a||b| + eps)) + topk(k+1), dropping column 0 (self).
Here each query tile is one fused XLA program: an MXU matmul over the full
embedding table + `lax.top_k` — the [B, N] similarity block never leaves
the device, and only the [B, k] results are copied back.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k",))
def cosine_topk_block(emb: jnp.ndarray, queries: jnp.ndarray, k: int
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-(k+1) cosine neighbors for a block of query ids, self-dropped.

    emb: [N, d]; queries: [B] int32.  Returns (weights [B, k], nodes [B, k]).
    """
    q = emb[queries]
    dot = jnp.dot(q, emb.T, preferred_element_type=jnp.float32)
    q_len = jnp.linalg.norm(q, axis=1, keepdims=True)
    e_len = jnp.linalg.norm(emb, axis=1)[None, :]
    sim = dot / (q_len * e_len + 1e-16)
    w, n = jax.lax.top_k(sim, k + 1)
    # reference drops column 0 as "self" (baselines.py:99-101)
    return w[:, 1:], n[:, 1:]


def knn_from_emb(emb, queries=None, k: int = 1000, batch_size: int = 512
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Full kNN sweep over `queries` (default: all rows) in device tiles.

    Returns numpy (weights [Nq, k], nodes [Nq, k]) like the reference's
    (knn_w, knn_n) tuples.
    """
    emb = jnp.asarray(emb, dtype=jnp.float32)
    n = emb.shape[0]
    if queries is None:
        queries = np.arange(n, dtype=np.int32)
    queries = np.asarray(queries, dtype=np.int32)
    nq = queries.shape[0]
    k = min(k, n - 1)

    w_out = np.empty((nq, k), dtype=np.float32)
    n_out = np.empty((nq, k), dtype=np.int32)
    for start in range(0, nq, batch_size):
        stop = min(start + batch_size, nq)
        block = np.full((batch_size,), queries[stop - 1], dtype=np.int32)
        block[: stop - start] = queries[start:stop]
        w, nn = cosine_topk_block(emb, jnp.asarray(block), k)
        w_out[start:stop] = np.asarray(w)[: stop - start]
        n_out[start:stop] = np.asarray(nn)[: stop - start]
    return w_out, n_out
