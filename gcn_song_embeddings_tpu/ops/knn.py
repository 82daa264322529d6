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
from jax import lax

from gcn_song_embeddings_tpu.utils.pipeline import lagged


@partial(jax.jit, static_argnames=("k",))
def cosine_topk_block(emb: jnp.ndarray, queries: jnp.ndarray, k: int
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-(k+1) cosine neighbors for a block of query ids, self-dropped.

    emb: [N, d]; queries: [B] int32.  Returns (weights [B, k], nodes [B, k]).
    """
    q = emb[queries]
    # Precision note (measured on v5e, RESULTS.md "Matmul precision"):
    # similarity RANKING must be f32-accurate.  Embeddings trained at the
    # reference's tiny margin separate by ~1e-4 cosine; a single-pass-bf16
    # MXU matmul (JAX's TPU default for f32 inputs) rounds those ties away
    # and hit@100 collapses 0.995 -> 0.13.  HIGHEST = f32-accurate passes.
    dot = jnp.dot(q, emb.T, preferred_element_type=jnp.float32,
                  precision=lax.Precision.HIGHEST)
    q_len = jnp.linalg.norm(q, axis=1, keepdims=True)
    e_len = jnp.linalg.norm(emb, axis=1)[None, :]
    sim = dot / (q_len * e_len + 1e-16)
    w, n = jax.lax.top_k(sim, k + 1)
    # reference drops column 0 as "self" (baselines.py:99-101)
    return w[:, 1:], n[:, 1:]


@partial(jax.jit, static_argnames=("k", "chunk"))
def cosine_topk_streamed(emb: jnp.ndarray, queries: jnp.ndarray, k: int,
                         chunk: int = 8192
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-(k+1) cosine neighbors with the table streamed in chunks.

    For catalog sizes where the [B, N] similarity block would blow HBM
    (dataset_large scale: N ~ 10^6, B*N f32 = GBs), the table is consumed
    in [chunk, d] tiles under `lax.scan`, keeping a running [B, k+1] top-k
    that is merged with each tile's local top-k (concat + lax.top_k).
    Peak memory is O(B * (chunk + 2k)) regardless of N.
    """
    n, d = emb.shape
    kk = k + 1
    n_pad = ((n + chunk - 1) // chunk) * chunk
    q = emb[queries]
    q_len = jnp.linalg.norm(q, axis=1, keepdims=True)
    e_len = jnp.linalg.norm(emb, axis=1)
    emb_pad = jnp.pad(emb, ((0, n_pad - n), (0, 0)))
    e_len_pad = jnp.pad(e_len, (0, n_pad - n))

    def tile(carry, start):
        best_w, best_n = carry
        rows = lax.dynamic_slice_in_dim(emb_pad, start, chunk, axis=0)
        lens = lax.dynamic_slice_in_dim(e_len_pad, start, chunk, axis=0)
        sim = jnp.dot(q, rows.T, preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST)
        sim = sim / (q_len * lens[None, :] + 1e-16)
        valid = (start + jnp.arange(chunk)) < n
        sim = jnp.where(valid[None, :], sim, -jnp.inf)
        w, idx = lax.top_k(sim, min(kk, chunk))
        cand_w = jnp.concatenate([best_w, w], axis=1)
        cand_n = jnp.concatenate([best_n, idx + start], axis=1)
        new_w, pos = lax.top_k(cand_w, kk)
        new_n = jnp.take_along_axis(cand_n, pos, axis=1)
        return (new_w, new_n), None

    init = (jnp.full((q.shape[0], kk), -jnp.inf),
            jnp.zeros((q.shape[0], kk), dtype=jnp.int32))
    starts = jnp.arange(0, n_pad, chunk)
    (w, nn), _ = lax.scan(tile, init, starts)
    return w[:, 1:], nn[:, 1:]


def knn_from_emb(emb, queries=None, k: int = 1000,
                 batch_size: int | None = None,
                 streamed: bool | None = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Full kNN sweep over `queries` (default: all rows) in device tiles.

    `streamed=None` auto-selects: for catalogs past ~10^5 rows the
    streamed kernel (chunked table scan, O(B*(chunk+k)) memory) replaces
    the dense [B, N] block.  Returns numpy (weights [Nq, k],
    nodes [Nq, k]) like the reference's (knn_w, knn_n) tuples.
    """
    emb = jnp.asarray(emb, dtype=jnp.float32)
    n = emb.shape[0]
    if queries is None:
        queries = np.arange(n, dtype=np.int32)
    queries = np.asarray(queries, dtype=np.int32)
    nq = queries.shape[0]
    k = min(k, n - 1)
    if streamed is None:
        streamed = n > 100_000
    if batch_size is None:
        # streamed tiles are dispatch-latency-bound: use big query blocks
        batch_size = 2048 if streamed else 512

    w_out = np.empty((nq, k), dtype=np.float32)
    n_out = np.empty((nq, k), dtype=np.int32)

    def dispatch(start: int):
        stop = min(start + batch_size, nq)
        block = np.full((batch_size,), queries[stop - 1], dtype=np.int32)
        block[: stop - start] = queries[start:stop]
        kern = cosine_topk_streamed if streamed else cosine_topk_block
        w, nn = kern(emb, jnp.asarray(block), k)
        return start, stop, w, nn

    # One-deep pipeline: block i's host copy-out rides behind block i+1's
    # device compute (utils/pipeline.py).
    for start, stop, w, nn in lagged(
            dispatch(s) for s in range(0, nq, batch_size)):
        w_out[start:stop] = np.asarray(w)[: stop - start]
        n_out[start:stop] = np.asarray(nn)[: stop - start]
    return w_out, n_out
