"""Fused on-device accuracy evaluation — no kNN materialization.

The reference evaluates by precomputing a [N, 1000] kNN cache and scanning
it per test pair (eval.py:112-143, 227-250).  When only accuracy numbers
are needed, the cache is unnecessary: the rank of pair (q, pos) among all
candidates is

    rank = 1 + #{ j != q : sim(q, j) > sim(q, pos) }

which is one matmul row + one comparison per pair — fully fused on device,
O(B*N) with nothing but scalar counts returned to the host.  Semantics
match the reference's metrics: hit@K = rank <= K, MRR uses rank with the
miss-as-rank-K fallback (eval.py:248-249).

Ties use AVERAGE rank (rank = 1 + #better + #tied/2): the reference's
topk order resolves ties arbitrarily (≈ average over orders), and a
tie-OPTIMISTIC rank (`> pos` only) materially inflates models whose
embedding tables contain duplicate rows — measured: ALS factors on the
hard benchmark hold only ~60% unique rows (cold items with identical
co-occurrence rows collapse to identical factors; some queries tie with
100s of items), which inflated ALS MRR 2.4x vs the list-based harness.
Continuous learned embeddings (PinSage) have no exact ties and are
unaffected.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gcn_song_embeddings_tpu.utils.pipeline import lagged


@partial(jax.jit, static_argnames=("batch", "n_blocks"))
def _rank_blocks(unit_emb: jnp.ndarray, q: jnp.ndarray, pos: jnp.ndarray,
                 batch: int, n_blocks: int) -> jnp.ndarray:
    """`n_blocks` consecutive [batch]-pair rank blocks in ONE dispatch
    (lax.scan over _rank_block) — amortizes tunnel latency."""
    def block(_, i):
        s = i * batch
        return None, _rank_block(
            unit_emb, jax.lax.dynamic_slice_in_dim(q, s, batch),
            jax.lax.dynamic_slice_in_dim(pos, s, batch))

    _, out = jax.lax.scan(block, None,
                          jnp.arange(n_blocks, dtype=jnp.int32))
    return out.reshape(n_blocks * batch)


@partial(jax.jit, static_argnames=("chunk",))
def _rank_block(unit_emb: jnp.ndarray, q: jnp.ndarray, pos: jnp.ndarray,
                chunk: int = 65536) -> jnp.ndarray:
    """1-based rank of `pos` among all non-self candidates of `q`.

    unit_emb: [N, d] L2-normalized rows; q/pos: [B] int32.  The catalog is
    consumed in [chunk, d] tiles under lax.scan so peak memory is
    O(B * chunk) — million-track catalogs never materialize a [B, N]
    similarity block.
    """
    n = unit_emb.shape[0]
    qv = unit_emb[q]                                     # [B, d]
    pos_sim = jnp.sum(qv * unit_emb[pos], axis=1)        # [B]
    # Tie tolerance: pos_sim above is an elementwise reduction while the
    # candidate sims come from the HIGHEST-precision matmul — the two can
    # disagree by ~1 ulp, which would break EXACT-equality tie detection
    # for duplicate rows (the very case average-rank exists for).  A few
    # f32 ulps of slack (1e-6 on cosine scale) classifies those as ties
    # while staying ~100x below the smallest real separations the
    # precision analysis cares about (~1e-4 for tiny-margin embeddings —
    # RESULTS.md "Matmul precision").
    tie_eps = 1e-6
    n_pad = ((n + chunk - 1) // chunk) * chunk
    emb_pad = jnp.pad(unit_emb, ((0, n_pad - n), (0, 0)))

    def tile(acc, start):
        rows = jax.lax.dynamic_slice_in_dim(emb_pad, start, chunk, axis=0)
        # f32-accurate passes: rank comparisons against pos_sim live at
        # ~1e-4 cosine scale for tiny-margin-trained embeddings (see
        # ops/knn.py precision note / RESULTS.md "Matmul precision").
        sims = jnp.dot(qv, rows.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        idx = start + jnp.arange(chunk)
        valid = (idx[None, :] < n) & (idx[None, :] != q[:, None])
        better = (sims > pos_sim[:, None] + tie_eps) & valid
        # ties (excluding the positive itself) count half — average rank
        tied = (jnp.abs(sims - pos_sim[:, None]) <= tie_eps) & valid & \
            (idx[None, :] != pos[:, None])
        return (acc + 2 * jnp.sum(better, axis=1)
                + jnp.sum(tied, axis=1)), None

    # acc accumulates in half-rank units (2*better + tied) so the scan
    # carry stays integer; final rank = 1 + acc/2 EXACTLY (float32 —
    # flooring the half-rank made odd-sized tie blocks 0.5 rank
    # optimistic at hit@K boundaries, advisor round 4).  f32 is exact
    # here up to acc = 2^24, i.e. 8M-item catalogs.
    acc, _ = jax.lax.scan(tile, jnp.zeros(q.shape[0], jnp.int32),
                          jnp.arange(0, n_pad, chunk))
    return 1.0 + acc.astype(jnp.float32) * 0.5


def rank_eval(embeddings: np.ndarray, test_pairs: np.ndarray,
              hit_ks: tuple[int, ...] = (10, 100, 500),
              mrr_k: int = 1000, batch: int = 2048) -> dict[str, float]:
    """Hit-rate@K and MRR@mrr_k for (query, positive) pairs, evaluated
    against the full catalog directly from the embedding matrix."""
    emb = np.asarray(embeddings, dtype=np.float32)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    unit = jnp.asarray(emb / np.maximum(norms, 1e-12))
    pairs = np.asarray(test_pairs, dtype=np.int32)
    n = pairs.shape[0]

    ranks = np.empty(n, dtype=np.float64)

    # `blocks_per_call` pair-blocks scanned per dispatch (the per-dispatch
    # tunnel round-trip otherwise dominates at 10^5+ pairs — same
    # structure as the PPR sweep), drained one dispatch late.
    blocks_per_call = max(min(8, -(-n // batch)), 1)
    stride = batch * blocks_per_call

    def dispatch(start: int):
        stop = min(start + stride, n)
        blk = np.zeros((stride, 2), dtype=np.int32)
        blk[: stop - start] = pairs[start:stop]
        r = _rank_blocks(unit, jnp.asarray(blk[:, 0]),
                         jnp.asarray(blk[:, 1]), batch, blocks_per_call)
        return start, stop, r

    # One-deep pipeline: copy-out of block i behind block i+1's compute.
    for start, stop, r in lagged(dispatch(s) for s in range(0, n, stride)):
        ranks[start:stop] = np.asarray(r)[: stop - start]

    out = {f"hit@{k}": float((ranks <= k).mean()) for k in hit_ks}
    capped = np.minimum(ranks, mrr_k)  # miss counts as rank K
    out[f"mrr@{mrr_k}"] = float((1.0 / capped).mean())
    return out
