"""Device-side merge of two ranked top-k lists (walk head + embedding tail).

The WalkEmbedHybrid ranker (models/baselines/simple.py) concatenates the
walk's nonzero-visit neighbors with the embedding-cosine ranking, dropping
duplicates.  The round-4 implementation did this with a per-row Python loop
over sets — 40.9 s for 20k queries at k=1000, ~9 min at the 1M capstone —
on an otherwise device-resident pipeline.  This module is the TPU-native
replacement: a fully static-shape sort-based dedup + stable re-rank that
XLA compiles to three [B, k1+k2] multi-operand sorts, so merging rides the
same dispatch as the walk/embedding top-k kernels and serving can rank the
hybrid on device (serve.py HybridIndex).

Merge contract (shared with the `merge_ranked_lists` numpy oracle, which
the CI test pins this kernel against):

  * output width k = max(head_k, tail_k);
  * each output row starts with the head entries whose weight is > 0, in
    head order, with their weights shifted above every tail weight (so a
    downstream re-sort by weight preserves the merged ORDER — scores are
    ordinal, like the reference's PPR visit probabilities
    (/root/reference/baselines.py:140-151));
  * the row is completed by tail entries whose node is not already placed,
    in tail order, at their own weights;
  * if fewer than k entries exist (tiny catalogs), the remainder repeats
    the last placed node at weight -inf.

Within-list node ids must be distinct per row (true for any top-k list);
across lists duplicates are resolved in the head's favor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def merge_topk(head_w: jnp.ndarray, head_n: jnp.ndarray,
               tail_w: jnp.ndarray, tail_n: jnp.ndarray
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Merge [B, k1] head lists with [B, k2] tail lists on device.

    Returns (weights [B, max(k1,k2)] float32, nodes [B, max(k1,k2)] int32)
    ranked per the module contract.  Everything is static-shape: one
    2-key sort groups duplicate nodes (keeping the best priority = head
    position, tail position + k1, or DROPPED for zero-weight head
    entries), one 1-key stable sort restores merge order.
    """
    B, k1 = head_n.shape
    k2 = tail_n.shape[1]
    k = max(k1, k2)
    dropped = jnp.int32(k1 + k2)          # priority sentinel: sorts last

    head_valid = head_w > 0
    pri_head = jnp.where(head_valid,
                         lax.broadcasted_iota(jnp.int32, (B, k1), 1),
                         dropped)
    pri_tail = lax.broadcasted_iota(jnp.int32, (B, k2), 1) + k1

    # head scores shifted above every tail score (global max, matching the
    # oracle) so re-sorting by weight preserves merge order
    shift = (jnp.max(jnp.abs(tail_w)) + 1.0) if tail_w.size else 1.0

    nodes = jnp.concatenate([head_n, tail_n], axis=1).astype(jnp.int32)
    pris = jnp.concatenate([pri_head, pri_tail], axis=1)
    weights = jnp.concatenate([head_w + shift, tail_w],
                              axis=1).astype(jnp.float32)

    # group duplicates: sort by (node, priority); the first slot of each
    # node-run carries the winning occurrence (head beats tail, valid
    # beats dropped)
    n_s, p_s, w_s = lax.sort((nodes, pris, weights), dimension=1,
                             num_keys=2, is_stable=True)
    is_first = jnp.concatenate(
        [jnp.ones((B, 1), dtype=bool), n_s[:, 1:] != n_s[:, :-1]], axis=1)
    keep = is_first & (p_s < dropped)
    p2 = jnp.where(keep, p_s, dropped)
    w2 = jnp.where(keep, w_s, -jnp.inf)

    # restore merge order: kept entries sort by priority (head positions
    # first, then tail positions), dropped ones sink to the tail
    _, n3, w3 = lax.sort((p2, n_s, w2), dimension=1, num_keys=1,
                         is_stable=True)

    # fill semantics: slots past the kept count repeat the last kept node
    # at -inf (already -inf in w3); kept >= 1 whenever any input is valid
    kept = jnp.sum(keep, axis=1)
    last = jnp.take_along_axis(
        n3, jnp.maximum(kept - 1, 0)[:, None], axis=1)
    idx = lax.broadcasted_iota(jnp.int32, n3.shape, 1)
    out_n = jnp.where(idx < kept[:, None], n3, last)
    return w3[:, :k], out_n[:, :k]
