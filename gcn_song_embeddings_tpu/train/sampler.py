"""Device-side triple batch sampling.

Reference batch construction (pinsage_training.py:53-97): sample B positive
pairs without replacement within the batch (`randperm[:B]`), then attach one
negative per pair — "easy" (uniform node outside the batch) or "hard"
(a PPR neighbor of the query at a uniform rank in [hn_min, hn_max)).

All sampling here runs on device with threefry keys inside the jitted train
step — no host round-trips (the reference samples on the host each batch).
Easy negatives use two rejection rounds instead of the reference's exact
masked permutation (which needs dynamic shapes): after two uniform redraws the
probability that a negative still collides with a batch node is
(3B/N)^3 ~ 1e-5 for the reference shapes, and a collision only weakens one
triple, so this is statistically equivalent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def sample_positive_rows(key: jax.Array, positives: jnp.ndarray,
                         batch_size: int, exact: bool = False
                         ) -> jnp.ndarray:
    """B positive pairs.

    exact=True reproduces the reference's within-batch
    sampling-without-replacement (`randperm[:B]`, pinsage_training.py:53-62)
    via a full permutation — an O(n_pos log n_pos) sort per batch.  The
    default samples rows i.i.d. (the reference itself samples "with
    repetition" across batches); for B << n_pos the duplicate probability
    is ~B^2/2n and the train step is ~30% faster.
    """
    n_pos = positives.shape[0]
    if exact:
        rows = jax.random.permutation(key, n_pos)[:batch_size]
    else:
        rows = jax.random.randint(key, (batch_size,), 0, n_pos)
    return positives[rows].astype(jnp.int32)


def sample_easy_negatives(key: jax.Array, pos_batch: jnp.ndarray,
                          n_items: int) -> jnp.ndarray:
    """One uniform negative per pair, avoiding batch nodes
    (reference sample_easy_negatives, pinsage_training.py:64-77)."""
    b = pos_batch.shape[0]
    batch_nodes = pos_batch.reshape(-1)  # [2B]

    def in_batch(cand):
        return jnp.any(cand[:, None] == batch_nodes[None, :], axis=1)

    k1, k2, k3 = jax.random.split(key, 3)
    neg = jax.random.randint(k1, (b,), 0, n_items)
    for k in (k2, k3):  # two rejection rounds
        redraw = jax.random.randint(k, (b,), 0, n_items)
        neg = jnp.where(in_batch(neg), redraw, neg)
    return neg.astype(jnp.int32)


def sample_hard_negatives(key: jax.Array, pos_batch: jnp.ndarray,
                          nbhd_nodes: jnp.ndarray, hn_min: int,
                          hn_max: int) -> jnp.ndarray:
    """One PPR-rank hard negative per pair (reference sample_hard_negatives,
    pinsage_training.py:79-87): neighbor of the query at uniform rank in
    [hn_min, hn_max).  Requires t_precompute >= hn_max (SURVEY §7b.6)."""
    b = pos_batch.shape[0]
    queries = pos_batch[:, 0]
    ranks = jax.random.randint(key, (b,), hn_min, hn_max)
    return nbhd_nodes[queries, ranks].astype(jnp.int32)


@partial(jax.jit, static_argnames=("batch_size", "n_items", "hard_negatives",
                                   "hn_min", "hn_max", "exact"))
def sample_batch(key: jax.Array, positives: jnp.ndarray,
                 nbhd_nodes: jnp.ndarray, batch_size: int, n_items: int,
                 hard_negatives: bool = False, hn_min: int = 10,
                 hn_max: int = 100, exact: bool = False,
                 hn_gate: jax.Array | None = None) -> jnp.ndarray:
    """Sample a [B, 3] (query, positive, negative) batch
    (reference sample_batch, pinsage_training.py:89-97).

    `hn_gate` (traced scalar bool, only with hard_negatives=True) selects
    hard vs easy negatives PER BATCH inside one compiled step — the
    curriculum mechanism (train.hn_start_epoch): the trainer gates on the
    global step so one scanned chunk can cross the easy->hard boundary
    without recompiling.  The reference's capability is the static flag
    (pinsage_training.py:135-137); the curriculum is a TPU-era extension
    motivated by the measured schedule-dependence of hn (RESULTS.md)."""
    k_pos, k_neg = jax.random.split(key)
    pos_batch = sample_positive_rows(k_pos, positives, batch_size, exact)
    if hard_negatives:
        neg = sample_hard_negatives(k_neg, pos_batch, nbhd_nodes,
                                    hn_min, hn_max)
        if hn_gate is not None:
            easy = sample_easy_negatives(k_neg, pos_batch, n_items)
            neg = jnp.where(hn_gate, neg, easy)
    else:
        neg = sample_easy_negatives(k_neg, pos_batch, n_items)
    return jnp.concatenate([pos_batch, neg[:, None]], axis=1)
