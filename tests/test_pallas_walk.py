"""Pallas fused walk kernel: bit-identical chain vs the XLA walker.

Runs in interpret mode on the CPU test platform.  Both variants consume
`jax.random.uniform(key, (hops, B, 3))` with byte-for-byte identical slot
arithmetic, so under the same key the traces must match EXACTLY — any
drift in the kernel's scalar pipeline (slot reuse race, stale state,
wrong wait order) shows up as a hard mismatch, not tolerance noise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gcn_song_embeddings_tpu.data.device import DeviceGraph
from gcn_song_embeddings_tpu.ops.pallas_walk import (
    pallas_walks_from_fused_tables,
)
from gcn_song_embeddings_tpu.ops.walks import (
    fused_walk_tables,
    walks_from_fused_tables,
)


def _graph(n_items=120, n_cols=30, deg=4, seed=0):
    rng = np.random.default_rng(seed)
    cols = rng.integers(0, n_cols, (n_items, deg))
    i2c_indptr = np.arange(n_items + 1, dtype=np.int32) * deg
    src = np.repeat(np.arange(n_items, dtype=np.int32), deg)
    flat = cols.reshape(-1)
    order = np.lexsort((src, flat))
    c2i_indptr = np.zeros(n_cols + 1, dtype=np.int64)
    np.cumsum(np.bincount(flat, minlength=n_cols), out=c2i_indptr[1:])
    return DeviceGraph.from_arrays(i2c_indptr, flat,
                                   c2i_indptr.astype(np.int32), src[order])


def test_pallas_walk_bit_identical_to_xla():
    dg = _graph()
    tables = fused_walk_tables(dg)
    nodeset = jnp.arange(24, dtype=jnp.int32)
    key = jax.random.PRNGKey(7)
    ref = walks_from_fused_tables(tables, nodeset, 40, 0.85, key)
    got = pallas_walks_from_fused_tables(tables, nodeset, 40, 0.85, key,
                                         interpret=True)
    assert got.shape == ref.shape == (24, 40)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_walk_low_alpha_and_odd_batch():
    # alpha=0 never restarts -> every hop exercises the gather2 state path;
    # B not a multiple of the pipeline depth exercises the drain ticks
    dg = _graph(n_items=64, n_cols=16, deg=3, seed=3)
    tables = fused_walk_tables(dg)
    nodeset = jnp.asarray([5, 0, 63, 17, 17, 2, 31], dtype=jnp.int32)
    key = jax.random.PRNGKey(11)
    ref = walks_from_fused_tables(tables, nodeset, 25, 0.0, key)
    got = pallas_walks_from_fused_tables(tables, nodeset, 25, 0.0, key,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
