"""Unit tests for the packed-gather primitives.

These back the kernel-latency optimizations: one [N, 2T] int32 row gather
per conv level (models.pinsage.pack_nbhds) and one [N, 2] extent gather per
walk direction (ops.walks.walk_tables).  Packing is a pure bitcast/layout
transform, so roundtrips must be EXACT.
"""

import jax.numpy as jnp
import numpy as np

from gcn_song_embeddings_tpu.models.pinsage import (
    pack_nbhds,
    packed_nbhd_gather,
    unpack_nbhd_rows,
)
from gcn_song_embeddings_tpu.ops.walks import walk_tables


def test_pack_unpack_roundtrip_exact():
    rng = np.random.default_rng(0)
    N, T_store, T = 64, 10, 3
    w = rng.random((N, T_store)).astype(np.float32)
    w[3, 0] = 0.0          # zeros survive the bitcast
    w[5, 1] = 1e-38        # subnormal-adjacent values survive too
    n = rng.integers(0, 2**30, (N, T_store)).astype(np.int32)

    packed = pack_nbhds(jnp.asarray(w), jnp.asarray(n), T)
    assert packed.shape == (N, 2 * T) and packed.dtype == jnp.int32

    got_w, got_n = unpack_nbhd_rows(packed, T)
    np.testing.assert_array_equal(np.asarray(got_w), w[:, :T])
    np.testing.assert_array_equal(np.asarray(got_n), n[:, :T])


def test_packed_gather_matches_direct_indexing():
    rng = np.random.default_rng(1)
    N, T = 40, 5
    w = rng.random((N, T)).astype(np.float32)
    n = rng.integers(0, N, (N, T)).astype(np.int32)
    ids = jnp.asarray(rng.integers(0, N, 17).astype(np.int32))

    gather = packed_nbhd_gather(pack_nbhds(jnp.asarray(w), jnp.asarray(n), T),
                                T)
    got_w, got_n = gather(ids)
    np.testing.assert_array_equal(np.asarray(got_w), w[np.asarray(ids)])
    np.testing.assert_array_equal(np.asarray(got_n), n[np.asarray(ids)])


def test_walk_tables_extents(device_graph):
    i2c, c2i = walk_tables(device_graph)
    for packed, indptr in ((i2c, device_graph.i2c_indptr),
                           (c2i, device_graph.c2i_indptr)):
        ip = np.asarray(indptr)
        got = np.asarray(packed)
        np.testing.assert_array_equal(got[:, 0], ip[:-1])
        np.testing.assert_array_equal(got[:, 1], np.diff(ip))
