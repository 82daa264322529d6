"""Statistical + exactness tests for the walk / PPR kernels.

The reference's walk loop is RNG-dependent, so parity is statistical
(SURVEY §8 hard part (f)): visit distributions must match a brute-force
simulation of the same Markov chain, and the counting/top-T path must be
EXACT against a numpy scatter-count oracle for fixed traces.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gcn_song_embeddings_tpu.ops.ppr import (
    precompute_neighborhoods,
    sample_neighborhood_topt,
    visit_counts_topt,
)
from gcn_song_embeddings_tpu.ops.walks import random_walks
from gcn_song_embeddings_tpu.config import WalkConfig


def test_visit_counts_topt_exact_vs_scatter_oracle():
    """Counting + normalization + self-zero + top-T must equal the dense
    scatter-add reference math (pinsage_model.py:88-107) exactly."""
    rng = np.random.default_rng(0)
    B, H, N, T = 16, 64, 40, 5
    trace = rng.integers(0, N, size=(B, H)).astype(np.int32)
    nodeset = rng.integers(0, N, size=(B,)).astype(np.int32)

    w, n = visit_counts_topt(jnp.asarray(trace), jnp.asarray(nodeset), T)
    w, n = np.asarray(w), np.asarray(n)

    # dense oracle
    counts = np.zeros((B, N))
    for i in range(B):
        np.add.at(counts[i], trace[i], 1.0)
    probs = counts / counts.sum(1, keepdims=True)
    probs[np.arange(B), nodeset] = 0.0

    for i in range(B):
        order = np.argsort(-probs[i], kind="stable")[:T]
        np.testing.assert_allclose(np.sort(w[i])[::-1],
                                   np.sort(probs[i][order])[::-1],
                                   atol=1e-6)
        # node sets must agree wherever weights are positive
        got = {int(n[i, j]) for j in range(T) if w[i, j] > 0}
        # ties at the cutoff weight can legitimately differ; compare weights
        want_w = np.sort(probs[i][order])[::-1]
        got_w = np.sort(w[i])[::-1]
        np.testing.assert_allclose(got_w, want_w, atol=1e-6)
        # every reported positive node really has that visit probability
        for j in range(T):
            if w[i, j] > 0:
                np.testing.assert_allclose(w[i, j], probs[i][n[i, j]],
                                           atol=1e-6)
        assert int(nodeset[i]) not in got


def test_walk_trace_shape_and_support(device_graph):
    key = jax.random.PRNGKey(0)
    nodeset = jnp.arange(32, dtype=jnp.int32)
    trace = random_walks(device_graph, nodeset, 50, 0.85, key)
    assert trace.shape == (32, 50)
    t = np.asarray(trace)
    assert t.min() >= 0 and t.max() < device_graph.n_items


def test_walk_distribution_matches_host_simulation(device_graph):
    """Visit distribution parity vs an independent numpy simulation of the
    same chain (item -> uniform collection -> uniform item, restart alpha
    AFTER each hop)."""
    n_hops, alpha = 2000, 0.85
    origin = 7

    # device kernel: many walkers from the same origin
    B = 64
    key = jax.random.PRNGKey(1)
    nodeset = jnp.full((B,), origin, dtype=jnp.int32)
    trace = np.asarray(random_walks(device_graph, nodeset, n_hops, alpha, key))
    counts_dev = np.bincount(trace.reshape(-1),
                             minlength=device_graph.n_items).astype(float)
    p_dev = counts_dev / counts_dev.sum()

    # host simulation
    rng = np.random.default_rng(2)
    i2c_ptr = np.asarray(device_graph.i2c_indptr)
    i2c_idx = np.asarray(device_graph.i2c_indices)
    c2i_ptr = np.asarray(device_graph.c2i_indptr)
    c2i_idx = np.asarray(device_graph.c2i_indices)
    counts_host = np.zeros(device_graph.n_items)
    cur = origin
    for _ in range(n_hops * B):
        s, e = i2c_ptr[cur], i2c_ptr[cur + 1]
        col = i2c_idx[rng.integers(s, e)]
        s, e = c2i_ptr[col], c2i_ptr[col + 1]
        cur = c2i_idx[rng.integers(s, e)]
        counts_host[cur] += 1
        if rng.random() < alpha:
            cur = origin
    p_host = counts_host / counts_host.sum()

    # compare top-visited mass: total variation distance must be small
    tv = 0.5 * np.abs(p_dev - p_host).sum()
    assert tv < 0.05, f"total variation {tv} too large"


def test_restart_rate(device_graph):
    """alpha is the restart probability AFTER each hop (SURVEY §7b.1):
    with alpha=1 every hop starts from the origin, so the trace support is
    exactly the origin's 2-hop neighborhood."""
    origin = 11
    key = jax.random.PRNGKey(3)
    nodeset = jnp.full((8,), origin, dtype=jnp.int32)
    trace = np.asarray(random_walks(device_graph, nodeset, 200, 1.0, key))

    i2c_ptr = np.asarray(device_graph.i2c_indptr)
    i2c_idx = np.asarray(device_graph.i2c_indices)
    c2i_ptr = np.asarray(device_graph.c2i_indptr)
    c2i_idx = np.asarray(device_graph.c2i_indices)
    two_hop = set()
    for c in i2c_idx[i2c_ptr[origin]:i2c_ptr[origin + 1]]:
        two_hop.update(c2i_idx[c2i_ptr[c]:c2i_ptr[c + 1]].tolist())
    assert set(np.unique(trace).tolist()) <= two_hop


def test_sample_neighborhood_topt_properties(device_graph):
    key = jax.random.PRNGKey(4)
    nodeset = jnp.arange(16, dtype=jnp.int32)
    w, n = sample_neighborhood_topt(device_graph, nodeset, 300, 0.85, 10, key)
    w, n = np.asarray(w), np.asarray(n)
    assert w.shape == (16, 10)
    # descending weights, self excluded, probabilities in [0, 1]
    assert (np.diff(w, axis=1) <= 1e-7).all()
    assert (w >= 0).all() and (w <= 1).all()
    for i in range(16):
        pos = w[i] > 0
        assert i not in set(n[i][pos].tolist())


def test_precompute_cache_roundtrip(device_graph, tmp_path):
    cfg = WalkConfig(n_hops=100, t_precompute=8, batch_walkers=256)
    path = str(tmp_path / "nbhds.npz")
    w1, n1 = precompute_neighborhoods(device_graph, cfg, path, seed=0)
    assert w1.shape == (device_graph.n_items, 8)
    # second call loads the artifact (shape-validated reload,
    # pinsage_model.py:113-116)
    w2, n2 = precompute_neighborhoods(device_graph, cfg, path, seed=99)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(n1, n2)


def test_precompute_cache_invalidated_by_walk_params(device_graph, tmp_path):
    """Changing alpha or n_hops must invalidate the artifact (the reference
    only shape-checks and silently serves stale neighborhoods)."""
    path = str(tmp_path / "nb.npz")
    cfg1 = WalkConfig(n_hops=100, t_precompute=8, batch_walkers=256,
                      alpha=0.85)
    w1, _ = precompute_neighborhoods(device_graph, cfg1, path, seed=0)
    cfg2 = WalkConfig(n_hops=100, t_precompute=8, batch_walkers=256,
                      alpha=0.5)
    w2, _ = precompute_neighborhoods(device_graph, cfg2, path, seed=0)
    assert not np.array_equal(w1, w2)  # recomputed under new alpha
    # and the artifact now caches the new params
    w3, _ = precompute_neighborhoods(device_graph, cfg2, path, seed=7)
    np.testing.assert_array_equal(w2, w3)


def test_parallel_chains_shape_support_and_divisibility(device_graph):
    """n_chains splits each origin's hop budget into lockstep chains:
    same [B, n_hops] trace contract, same id support; non-divisors error
    at the kernel level and degrade gracefully via effective_chains."""
    import pytest

    from gcn_song_embeddings_tpu.ops.ppr import effective_chains

    key = jax.random.PRNGKey(11)
    nodeset = jnp.arange(16, dtype=jnp.int32)
    trace = random_walks(device_graph, nodeset, 60, 0.85, key, n_chains=12)
    assert trace.shape == (16, 60)
    t = np.asarray(trace)
    assert t.min() >= 0 and t.max() < device_graph.n_items

    with pytest.raises(ValueError, match="divide"):
        random_walks(device_graph, nodeset, 50, 0.85, key, n_chains=7)

    assert effective_chains(500, 20) == 20
    assert effective_chains(500, 24) == 20   # largest divisor <= request
    assert effective_chains(513, 20) == 19
    assert effective_chains(7, 1) == 1
    assert effective_chains(100, 1000) == 100


def test_parallel_chains_restart_support(device_graph):
    """alpha=1 forces every hop from the origin regardless of chain
    splitting: trace support stays within the origin's 2-hop set."""
    origin = 11
    key = jax.random.PRNGKey(12)
    nodeset = jnp.full((8,), origin, dtype=jnp.int32)
    trace = np.asarray(random_walks(device_graph, nodeset, 200, 1.0, key,
                                    n_chains=10))
    i2c_ptr = np.asarray(device_graph.i2c_indptr)
    i2c_idx = np.asarray(device_graph.i2c_indices)
    c2i_ptr = np.asarray(device_graph.c2i_indptr)
    c2i_idx = np.asarray(device_graph.c2i_indices)
    two_hop = set()
    for c in i2c_idx[i2c_ptr[origin]:i2c_ptr[origin + 1]]:
        two_hop.update(c2i_idx[c2i_ptr[c]:c2i_ptr[c + 1]].tolist())
    assert set(np.unique(trace).tolist()) <= two_hop


def test_parallel_chains_distribution_matches_single_chain(device_graph):
    """The chain split is distributionally near-exact (ops/walks.py): the
    visit distribution from W=20 parallel chains must sit within the same
    total-variation distance of a single 500*B-hop chain as a second
    independent single-chain run does (sampling-noise floor)."""
    n_hops, alpha, origin, B = 2000, 0.85, 7, 64
    nodeset = jnp.full((B,), origin, dtype=jnp.int32)

    def visit_dist(key, n_chains):
        tr = np.asarray(random_walks(device_graph, nodeset, n_hops, alpha,
                                     key, n_chains=n_chains))
        c = np.bincount(tr.reshape(-1),
                        minlength=device_graph.n_items).astype(float)
        return c / c.sum()

    p1 = visit_dist(jax.random.PRNGKey(21), 1)
    p1b = visit_dist(jax.random.PRNGKey(22), 1)
    p20 = visit_dist(jax.random.PRNGKey(23), 20)

    tv = lambda a, b: 0.5 * np.abs(a - b).sum()
    noise_floor = tv(p1, p1b)
    assert tv(p20, p1) < max(2.5 * noise_floor, 0.05), (
        f"chained TV {tv(p20, p1):.4f} vs noise floor {noise_floor:.4f}")


def test_fused_tables_walk_bit_identical(device_graph):
    """The extent-joined walker (2 gathers/hop) must replay the EXACT same
    chain as the packed-extent walker under the same key — same uniforms,
    same clamp arithmetic, so traces match element-for-element."""
    from gcn_song_embeddings_tpu.ops.walks import random_walks_fused

    nodeset = jnp.arange(24, dtype=jnp.int32)
    for chains in (1, 5):
        key = jax.random.PRNGKey(31)
        a = np.asarray(random_walks(device_graph, nodeset, 100, 0.85, key,
                                    n_chains=chains))
        b = np.asarray(random_walks_fused(device_graph, nodeset, 100, 0.85,
                                          key, n_chains=chains))
        np.testing.assert_array_equal(a, b)


def test_precompute_cache_invalidated_by_parallel_chains(device_graph,
                                                         tmp_path):
    """Chain splitting perturbs the visit distribution, so the artifact
    cache must not be served across parallel_chains settings."""
    path = str(tmp_path / "nb.npz")
    cfg1 = WalkConfig(n_hops=100, t_precompute=4, batch_walkers=64,
                      parallel_chains=1)
    w1, _ = precompute_neighborhoods(device_graph, cfg1, path, seed=0)
    cfg2 = WalkConfig(n_hops=100, t_precompute=4, batch_walkers=64,
                      parallel_chains=10)
    w2, _ = precompute_neighborhoods(device_graph, cfg2, path, seed=0)
    # distinct chain structure + fresh sampling -> arrays differ somewhere
    assert not np.array_equal(w1, w2)
    # same setting again -> cache hit (byte-identical reload)
    w2b, _ = precompute_neighborhoods(device_graph, cfg2, path, seed=123)
    np.testing.assert_array_equal(w2, w2b)


def test_sample_neighborhood_fused_flag_identical(device_graph):
    """fused=True/False walkers replay the same chain per key, so the
    sampled neighborhoods must match exactly."""
    nodeset = jnp.arange(12, dtype=jnp.int32)
    key = jax.random.PRNGKey(9)
    w_f, n_f = sample_neighborhood_topt(device_graph, nodeset, 200, 0.85,
                                        8, key, fused=True)
    w_p, n_p = sample_neighborhood_topt(device_graph, nodeset, 200, 0.85,
                                        8, key, fused=False)
    np.testing.assert_array_equal(np.asarray(w_f), np.asarray(w_p))
    np.testing.assert_array_equal(np.asarray(n_f), np.asarray(n_p))
