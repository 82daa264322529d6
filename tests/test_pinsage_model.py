"""Activation-parity tests: TPU PinSage vs the reference-math numpy oracle.

BASELINE.json north star: "Match the reference pinsage_model.py per-layer
activations (allclose)".  The oracle (tests/reference_oracle.py) implements
the reference's literal algorithm — dynamic unique-dedup nodeflow +
full-graph h buffer with zero-padding put_embeddings — so passing these tests
proves the static dedup-free frontier expansion is numerically equivalent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_song_embeddings_tpu.models.pinsage import (
    conv_apply,
    init_pinsage,
    pinsage_forward,
)
from tests import reference_oracle as oracle


def _random_nbhds(rng, n_items, t_store):
    nodes = rng.integers(0, n_items, size=(n_items, t_store)).astype(np.int32)
    # avoid self (the PPR kernel zeroes self visits)
    nodes = np.where(nodes == np.arange(n_items)[:, None],
                     (nodes + 1) % n_items, nodes)
    weights = rng.random(size=(n_items, t_store)).astype(np.float32)
    weights = np.sort(weights, axis=1)[:, ::-1].copy()
    return weights, nodes


def _params_as_numpy(params):
    layers = [(np.asarray(l.Wq, np.float64), np.asarray(l.bq, np.float64),
               np.asarray(l.Ww, np.float64), np.asarray(l.bw, np.float64))
              for l in params.layers]
    g1 = (np.asarray(params.G1_w, np.float64),
          np.asarray(params.G1_b, np.float64))
    g2 = np.asarray(params.G2_w, np.float64)
    return layers, g1, g2


def test_conv_layer_matches_oracle():
    rng = np.random.default_rng(0)
    B, T, Din, H, Dout = 12, 3, 16, 20, 8
    key = jax.random.PRNGKey(0)
    params = init_pinsage(key, 1, Din, H, Dout)
    layer = params.layers[0]

    h_self = rng.normal(size=(B, Din)).astype(np.float32)
    h_nb = rng.normal(size=(B, T, Din)).astype(np.float32)
    nb_w = rng.random(size=(B, T)).astype(np.float32)

    got = np.asarray(conv_apply(layer, jnp.asarray(h_self),
                                jnp.asarray(h_nb), jnp.asarray(nb_w)))

    # oracle path: build full-h with the B nodes and their neighbors laid out
    n_total = B * (T + 1)
    h = np.zeros((n_total, Din))
    h[:B] = h_self
    h[B:] = h_nb.reshape(B * T, Din)
    nodeset = np.arange(B)
    nb_nodes = np.arange(B, n_total).reshape(B, T)
    lp = (np.asarray(layer.Wq, np.float64), np.asarray(layer.bq, np.float64),
          np.asarray(layer.Ww, np.float64), np.asarray(layer.bw, np.float64))
    want = oracle.conv_forward(lp, h, nodeset, nb_nodes,
                               nb_w.astype(np.float64), Din)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("n_layers", [1, 2, 3, 4])
def test_full_forward_matches_oracle(n_layers):
    rng = np.random.default_rng(1)
    N, Din, H, Dout, T, B = 200, 24, 32, 16, 3, 40
    key = jax.random.PRNGKey(42)
    params = init_pinsage(key, n_layers, Din, H, Dout)
    features = rng.normal(size=(N, Din)).astype(np.float32)
    nb_w, nb_n = _random_nbhds(rng, N, 10)
    nodeset = rng.integers(0, N, size=(B,)).astype(np.int32)

    got = np.asarray(pinsage_forward(
        params, jnp.asarray(features), jnp.asarray(nb_w), jnp.asarray(nb_n),
        jnp.asarray(nodeset), n_layers, T))

    layers, g1, g2 = _params_as_numpy(params)
    want = oracle.pinsage_forward_oracle(
        layers, g1, g2, features, nb_w.astype(np.float64), nb_n,
        nodeset, n_layers, T, Dout)
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.parametrize("n_layers", [1, 2, 3])
def test_fullgraph_forward_matches_frontier(n_layers):
    """The full-catalog sweep (large-batch strategy) must equal the
    frontier-expansion forward on every node: the precomputed
    neighborhoods are batch-independent, so both compute the same
    function (models/pinsage.fullgraph_embeddings)."""
    from gcn_song_embeddings_tpu.models.pinsage import (
        embed_all,
        pinsage_forward_fullgraph,
    )

    rng = np.random.default_rng(4)
    n, din, hid, dout, t = 300, 24, 20, 12, 3
    feats = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    nb_w, nb_n = _random_nbhds(rng, n, 8)
    params = init_pinsage(jax.random.PRNGKey(1), n_layers, din, hid, dout)
    nodeset = jnp.asarray(rng.integers(0, n, 64).astype(np.int32))

    ref = pinsage_forward(params, feats, jnp.asarray(nb_w),
                          jnp.asarray(nb_n), nodeset, n_layers, t)
    got = pinsage_forward_fullgraph(params, feats, jnp.asarray(nb_w),
                                    jnp.asarray(nb_n), nodeset, n_layers, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    # embed_all's two strategies agree too
    a = embed_all(params, feats, jnp.asarray(nb_w), jnp.asarray(nb_n), n,
                  n_layers, t, strategy="fullgraph")
    b = embed_all(params, feats, jnp.asarray(nb_w), jnp.asarray(nb_n), n,
                  n_layers, t, batch_size=128, strategy="blocks")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_fullgraph_wins_cost_model():
    from gcn_song_embeddings_tpu.models.pinsage import fullgraph_wins

    # reference config: 3*128 triple rows on 20k items -> frontier cheaper
    assert not fullgraph_wins(3 * 128, 20_000, 2, 3)
    # large batch: 3*4096 rows on 20k items -> full catalog cheaper
    assert fullgraph_wins(3 * 4096, 20_000, 2, 3)


def test_forward_duplicate_nodes_in_batch():
    """Duplicated batch entries must embed identically (the reference's
    dedup makes them one node; our recursion recomputes them)."""
    rng = np.random.default_rng(2)
    N, Din, H, Dout, T = 100, 16, 16, 8, 3
    params = init_pinsage(jax.random.PRNGKey(0), 2, Din, H, Dout)
    features = rng.normal(size=(N, Din)).astype(np.float32)
    nb_w, nb_n = _random_nbhds(rng, N, 5)
    nodeset = np.array([5, 5, 9, 9], dtype=np.int32)
    out = np.asarray(pinsage_forward(
        params, jnp.asarray(features), jnp.asarray(nb_w), jnp.asarray(nb_n),
        jnp.asarray(nodeset), 2, T))
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)
    np.testing.assert_allclose(out[2], out[3], atol=1e-6)
    assert not np.allclose(out[0], out[2])


def test_init_statistics():
    """Xavier-uniform bounds + bias fill 0.3 (pinsage_model.py:182-187)."""
    params = init_pinsage(jax.random.PRNGKey(0), 2, 512, 512, 128)
    l0 = params.layers[0]
    bound = np.sqrt(6.0 / (512 + 512))
    wq = np.asarray(l0.Wq)
    assert np.abs(wq).max() <= bound + 1e-6
    assert np.abs(wq).max() > 0.8 * bound  # actually spans the range
    np.testing.assert_allclose(np.asarray(l0.bq), 0.3)
    np.testing.assert_allclose(np.asarray(params.G1_b), 0.3)
    # layer 1 input dim is out_dim (pinsage_model.py:232)
    assert params.layers[1].Wq.shape == (512, 128)
    assert params.layers[1].Ww.shape == (128, 128 + 512)


def test_head_not_normalized():
    """G1/G2 output is NOT renormalized (SURVEY §7b.4)."""
    rng = np.random.default_rng(3)
    N, Din, H, Dout, T = 60, 8, 8, 8, 2
    params = init_pinsage(jax.random.PRNGKey(1), 1, Din, H, Dout)
    features = rng.normal(size=(N, Din)).astype(np.float32)
    nb_w, nb_n = _random_nbhds(rng, N, 4)
    out = np.asarray(pinsage_forward(
        params, jnp.asarray(features), jnp.asarray(nb_w), jnp.asarray(nb_n),
        jnp.arange(10, dtype=jnp.int32), 1, T))
    norms = np.linalg.norm(out, axis=1)
    assert not np.allclose(norms, 1.0, atol=1e-3)


def test_gs2_large_config_forward():
    """The reference grid search's largest config (n_layers=4, hidden 1024,
    out 256 — dashboard.py:136-137, grid_search_results/grid_search2.json)
    must run and stay finite."""
    rng = np.random.default_rng(9)
    N, Din, H, Dout, T, B = 400, 512, 1024, 256, 3, 16
    params = init_pinsage(jax.random.PRNGKey(2), 4, Din, H, Dout)
    features = rng.normal(size=(N, Din)).astype(np.float32)
    nb_w, nb_n = _random_nbhds(rng, N, 5)
    out = np.asarray(pinsage_forward(
        params, jnp.asarray(features), jnp.asarray(nb_w), jnp.asarray(nb_n),
        jnp.arange(B, dtype=jnp.int32), 4, T))
    assert out.shape == (B, Dout)
    assert np.isfinite(out).all()
