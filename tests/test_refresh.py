"""Incremental PPR cache refresh (ops/ppr.refresh_neighborhoods).

Round-5 VERDICT item 4: after a graph augmentation only origins whose
walks can reach the new edges need re-walking.  The refresh must (a)
leave unaffected origins' rows bit-identical, (b) agree with a FULL
re-sweep of the augmented graph up to walk sampling noise
(distribution-parity: the refresh-vs-full TV distance on affected
origins is bounded by the seed-to-seed TV of two full sweeps), and (c)
save a cache artifact a later full-precompute call accepts.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from gcn_song_embeddings_tpu.config import WalkConfig
from gcn_song_embeddings_tpu.data.device import (
    DeviceGraph,
    augment_with_colisten,
)
from gcn_song_embeddings_tpu.ops.ppr import (
    affected_origins,
    precompute_neighborhoods,
    refresh_neighborhoods,
)

CFG = WalkConfig(n_hops=300, t_precompute=20, batch_walkers=256,
                 sweep_blocks=4)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from gcn_song_embeddings_tpu.data import (
        SongGraph,
        make_synthetic_dataset,
    )

    ds = make_synthetic_dataset(
        str(tmp_path_factory.mktemp("refresh") / "ds"), n_tracks=600,
        n_collections=150, n_clusters=6, tracks_per_collection=10,
        n_positives=1200, seed=13)
    g = SongGraph(ds, features_file=os.path.join(ds, "features.npy"))
    dg = DeviceGraph.from_graph(g)
    plain_w, plain_n = precompute_neighborhoods(dg, CFG, None, seed=0)
    # cross-cluster pairs: genuinely reshape the walked distributions
    rng = np.random.default_rng(5)
    pairs = np.stack([rng.integers(0, 100, 30),
                      rng.integers(500, 600, 30)], axis=1)
    aug = augment_with_colisten(dg, pairs, 1)
    return dg, aug, pairs, plain_w, plain_n


def _tv_rows(w1, n1, w2, n2):
    """Per-row total-variation distance between two top-T weight lists
    (sparse distributions over node ids; zero-weight slots ignored)."""
    out = np.empty(w1.shape[0])
    for i in range(w1.shape[0]):
        d1 = {int(n): float(v) for n, v in zip(n1[i], w1[i]) if v > 0}
        d2 = {int(n): float(v) for n, v in zip(n2[i], w2[i]) if v > 0}
        keys = set(d1) | set(d2)
        out[i] = 0.5 * sum(abs(d1.get(k, 0.0) - d2.get(k, 0.0))
                           for k in keys)
    return out


def test_affected_origins_sound_and_sparse(setup):
    dg, aug, pairs, plain_w, plain_n = setup
    aff = affected_origins(plain_w, plain_n, pairs, dg.n_items)
    # every endpoint is affected; the set is a strict subset of origins
    assert np.isin(np.unique(pairs), aff).all()
    assert 0 < len(aff) < dg.n_items


def test_refresh_matches_full_resweep(setup, tmp_path):
    dg, aug, pairs, plain_w, plain_n = setup
    path = str(tmp_path / "nb_refresh.npz")
    ref_w, ref_n = refresh_neighborhoods(aug, CFG, plain_w, plain_n,
                                         pairs, path=path, seed=0)
    aff = affected_origins(plain_w, plain_n, pairs, dg.n_items)
    unaff = np.setdiff1d(np.arange(dg.n_items), aff)

    # (a) unaffected rows bit-identical
    np.testing.assert_array_equal(ref_w[unaff], plain_w[unaff])
    np.testing.assert_array_equal(ref_n[unaff], plain_n[unaff])

    # (b) distribution parity on affected origins: refresh-vs-full TV
    # within the seed-to-seed noise band of two independent full sweeps
    full1_w, full1_n = precompute_neighborhoods(aug, CFG, None, seed=1)
    full2_w, full2_n = precompute_neighborhoods(aug, CFG, None, seed=2)
    tv_refresh = _tv_rows(ref_w[aff], ref_n[aff],
                          full1_w[aff], full1_n[aff]).mean()
    tv_seed = _tv_rows(full2_w[aff], full2_n[aff],
                       full1_w[aff], full1_n[aff]).mean()
    assert tv_refresh < 1.3 * tv_seed + 0.02, (tv_refresh, tv_seed)

    # ...and the refresh actually MOVED the affected rows toward the
    # augmented distribution (stale plain rows are farther from full)
    tv_stale = _tv_rows(plain_w[aff], plain_n[aff],
                        full1_w[aff], full1_n[aff]).mean()
    assert tv_refresh < tv_stale, (tv_refresh, tv_stale)

    # (c) the saved artifact is served by a full-precompute call on the
    # same augmented graph (meta matches: augmented n_edges)
    cached_w, cached_n = precompute_neighborhoods(aug, CFG, path, seed=0)
    np.testing.assert_array_equal(cached_w, ref_w)
    np.testing.assert_array_equal(cached_n, ref_n)


def test_refresh_rejects_stale_shape(setup):
    dg, aug, pairs, plain_w, plain_n = setup
    with pytest.raises(ValueError):
        refresh_neighborhoods(aug, CFG, plain_w[:-1], plain_n[:-1], pairs)
