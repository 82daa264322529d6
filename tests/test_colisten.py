"""Co-listen graph augmentation (VERDICT r3 item 1 mechanism).

`augment_with_colisten` materializes train-positive pairs as 2-member
pseudo-collections so the bipartite two-step walk crosses co-listen links
— the signal TrackTrackCF factorizes directly (reference
baselines.py:458-487).  Structural correctness + PPR reachability +
trainer integration (distinct cache path, cache invalidation by n_edges).
"""

import os

import numpy as np

from gcn_song_embeddings_tpu.data.device import (
    DeviceGraph,
    augment_with_colisten,
)


def _toy_graph():
    """3 items, 2 collections: c0={0,1}, c1={1,2}."""
    return DeviceGraph.from_arrays(
        i2c_indptr=np.array([0, 1, 3, 4]),
        i2c_indices=np.array([0, 0, 1, 1]),
        c2i_indptr=np.array([0, 2, 4]),
        c2i_indices=np.array([0, 1, 1, 2]),
    )


def test_structural_augmentation():
    g = _toy_graph()
    pairs = np.array([[0, 2], [2, 2], [0, 2]])  # self-pair dropped, dup kept
    aug = augment_with_colisten(g, pairs, copies=2)

    assert aug.n_items == 3
    assert aug.n_cols == 2 + 4                     # 2 valid pairs x 2 copies
    # every pseudo-collection holds exactly {0, 2}
    indptr = np.asarray(aug.c2i_indptr)
    indices = np.asarray(aug.c2i_indices)
    for c in range(2, 6):
        members = indices[indptr[c]:indptr[c + 1]]
        assert sorted(members.tolist()) == [0, 2]
    # original collections untouched
    np.testing.assert_array_equal(indices[indptr[0]:indptr[1]], [0, 1])
    np.testing.assert_array_equal(indices[indptr[1]:indptr[2]], [1, 2])
    # item side: items 0 and 2 gained 4 pseudo-collection memberships each
    i_indptr = np.asarray(aug.i2c_indptr)
    i_indices = np.asarray(aug.i2c_indices)
    row0 = i_indices[i_indptr[0]:i_indptr[1]]
    assert sorted(row0.tolist()) == [0, 2, 3, 4, 5]
    row1 = i_indices[i_indptr[1]:i_indptr[2]]
    assert sorted(row1.tolist()) == [0, 1]          # item 1 unchanged
    assert aug.n_edges == g.n_edges + 2 * 2 * 2 * 2

    # deterministic (reference double-instantiation expectation, §7b.12)
    aug2 = augment_with_colisten(g, pairs, copies=2)
    for a, b in zip(aug, aug2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_walks_reach_colisten_neighbors():
    """Two items with NO shared playlist become mutual PPR neighbors only
    through the materialized pair."""
    from gcn_song_embeddings_tpu.config import WalkConfig
    from gcn_song_embeddings_tpu.ops.ppr import precompute_neighborhoods

    # items 0,1 share c0; items 2,3 share c1; no path between the groups
    g = DeviceGraph.from_arrays(
        i2c_indptr=np.array([0, 1, 2, 3, 4]),
        i2c_indices=np.array([0, 0, 1, 1]),
        c2i_indptr=np.array([0, 2, 4]),
        c2i_indices=np.array([0, 1, 2, 3]),
    )
    cfg = WalkConfig(n_hops=200, t_precompute=3, batch_walkers=4)
    w, n = precompute_neighborhoods(g, cfg, path=None, seed=0)
    nb0 = set(n[0][w[0] > 0].tolist())
    assert nb0 == {1}

    aug = augment_with_colisten(g, np.array([[0, 2]]))
    w2, n2 = precompute_neighborhoods(aug, cfg, path=None, seed=0)
    nb0 = set(n2[0][w2[0] > 0].tolist())
    assert 2 in nb0 and 1 in nb0


def test_trainer_colisten_cache_isolation(graph, positives, tmp_path):
    """colisten runs use a distinct nbhds cache path, and the plain cache
    is never served for the augmented graph (n_edges in the meta)."""
    from gcn_song_embeddings_tpu.config import RunConfig, config_with_overrides
    from gcn_song_embeddings_tpu.data.device import DeviceGraph
    from gcn_song_embeddings_tpu.train.trainer import PinSageTrainer

    base = {"train.epochs": 1, "train.batches_per_epoch": 5,
            "train.batch_size": 16, "walk.n_hops": 50,
            "walk.batch_walkers": 256}
    nbhds_path = os.path.join(str(tmp_path), "nb.npz")

    cfg = config_with_overrides(RunConfig(run_name="plain"), base)
    tr = PinSageTrainer(DeviceGraph.from_graph(graph), graph.n_items,
                        graph.features, positives, cfg=cfg,
                        base_run_dir=str(tmp_path), nbhds_path=nbhds_path,
                        log=False, load_save=False, verbose=False)
    assert os.path.isfile(nbhds_path)

    cfg2 = config_with_overrides(RunConfig(run_name="co"),
                                 dict(base, **{"walk.colisten_copies": 1}))
    tr2 = PinSageTrainer(DeviceGraph.from_graph(graph), graph.n_items,
                         graph.features, positives, cfg=cfg2,
                         base_run_dir=str(tmp_path), nbhds_path=nbhds_path,
                         log=False, load_save=False, verbose=False)
    # non-default walk params (n_hops=50) are encoded in the suffix so
    # arms varying them keep distinct artifacts (advisor round 4)
    co_path = os.path.join(str(tmp_path), "nb.colisten1.T100.h50.npz")
    assert os.path.isfile(co_path)
    assert tr2.graph.n_edges > tr.graph.n_edges
    tr2.train()                                     # end-to-end smoke
    assert tr2.e == 1

    # the two artifacts carry distinct n_edges metas — neither can be
    # served for the other graph
    with np.load(nbhds_path) as z_plain, np.load(co_path) as z_co:
        assert z_plain["meta"][2] != z_co["meta"][2]


def test_perspagerank_colisten_option():
    """PersPageRank(colisten_copies=1) ranks co-listen partners that share
    NO playlist (reachable only through the materialized pair)."""
    import types

    from gcn_song_embeddings_tpu.models.baselines.simple import PersPageRank

    # SongGraph stand-in exposing the CSRs DeviceGraph.from_graph reads
    g = types.SimpleNamespace(
        i2c=types.SimpleNamespace(indptr=np.array([0, 1, 2, 3, 4]),
                                  indices=np.array([0, 0, 1, 1])),
        c2i=types.SimpleNamespace(indptr=np.array([0, 2, 4]),
                                  indices=np.array([0, 1, 2, 3])))
    train_set = np.array([[0, 2]])

    plain = PersPageRank(n_hops=300, batch_size=4)
    plain.train(g, None, train_set, None, None)
    _, n = plain.knn(np.array([0]), k=3)
    assert 2 not in n[0]

    aug = PersPageRank(n_hops=300, batch_size=4, colisten_copies=1)
    aug.train(g, None, train_set, None, None)
    _, n = aug.knn(np.array([0]), k=3)
    assert 2 in n[0] and 1 in n[0]


def test_augmentation_matches_naive_oracle_property():
    """Property test: on random graphs/pairs, the vectorized augmentation
    equals a naive per-pair edge-list rebuild (sorted adjacency both
    ways)."""
    from gcn_song_embeddings_tpu.data.graph import _build_csr

    rng = np.random.default_rng(4)
    for trial in range(5):
        n_items = int(rng.integers(3, 40))
        n_cols = int(rng.integers(1, 12))
        n_edges = int(rng.integers(0, 60))
        src = rng.integers(0, n_items, n_edges)
        dst = rng.integers(0, n_cols, n_edges)
        g = DeviceGraph.from_arrays(
            _build_csr(src, dst, n_items).indptr,
            _build_csr(src, dst, n_items).indices,
            _build_csr(dst, src, n_cols).indptr,
            _build_csr(dst, src, n_cols).indices)
        n_pairs = int(rng.integers(0, 10))
        pairs = rng.integers(0, n_items, (n_pairs, 2))
        copies = int(rng.integers(1, 3))

        aug = augment_with_colisten(g, pairs, copies)

        # naive oracle: append one 2-member collection per valid pair copy
        valid = [tuple(p) for p in pairs if p[0] != p[1]
                 for _ in range(copies)]
        o_src = list(src)
        o_dst = list(dst)
        c2i_src, c2i_dst = list(dst), list(src)
        for j, (a, b) in enumerate(valid):
            c = n_cols + j
            o_src += [a, b]
            o_dst += [c, c]
            c2i_src += [c, c]
            c2i_dst += [a, b]
        i2c = _build_csr(np.array(o_src, np.int64),
                         np.array(o_dst, np.int64), n_items)
        np.testing.assert_array_equal(np.asarray(aug.i2c_indptr),
                                      i2c.indptr)
        np.testing.assert_array_equal(np.asarray(aug.i2c_indices),
                                      i2c.indices)
        # collection side: same members per collection (order within the
        # appended rows is (a, b) pair order, oracle via sets)
        ap_, ai = np.asarray(aug.c2i_indptr), np.asarray(aug.c2i_indices)
        oc = _build_csr(np.array(c2i_src, np.int64),
                        np.array(c2i_dst, np.int64), n_cols + len(valid))
        assert aug.n_cols == n_cols + len(valid)
        for c in range(aug.n_cols):
            got = sorted(ai[ap_[c]:ap_[c + 1]].tolist())
            want = sorted(oc.indices[oc.indptr[c]:oc.indptr[c + 1]].tolist())
            assert got == want, (trial, c)


def test_walk_embed_hybrid(graph, positives):
    """Hybrid lists start with the walk's nonzero-visit neighbors and are
    completed by embedding rank without duplicates."""
    from gcn_song_embeddings_tpu.models.baselines.simple import (
        WalkEmbedHybrid,
        merge_ranked_lists,
    )

    tr = positives[: len(positives) // 2]
    m = WalkEmbedHybrid(graph.features, n_hops=200, batch_size=64,
                        colisten_copies=1)
    m.train(graph, graph.track_ids, tr, None, graph.features)
    k = 20
    qs = np.arange(8)
    w, n = m.knn(qs, k)
    walk_w, walk_n = m.walker.knn(qs, k)
    for i in range(len(qs)):
        row = n[i]
        assert len(set(row.tolist())) == k          # no duplicates
        head = walk_n[i][walk_w[i] > 0][:k]
        np.testing.assert_array_equal(row[: len(head)], head)
        # merged weights preserve order under a re-sort
        assert (np.diff(w[i][np.isfinite(w[i])]) <= 1e-6).all()

    # merge helper unit case: head exhausts, tail fills, dedup holds
    hw = np.array([[0.5, 0.2, 0.0]])
    hn = np.array([[3, 1, 0]])
    tw = np.array([[0.9, 0.8, 0.7]])
    tn = np.array([[1, 4, 5]])
    mw, mn = merge_ranked_lists(hw, hn, tw, tn)
    np.testing.assert_array_equal(mn[0], [3, 1, 4])
    assert mw[0][0] > mw[0][1] > mw[0][2]


def test_apply_colisten_cache_suffix_encodes_walk_params(graph, positives):
    """Advisor (round 4): arms sharing a dataset but varying walk params
    must get DISTINCT cache filenames, not thrash one file; default
    params keep the short stable name."""
    import dataclasses

    from gcn_song_embeddings_tpu.config import WalkConfig
    from gcn_song_embeddings_tpu.data.device import (
        DeviceGraph,
        apply_colisten_config,
    )

    dg = DeviceGraph.from_graph(graph)
    base = "/tmp/x/neighborhoods.npz"
    _, p0 = apply_colisten_config(dg, positives,
                                  WalkConfig(colisten_copies=1), base)
    assert p0 == "/tmp/x/neighborhoods.colisten1.npz"
    _, p1 = apply_colisten_config(
        dg, positives, WalkConfig(colisten_copies=1, t_precompute=50), base)
    _, p2 = apply_colisten_config(
        dg, positives, WalkConfig(colisten_copies=1, n_hops=1000), base)
    _, p3 = apply_colisten_config(
        dg, positives, WalkConfig(colisten_copies=2), base)
    _, p4 = apply_colisten_config(
        dg, positives, WalkConfig(colisten_copies=1, alpha=0.5), base)
    paths = {p0, p1, p2, p3, p4}
    assert len(paths) == 5, paths
    # off -> untouched
    _, poff = apply_colisten_config(dg, positives, WalkConfig(), base)
    assert poff == base
