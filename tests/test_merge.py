"""ops/merge.merge_topk vs the merge_ranked_lists numpy oracle.

Round-5 VERDICT item 1: the hybrid ranker's merge moved from a per-row
Python set loop to a device sort kernel; this pins the two together, plus
the advisor's mismatched-width crash case (knn_from_emb clamps k to n-1,
so WalkEmbedHybrid regularly feeds a k-wide walk head and a (n-1)-wide
embedding tail into one merge).
"""

from __future__ import annotations

import numpy as np
import pytest

from gcn_song_embeddings_tpu.models.baselines.simple import (
    merge_ranked_lists,
)
from gcn_song_embeddings_tpu.ops.merge import merge_topk


def _ranked_lists(rng, B, n, k, n_valid_max=None, zero_tail=False):
    """[B, k] top-k-style lists: distinct nodes per row, descending
    positive weights; optionally a zero-weight tail whose node ids are
    DUPLICATES of earlier entries (the visit_counts_topt fill contract)."""
    nodes = np.stack([rng.permutation(n)[:k] for _ in range(B)]
                     ).astype(np.int32)
    w = np.sort(rng.random((B, k)).astype(np.float32), axis=1)[:, ::-1] + .1
    if zero_tail:
        n_valid = rng.integers(0, k + 1, size=B) if n_valid_max is None \
            else rng.integers(0, n_valid_max + 1, size=B)
        for i in range(B):
            v = n_valid[i]
            w[i, v:] = 0.0
            if v:
                # zero-weight slots repeat an arbitrary earlier node
                nodes[i, v:] = nodes[i, rng.integers(0, v)]
    return np.ascontiguousarray(w), nodes


def _assert_merge_equal(hw, hn, tw, tn):
    ow, on = merge_ranked_lists(hw, hn, tw, tn)
    dw, dn = merge_topk(hw, hn, tw, tn)
    dw, dn = np.asarray(dw), np.asarray(dn)
    np.testing.assert_array_equal(on, dn)
    finite = np.isfinite(ow)
    np.testing.assert_array_equal(finite, np.isfinite(dw))
    np.testing.assert_allclose(ow[finite], dw[finite], rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_merge_topk_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    B, n, k = 16, 400, 25
    hw, hn = _ranked_lists(rng, B, n, k, zero_tail=True)
    tw, tn = _ranked_lists(rng, B, n, k)
    _assert_merge_equal(hw, hn, tw, tn)


def test_merge_topk_mismatched_widths():
    """Advisor (round 4, medium): tail narrower than head crashed the
    old oracle; both paths must now emit max-width rows."""
    rng = np.random.default_rng(7)
    B, n = 8, 50
    hw, hn = _ranked_lists(rng, B, n, 20, zero_tail=True)
    tw, tn = _ranked_lists(rng, B, n, 12)
    ow, on = merge_ranked_lists(hw, hn, tw, tn)
    assert on.shape == (B, 20)
    _assert_merge_equal(hw, hn, tw, tn)
    # and the transpose case (tail wider than head; tails must be
    # duplicate-free per the contract, so draw a fresh distinct one)
    t2w, t2n = _ranked_lists(rng, B, n, 20)
    _assert_merge_equal(tw, tn, t2w, t2n)


def test_merge_topk_overlap_and_order():
    """Duplicates resolve in the head's favor; merged weights re-sort to
    the merged order."""
    hw = np.array([[0.5, 0.2, 0.0]], np.float32)
    hn = np.array([[3, 1, 3]], np.int32)          # zero-slot dup of head[0]
    tw = np.array([[0.9, 0.8, 0.7]], np.float32)
    tn = np.array([[1, 4, 5]], np.int32)
    for w, n in (merge_ranked_lists(hw, hn, tw, tn),
                 merge_topk(hw, hn, tw, tn)):
        w, n = np.asarray(w), np.asarray(n)
        np.testing.assert_array_equal(n[0], [3, 1, 4])
        assert w[0][0] > w[0][1] > w[0][2]
        # ordinal contract: a re-sort by weight preserves merge order
        assert (np.argsort(-w[0]) == np.arange(3)).all()


def test_merge_topk_degenerate_fill():
    """Tiny catalogs: fewer distinct candidates than k — tail slots
    repeat the last placed node at -inf."""
    hw = np.array([[0.6, 0.4]], np.float32)
    hn = np.array([[2, 0]], np.int32)
    tw = np.array([[0.9, 0.8]], np.float32)
    tn = np.array([[0, 2]], np.int32)             # all dups of the head
    for w, n in (merge_ranked_lists(hw, hn, tw, tn),
                 merge_topk(hw, hn, tw, tn)):
        w, n = np.asarray(w), np.asarray(n)
        np.testing.assert_array_equal(n[0], [2, 0])
        assert np.isfinite(w[0][1]) and w[0][1] > 0


def test_hybrid_knn_k_exceeds_catalog(graph_small):
    """Advisor crash case: requested k >= catalog size (knn_from_emb
    clamps its width to n-1; the merge must accept the mismatch)."""
    from gcn_song_embeddings_tpu.models.baselines.simple import (
        WalkEmbedHybrid,
    )

    g, positives = graph_small
    m = WalkEmbedHybrid(g.features, n_hops=50, batch_size=32,
                        colisten_copies=1)
    m.train(g, g.track_ids, positives, None, g.features)
    k = g.n_items + 5                              # > catalog size
    w, n = m.knn(np.arange(4), k)
    assert n.shape == (4, k)
    for i in range(4):
        fin = np.isfinite(w[i])
        row = n[i][fin]
        assert len(set(row.tolist())) == len(row)  # no finite dups


@pytest.fixture(scope="module")
def graph_small(tmp_path_factory):
    import os

    from gcn_song_embeddings_tpu.data import SongGraph, make_synthetic_dataset

    ds = make_synthetic_dataset(
        str(tmp_path_factory.mktemp("merge_ds") / "ds"),
        n_tracks=60, n_collections=15, n_positives=200, seed=11)
    g = SongGraph(ds, features_file=os.path.join(ds, "features.npy"))
    pos, _ = g.load_positives_split(os.path.join(ds, "positives.json"))
    return g, pos
