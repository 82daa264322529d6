"""Catalog-sharded serving (parallel/serve_sharded.py) on the 8-device
CPU mesh: the distributed-MIPS schedule must reproduce the single-device
serving kernels exactly (same dot products at precision=HIGHEST, ties
absent with random embeddings)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_song_embeddings_tpu.ops.quantize import int8_scores, quantize_rows
from gcn_song_embeddings_tpu.parallel.mesh import make_mesh
from gcn_song_embeddings_tpu.parallel.serve_sharded import ShardedServeIndex
from gcn_song_embeddings_tpu.serve import _hybrid_topk_batch_cached


def _emb(n=203, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d)).astype(np.float32)


def _unit(emb):
    return emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                            1e-12)


def _nbhds(n, t=8, seed=1):
    rng = np.random.default_rng(seed)
    w = np.sort(rng.random((n, t)).astype(np.float32), axis=1)[:, ::-1]
    # a few rows with zero-weight tails (the merge drops them)
    w[:: 7, t // 2:] = 0.0
    nodes = rng.integers(0, n, size=(n, t)).astype(np.int32)
    return np.ascontiguousarray(w), nodes


def _ref_knn(unit, rows, k):
    """Single-device reference: full [B, N] panel, self masked, top-k."""
    sims = np.array(
        jnp.dot(jnp.asarray(unit[rows]), jnp.asarray(unit).T,
                precision=jax.lax.Precision.HIGHEST))
    sims[np.arange(len(rows)), rows] = -np.inf
    n = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(sims, n, axis=1), n


def test_sharded_knn_matches_single_device():
    emb = _emb()
    idx = ShardedServeIndex(emb, mesh=make_mesh(n_dp=1, n_graph=8),
                            k_cap=16)
    rows = np.array([0, 7, 55, 201, 3, 3], np.int32)  # dup queries fine
    w, n = idx.knn_rows(rows, k=10)
    assert w.shape == (6, 10) and n.shape == (6, 10)
    rw, rn = _ref_knn(_unit(emb), rows, 10)
    np.testing.assert_array_equal(n, rn)
    np.testing.assert_allclose(w, rw, rtol=1e-6, atol=1e-6)
    assert not (n == rows[:, None]).any()             # self excluded


def test_sharded_knn_uneven_pad_rows_never_returned():
    # N=203 pads to 208 over 8 shards: 5 pad rows must never appear
    emb = _emb(n=203)
    idx = ShardedServeIndex(emb, mesh=make_mesh(n_dp=1, n_graph=8),
                            k_cap=25)
    rows = np.arange(64, dtype=np.int32) * 3 % 203
    w, n = idx.knn_rows(rows, k=25)
    assert n.max() < 203
    assert np.isfinite(w).all()


def test_sharded_hybrid_matches_cached_head_kernel():
    emb = _emb(n=160, d=12, seed=3)
    unit = _unit(emb)
    nb_w, nb_n = _nbhds(160)
    mesh = make_mesh(n_dp=1, n_graph=8)
    idx = ShardedServeIndex(emb, mesh=mesh, nbhds=(nb_w, nb_n), k_cap=20)
    rows = np.array([5, 0, 159, 42], np.int32)
    w, n = idx.hybrid_knn_rows(rows, k=20)
    # single-device cached-head serving kernel = the oracle-pinned one
    rw, rn = _hybrid_topk_batch_cached(
        jnp.asarray(nb_w), jnp.asarray(nb_n), jnp.asarray(unit),
        jnp.asarray(rows), 20)
    np.testing.assert_array_equal(n, np.asarray(rn)[:, :20])
    np.testing.assert_allclose(w, np.asarray(rw)[:, :20],
                               rtol=1e-6, atol=1e-6)


def test_sharded_knn_int8_matches_full_table_int8():
    emb = _emb(n=128, d=16, seed=5)
    unit = _unit(emb)
    mesh = make_mesh(n_dp=1, n_graph=8)
    idx = ShardedServeIndex(emb, mesh=mesh, quantized=True, k_cap=12)
    rows = np.array([1, 64, 127], np.int32)
    w, n = idx.knn_rows(rows, k=12)
    vals, scales = quantize_rows(jnp.asarray(unit))
    sims = np.array(int8_scores(vals, scales, jnp.asarray(unit[rows])))
    sims[np.arange(len(rows)), rows] = -np.inf
    rn = np.argsort(-sims, axis=1, kind="stable")[:, :12]
    np.testing.assert_array_equal(n, rn)
    np.testing.assert_allclose(
        w, np.take_along_axis(sims, rn, axis=1), rtol=1e-5, atol=1e-5)


def test_sharded_hybrid_ring_gather_bit_identical():
    # the ring ppermute schedule must return exactly what psum_scatter does
    emb = _emb(n=160, d=12, seed=3)
    nb_w, nb_n = _nbhds(160)
    mesh = make_mesh(n_dp=1, n_graph=8)
    rows = np.array([5, 0, 159, 42], np.int32)
    a = ShardedServeIndex(emb, mesh=mesh, nbhds=(nb_w, nb_n), k_cap=20)
    b = ShardedServeIndex(emb, mesh=mesh, nbhds=(nb_w, nb_n), k_cap=20,
                          gather_impl="ring")
    wa, na = a.hybrid_knn_rows(rows, k=20)
    wb, nb = b.hybrid_knn_rows(rows, k=20)
    np.testing.assert_array_equal(na, nb)
    np.testing.assert_array_equal(wa, wb)
    with pytest.raises(ValueError):
        ShardedServeIndex(emb, mesh=mesh, gather_impl="nope")


def test_sharded_serve_validation():
    emb = _emb(n=40)
    mesh = make_mesh(n_dp=1, n_graph=8)
    idx = ShardedServeIndex(emb, mesh=mesh, k_cap=128)
    assert idx.k_cap == 5                      # clamped to 40/8 rows/shard
    with pytest.raises(IndexError):
        idx.knn_rows(np.array([40]))
    with pytest.raises(ValueError):
        idx.knn_rows(np.array([], np.int32))
    with pytest.raises(ValueError):
        idx.hybrid_knn_rows(np.array([0]))     # no nbhds given
    with pytest.raises(ValueError):
        ShardedServeIndex(emb, mesh=make_mesh(n_dp=2, n_graph=4))


def test_sharded_frontend_http_roundtrip(graph):
    """serve.py's HTTP stack (QueryBatcher on) over the sharded index."""
    import json
    import threading
    import urllib.request

    from gcn_song_embeddings_tpu.parallel.serve_sharded import (
        ShardedServingFrontend,
    )
    from gcn_song_embeddings_tpu.serve import serve

    rng = np.random.default_rng(4)
    emb = rng.normal(size=(graph.n_items, 16)).astype(np.float32)
    nb_w, nb_n = _nbhds(graph.n_items)
    idx = ShardedServeIndex(emb, mesh=make_mesh(n_dp=1, n_graph=8),
                            nbhds=(nb_w, nb_n), k_cap=16)
    front = ShardedServingFrontend(idx, track_ids=graph.track_ids,
                                   tracks_meta=graph.tracks)
    assert front.hybrid                      # auto: nbhds present
    server = serve(front, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        def get(path):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}") as r:
                return json.loads(r.read())

        health = get("/healthz")
        assert health["tracks"] == graph.n_items
        tid = graph.track_ids[3]
        res = get(f"/knn?track={tid}&k=5")
        assert len(res["neighbors"]) == 5
        assert all(n["track"] != tid for n in res["neighbors"])
        assert "name" in res["neighbors"][0]
        # formatted output == the oracle-pinned hybrid kernel's ranking
        rw, rn = idx.hybrid_knn_rows(np.array([3]), k=5)
        assert [n["index"] for n in res["neighbors"]] == rn[0].tolist()
        # batched endpoint through the QueryBatcher
        res = get("/knn?indices=1,2,3&k=4")
        assert len(res["neighbors"]) == 3
        assert all(len(r) == 4 for r in res["neighbors"])
        res = get(f"/embed?track={tid}")
        assert len(res["embedding"]) == 16
    finally:
        server.shutdown()
        server.server_close()
