"""Embedding serving: low-latency kNN retrieval over a trained catalog.

The reference has no serving path — its "deployment" is the offline eval
cache (eval.py:52-143).  For production use the framework adds one:
`EmbeddingIndex` keeps the embedding matrix device-resident with
L2-normalized rows (so a query is one MXU matvec + top-k, jitted once),
and `serve()` exposes it over plain HTTP (stdlib, no extra deps).

Endpoints:
    GET /healthz                          -> {"status": "ok", ...}
    GET /knn?track=<id>&k=10              -> ranked neighbors w/ metadata
    GET /knn?index=<row>&k=10             -> same, by integer row
    GET /knn?tracks=<id,id,...>&k=10      -> batched: one device call for
                                             all queries (also indices=)
    GET /embed?track=<id>                 -> the raw embedding vector

Concurrency design: `ThreadingHTTPServer` handles sockets/JSON on many
threads, but ALL device work funnels through ONE dispatcher thread
(`QueryBatcher`) that drains the request queue and issues a single
batched MXU matmul per drain — concurrent clients COALESCE into larger
device batches instead of racing dispatches (on the tunneled axon
platform concurrent dispatch is unsafe; on any platform the batched
matmul beats N matvecs).  Batch sizes are bucketed to powers of two and
the top-k width is fixed at construction, so the jit cache stays small.

Batched offline retrieval should use ops.knn.knn_from_emb instead; this
path is optimized for online latency.
"""

from __future__ import annotations

import os
import json
import queue
import threading
from concurrent.futures import Future
from functools import partial
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np


def _select_topk(sims: jnp.ndarray, kk: int):
    """Serving selection primitive: TPU ApproxTopK at recall_target=1.0.

    Score-EXACT (verified max|dw| = 0 at the [B, 1M] serving shape);
    only the order among bit-equal scores differs from lax.top_k —
    arbitrary in the reference's torch.topk too.  Measured 1.21-1.32x
    over the sort-based top_k at k=128 over a 1M-row panel
    (results/serve_topk_ab.json); at the EVAL instrument's shape
    (k=1000 over 8k chunks) it is neutral, so ops/knn keeps lax.top_k
    and list-instrument tie semantics stay put.
    GCN_TPU_SERVE_SORT_TOPK=1 restores the sort primitive (A/B knob)."""
    if os.environ.get("GCN_TPU_SERVE_SORT_TOPK"):
        return jax.lax.top_k(sims, kk)
    return jax.lax.approx_max_k(sims, kk, recall_target=1.0)


@partial(jax.jit, static_argnames=("k",))
def _query_topk(unit_emb: jnp.ndarray, row: jnp.ndarray, k: int):
    """One-query cosine top-(k+1): [N, d] x [d] matvec + top_k.

    Self is filtered BY ID downstream, not by dropping slot 0 — with
    duplicate embeddings top_k's index tie-break can put the duplicate in
    slot 0 and the query itself in slot 1."""
    sims = jnp.dot(unit_emb, unit_emb[row],
                   precision=jax.lax.Precision.HIGHEST)  # see ops/knn.py
    return _select_topk(sims, k + 1)


@partial(jax.jit, static_argnames=("n_hops", "k", "n_chains"))
def _hybrid_topk_batch(tables, unit_emb: jnp.ndarray, rows: jnp.ndarray,
                       key, n_hops: int, alpha: float, k: int,
                       n_chains: int):
    """[B] query rows -> hybrid (walk-head, embedding-tail) top-k, all on
    device in ONE dispatch: restart walks over the (colisten-augmented)
    graph -> visit-count top-k, cosine top-k with the self masked, then
    the sort-based merge (ops/merge.py).  This is the serving form of
    WalkEmbedHybrid — the roster winner on every metric (RESULTS.md
    round 4) — as a deployable device kernel."""
    from gcn_song_embeddings_tpu.ops.merge import merge_topk
    from gcn_song_embeddings_tpu.ops.ppr import visit_counts_topt
    from gcn_song_embeddings_tpu.ops.walks import walks_from_fused_tables

    trace = walks_from_fused_tables(tables, rows, n_hops, alpha, key,
                                    n_chains=n_chains)
    head_w, head_n = visit_counts_topt(trace, rows, k)
    sims = jnp.dot(unit_emb[rows], unit_emb.T,
                   precision=jax.lax.Precision.HIGHEST)
    sims = sims.at[jnp.arange(rows.shape[0]), rows].set(-jnp.inf)  # self
    tail_w, tail_n = _select_topk(sims, k)
    return merge_topk(head_w, head_n, tail_w, tail_n)


@partial(jax.jit, static_argnames=("n_hops", "k", "n_chains"))
def _hybrid_topk_batch_int8(tables, q_values, q_scales, q: jnp.ndarray,
                            rows: jnp.ndarray, key, n_hops: int,
                            alpha: float, k: int, n_chains: int):
    """_hybrid_topk_batch with the embedding tail scored on the int8
    table (ops/quantize.int8_scores — the exact serving math the
    quality artifact certifies).  `q` carries the f32 query rows
    (gathered host-side, like the embedding-only int8 path)."""
    from gcn_song_embeddings_tpu.ops.merge import merge_topk
    from gcn_song_embeddings_tpu.ops.ppr import visit_counts_topt
    from gcn_song_embeddings_tpu.ops.quantize import int8_scores
    from gcn_song_embeddings_tpu.ops.walks import walks_from_fused_tables

    trace = walks_from_fused_tables(tables, rows, n_hops, alpha, key,
                                    n_chains=n_chains)
    head_w, head_n = visit_counts_topt(trace, rows, k)
    sims = int8_scores(q_values, q_scales, q)
    sims = sims.at[jnp.arange(rows.shape[0]), rows].set(-jnp.inf)  # self
    tail_w, tail_n = _select_topk(sims, k)
    return merge_topk(head_w, head_n, tail_w, tail_n)


@partial(jax.jit, static_argnames=("k",))
def _hybrid_topk_batch_cached(nbhd_w: jnp.ndarray, nbhd_n: jnp.ndarray,
                              unit_emb: jnp.ndarray, rows: jnp.ndarray,
                              k: int):
    """Hybrid top-k with the walk head read from the PRECOMPUTED
    neighborhoods artifact (ops/ppr.precompute_neighborhoods): two row
    gathers + cosine top-k + merge — no per-query walk scan.  The
    offline sweep amortizes the walks the reference re-runs per query
    (baselines.py:107-151), so hybrid latency ~= embedding-only
    latency; the head is truncated at the artifact's T (default 100)
    instead of the query-time walk's k, and serving is DETERMINISTIC
    (no walk RNG)."""
    from gcn_song_embeddings_tpu.ops.merge import merge_topk

    head_w = nbhd_w[rows]                                # [B, T] desc
    head_n = nbhd_n[rows]
    sims = jnp.dot(unit_emb[rows], unit_emb.T,
                   precision=jax.lax.Precision.HIGHEST)
    sims = sims.at[jnp.arange(rows.shape[0]), rows].set(-jnp.inf)  # self
    tail_w, tail_n = _select_topk(sims, k)
    return merge_topk(head_w, head_n, tail_w, tail_n)


@partial(jax.jit, static_argnames=("k",))
def _hybrid_topk_batch_cached_int8(nbhd_w: jnp.ndarray,
                                   nbhd_n: jnp.ndarray,
                                   q_values, q_scales, q: jnp.ndarray,
                                   rows: jnp.ndarray, k: int):
    """_hybrid_topk_batch_cached with the embedding tail scored on the
    int8 table (ops/quantize.int8_scores)."""
    from gcn_song_embeddings_tpu.ops.merge import merge_topk
    from gcn_song_embeddings_tpu.ops.quantize import int8_scores

    head_w = nbhd_w[rows]
    head_n = nbhd_n[rows]
    sims = int8_scores(q_values, q_scales, q)
    sims = sims.at[jnp.arange(rows.shape[0]), rows].set(-jnp.inf)  # self
    tail_w, tail_n = _select_topk(sims, k)
    return merge_topk(head_w, head_n, tail_w, tail_n)


@partial(jax.jit, static_argnames=("k",))
def _query_topk_batch(unit_emb: jnp.ndarray, rows: jnp.ndarray, k: int):
    """[B] query rows -> ([B, k+1], [B, k+1]) cosine top-(k+1).

    One MXU matmul for the whole batch — this is what the QueryBatcher
    coalesces concurrent single queries into."""
    q = unit_emb[rows]                                     # [B, d]
    sims = jnp.dot(q, unit_emb.T,
                   precision=jax.lax.Precision.HIGHEST)    # [B, N]
    return _select_topk(sims, k + 1)


@partial(jax.jit, static_argnames=("k",))
def _query_topk_batch_delta(unit_emb: jnp.ndarray, delta: jnp.ndarray,
                            q: jnp.ndarray, count, k: int):
    """Cosine top-(k+1) over main table + online-add delta buffer.

    `delta` is the [cap, d] power-of-two delta buffer (rows past `count`
    are dead and masked); concat index order makes a delta hit's index
    n_main + position = its global row id.  Queries land here only while
    a delta is outstanding (EmbeddingIndex.add_tracks / compact)."""
    sims_m = jnp.dot(q, unit_emb.T,
                     precision=jax.lax.Precision.HIGHEST)   # [B, N]
    sims_d = jnp.dot(q, delta.T,
                     precision=jax.lax.Precision.HIGHEST)   # [B, cap]
    dead = jax.lax.broadcasted_iota(
        jnp.int32, (1, delta.shape[0]), 1) >= count
    sims_d = jnp.where(dead, -jnp.inf, sims_d)
    return _select_topk(jnp.concatenate([sims_m, sims_d], axis=1), k + 1)


@partial(jax.jit, static_argnames=("k",))
def _query_topk_batch_delta_int8(values: jnp.ndarray, scales: jnp.ndarray,
                                 delta: jnp.ndarray, q: jnp.ndarray,
                                 count, k: int):
    """`_query_topk_batch_delta` with the MAIN table scored int8
    (ops/quantize.int8_scores) and the delta scored f32 — freshly added
    rows stay exact until `compact()` folds + re-quantizes them."""
    from gcn_song_embeddings_tpu.ops.quantize import int8_scores

    sims_m = int8_scores(values, scales, q)
    sims_d = jnp.dot(q, delta.T, precision=jax.lax.Precision.HIGHEST)
    dead = jax.lax.broadcasted_iota(
        jnp.int32, (1, delta.shape[0]), 1) >= count
    sims_d = jnp.where(dead, -jnp.inf, sims_d)
    return _select_topk(jnp.concatenate([sims_m, sims_d], axis=1), k + 1)


class TrackResolverMixin:
    """Query-param resolution + result formatting shared by every
    serving index (EmbeddingIndex/HybridIndex here, and
    parallel.ShardedServingFrontend): needs `n`, `track_ids`, `row_of`,
    `tracks_meta` on self.  One implementation so the HTTP query-param
    semantics cannot drift between the single-chip and sharded
    surfaces."""

    def _format_item(self, score: float, idx: int) -> dict:
        tid = self.track_ids[int(idx)]
        item = {"track": tid, "index": int(idx),
                "score": round(float(score), 6)}
        meta = self.tracks_meta.get(tid)
        if meta:
            item["name"] = meta.get("name")
            item["artist"] = meta.get("artist")
        return item

    def resolve(self, params: dict) -> int:
        if "index" in params:
            row = int(params["index"][0])
            if not 0 <= row < self.n:
                raise KeyError(f"index {row} out of range")
            if row in getattr(self, "_tombstones", ()):
                raise KeyError(f"index {row} was removed")
            return row
        tid = params["track"][0]
        if tid not in self.row_of:
            raise KeyError(f"unknown track {tid!r}")
        return self.row_of[tid]

    def resolve_many(self, params: dict) -> list[int]:
        """Comma-separated `tracks=` / `indices=` query params -> rows."""
        if "indices" in params:
            rows = [int(x) for x in params["indices"][0].split(",") if x]
            dead = getattr(self, "_tombstones", ())
            for row in rows:
                if not 0 <= row < self.n:
                    raise KeyError(f"index {row} out of range")
                if row in dead:
                    raise KeyError(f"index {row} was removed")
        else:
            rows = []
            for tid in params["tracks"][0].split(","):
                if tid not in self.row_of:
                    raise KeyError(f"unknown track {tid!r}")
                rows.append(self.row_of[tid])
        if not rows:
            raise ValueError("empty query list")
        return rows


class EmbeddingIndex(TrackResolverMixin):
    """Device-resident kNN index over a track embedding matrix.

    quantized=True stores the table as int8 rows + per-row scales (4x less
    HBM, int8 MXU contraction — ops/quantize.py).  Measured quality cost
    (results/serve_int8.json, chip-measured on the 20k hard benchmark,
    scripts/serve_int8_quality.py): on margin-0.1 embeddings int8 ranking
    is lossless within noise — hit@100 -0.18%, MRR -0.7% (tie-fair
    average-rank on both sides).  Embeddings trained at the reference's
    tiny margin
    (1e-5) separate by ~1e-4 cosine — BELOW int8 resolution — and measure
    a 97-98% hit@100/MRR collapse under int8 scoring; train with
    margin >= 0.1 (RunConfig.recommended()) before enabling it
    (RESULTS.md "Matmul precision")."""

    def __init__(self, embeddings: np.ndarray,
                 track_ids: Optional[list[str]] = None,
                 tracks_meta: Optional[dict] = None,
                 quantized: bool = False,
                 k_cap: int = 128):
        emb = np.asarray(embeddings, dtype=np.float32)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        unit = emb / np.maximum(norms, 1e-12)
        # host copy: /embed lookups and quantized query rows read it
        # without touching the device (keeps ALL device work on the
        # single-dispatch path)
        self.unit_host = unit
        self.quantized = quantized
        if quantized:
            from gcn_song_embeddings_tpu.ops.quantize import quantize_rows

            self.q_values, self.q_scales = quantize_rows(jnp.asarray(unit))
            # query rows stay HOST-side numpy: keeping the full f32 matrix
            # in HBM next to the int8 table would defeat the 4x saving
            self.unit = unit
        else:
            self.unit = jnp.asarray(unit)
        self.n, self.dim = emb.shape
        # fixed top-k width: every batched device call computes
        # top-(k_cap+1) so the jit cache has ONE entry per batch bucket,
        # not one per distinct requested k
        self._k_cap_req = k_cap       # re-clamped when the catalog grows
        self.k_cap = max(min(k_cap, self.n - 1), 1)
        self.track_ids = list(track_ids) if track_ids else [
            str(i) for i in range(self.n)]
        self.row_of = {tid: i for i, tid in enumerate(self.track_ids)}
        # copy: add_tracks updates this — never mutate the caller's dict
        # (from_run passes graph.tracks)
        self.tracks_meta = dict(tracks_meta) if tracks_meta else {}
        # online catalog adds (add_tracks): new rows live in a
        # power-of-two device delta buffer scored alongside the main
        # table in the same dispatch until compact() folds them in
        self._n_main = self.n
        self._delta_host = np.zeros((0, self.dim), np.float32)
        self._delta_dev = None
        # online removals (remove_tracks): tombstoned rows are zeroed
        # (cosine EXACTLY 0 — below every positively-similar neighbor)
        # and filtered from formatted results; row ids are never reused
        self._tombstones: set[int] = set()

    def remove_tracks(self, tracks) -> list[int]:
        """Remove tracks from a LIVE index (no rebuild, no downtime).

        Each removed row is tombstoned: its embedding is zeroed on
        device (one fused row update; on int8 indexes the per-row scale
        drops to 0 so its score is EXACTLY 0), it disappears from
        formatted results and id resolution, and its row id is never
        reused.  A zero row can only displace candidates with
        non-positive cosine, so positively-similar top-k results are
        unaffected.  Accepts track-id strings or integer rows; returns
        the removed rows."""
        rows = []
        for t in tracks:
            if isinstance(t, str):
                if t not in self.row_of:
                    raise KeyError(f"unknown track {t!r}")
                rows.append(self.row_of[t])
            else:
                row = int(t)
                if not 0 <= row < self.n:
                    raise KeyError(f"index {row} out of range")
                if row in self._tombstones:
                    raise KeyError(f"row {row} already removed")
                rows.append(row)
        rows = sorted(set(rows))
        self._tombstones.update(rows)
        arr = np.asarray(rows, np.int32)
        self.unit_host[arr] = 0.0
        main = arr[arr < self._n_main]
        delta = arr[arr >= self._n_main] - self._n_main
        if delta.size:
            self._delta_host[delta] = 0.0
        if main.size:
            if self.quantized:
                self.q_values = self.q_values.at[jnp.asarray(main)].set(0)
                self.q_scales = self.q_scales.at[jnp.asarray(main)].set(0.0)
            else:
                self.unit = self.unit.at[jnp.asarray(main)].set(0.0)
        if delta.size and self._delta_dev is not None:
            self._delta_dev = self._delta_dev.at[
                jnp.asarray(delta)].set(0.0)
        for row in rows:
            self.row_of.pop(self.track_ids[row], None)
        if len(self._tombstones) > self.k_cap // 2:
            import warnings

            warnings.warn(
                f"{len(self._tombstones)} tombstones vs top-k window "
                f"{self.k_cap + 1}: queries whose live candidates have "
                f"non-positive cosine may return short lists — rebuild "
                f"the index to reclaim the slots", RuntimeWarning,
                stacklevel=2)
        return rows

    def add_tracks(self, embeddings: np.ndarray,
                   track_ids: Optional[list[str]] = None,
                   tracks_meta: Optional[dict] = None) -> list[int]:
        """Append new tracks to a LIVE index (no rebuild, no downtime).

        New rows are L2-normalized and staged in a device-side delta
        buffer (power-of-two capacity, so repeated adds reuse the jit
        entries); every query then scores main table + delta in one
        dispatch (`_query_topk_batch_delta`).  On a quantized index the
        delta is scored f32 — exact until `compact()` folds it into the
        int8 table.  Returns the new global row ids.  The reference has
        no serving at all, let alone online updates; this is the
        embedding-side half of catalog growth (the walk side is
        ops/ppr.refresh_neighborhoods)."""
        emb = np.asarray(embeddings, dtype=np.float32)
        if emb.ndim != 2 or emb.shape[1] != self.dim:
            raise ValueError(f"expected [*, {self.dim}] embeddings, "
                             f"got {emb.shape}")
        m = emb.shape[0]
        if m == 0:
            return []
        ids = (list(track_ids) if track_ids
               else [str(self.n + i) for i in range(m)])
        if len(ids) != m:
            raise ValueError(f"{m} embeddings but {len(ids)} track ids")
        dup = [t for t in ids if t in self.row_of]
        if dup or len(set(ids)) != len(ids):
            raise KeyError(f"duplicate track ids: {(dup or ids)[:3]}")
        unit = emb / np.maximum(
            np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        rows = list(range(self.n, self.n + m))
        self._delta_host = np.concatenate([self._delta_host, unit])
        self.unit_host = np.concatenate([self.unit_host, unit])
        if self.quantized:
            self.unit = self.unit_host     # host alias (query-row gather)
        for tid, row in zip(ids, rows):
            self.track_ids.append(tid)
            self.row_of[tid] = row
        if tracks_meta:
            self.tracks_meta.update(tracks_meta)
        self.n += m
        # a grown catalog can serve wider lists: re-clamp to the
        # requested cap (a k_cap change is a one-time jit re-entry)
        self.k_cap = max(min(self._k_cap_req, self.n - 1), 1)
        if self._n_main + len(self._delta_host) != self.n:
            raise RuntimeError("index bookkeeping corrupted: "
                               f"{self._n_main} main + "
                               f"{len(self._delta_host)} delta != {self.n}")
        # bounded delta: past ~1/16 of the main table (min 1024 rows)
        # fold automatically — the delta exists to amortize small adds,
        # not to shadow the catalog (every add re-uploads the buffer and
        # every query pays the two-matmul kernel while it is live)
        if len(self._delta_host) >= max(1024, self._n_main // 16):
            self.compact()
            return rows
        # (re)upload the delta at its power-of-two capacity
        cap = 1 << (len(self._delta_host) - 1).bit_length()
        buf = np.zeros((cap, self.dim), np.float32)
        buf[: len(self._delta_host)] = self._delta_host
        self._delta_dev = jnp.asarray(buf)
        return rows

    def compact(self) -> None:
        """Fold the online-add delta into the main device table (one
        re-upload; re-quantizes on an int8 index).  Queries return to the
        single-matmul kernels."""
        # guard on the HOST staging buffer: the auto-fold path calls
        # compact() before the device delta was ever uploaded (a
        # _delta_dev-is-None guard here silently no-op'd and corrupted
        # the index: n grew but no table held the new rows)
        if len(self._delta_host) == 0:
            return
        if self.quantized:
            from gcn_song_embeddings_tpu.ops.quantize import quantize_rows

            self.q_values, self.q_scales = quantize_rows(
                jnp.asarray(self.unit_host))
            self.unit = self.unit_host
        else:
            self.unit = jnp.asarray(self.unit_host)
        self._n_main = self.n
        self._delta_host = np.zeros((0, self.dim), np.float32)
        self._delta_dev = None

    @classmethod
    def from_run(cls, emb_path: str, graph=None,
                 quantized: bool = False) -> "EmbeddingIndex":
        emb = np.load(emb_path)
        if graph is not None:
            return cls(emb, graph.track_ids, graph.tracks,
                       quantized=quantized)
        return cls(emb, quantized=quantized)

    def knn(self, row: int, k: int = 10) -> list[dict]:
        if row in self._tombstones:
            raise KeyError(f"index {row} was removed")
        if self._delta_dev is not None:
            # delta outstanding: the single-query kernels only see the
            # main table — route through the delta-aware batched path
            return self.knn_rows(np.asarray([row]), k)[0]
        # the +1/+2 self-slack must never push top_k past the table size;
        # catalogs too small for the int8 kernel's +2 slack still have
        # valid neighbors — serve them via the exact path
        use_quantized = self.quantized and self.n > 2
        slack = 2 if use_quantized else 1
        if self.n <= slack:
            return []
        k = max(min(k, self.n - slack), 1)
        if use_quantized:
            from gcn_song_embeddings_tpu.ops.quantize import int8_topk

            w, n = int8_topk(self.q_values, self.q_scales,
                             jnp.asarray(self.unit[row][None, :]), k + 2)
            w, n = np.asarray(w[0]), np.asarray(n[0])
        else:
            w, n = _query_topk(self.unit, jnp.int32(row), k)
            w, n = np.asarray(w), np.asarray(n)
        return self._format(w, n, row, k)

    def _format(self, w: np.ndarray, n: np.ndarray, row: int, k: int
                ) -> list[dict]:
        # filter self BY ID (duplicate embeddings can tie-break the
        # duplicate into slot 0 and the query into slot 1)
        keep = n != row
        if self._tombstones:
            keep &= ~np.isin(n, list(self._tombstones))
        w, n = w[keep][:k], n[keep][:k]
        return [self._format_item(score, idx)
                for score, idx in zip(np.asarray(w), np.asarray(n))]

    def knn_rows(self, rows: np.ndarray, k: int = 10) -> list[list[dict]]:
        """Batched kNN: ONE device call for all query rows.

        Rows are padded to a power-of-two bucket so repeated batch sizes
        hit the jit cache; the top-k width is the fixed self.k_cap."""
        rows = np.asarray(rows)
        if rows.size == 0:
            return []
        if rows.min() < 0 or rows.max() >= self.n:
            # XLA clamps out-of-bounds gathers silently — fail loudly here
            raise IndexError(f"query rows outside [0, {self.n})")
        # a tombstoned QUERY row yields [] for that row only: raising
        # would poison every other client coalesced into the same
        # QueryBatcher batch when a /remove races a /knn (direct id
        # lookups still 400 via resolve())
        dead_q = (np.isin(rows, list(self._tombstones))
                  if self._tombstones else np.zeros(rows.shape, bool))
        rows = rows.astype(np.int32)
        if self.n <= 3 and self._delta_dev is None:  # tiny: exact path
            return [[] if int(r) in self._tombstones
                    else self.knn(int(r), k) for r in rows]
        k = max(min(k, self.k_cap, self.n - 1), 1)
        b = 1 << (int(rows.size) - 1).bit_length()         # next pow2
        padded = np.zeros((b,), np.int32)
        padded[: rows.size] = rows
        if self._delta_dev is not None:
            # online-add delta outstanding: score main + delta in one
            # dispatch; query rows gathered host-side (they may be
            # delta rows themselves).  The delta kernels handle any
            # catalog size (top width k+1 <= n <= main+cap).
            q = jnp.asarray(self.unit_host[padded])
            count = jnp.int32(len(self._delta_host))
            if self.quantized:
                w, n = _query_topk_batch_delta_int8(
                    self.q_values, self.q_scales, self._delta_dev, q,
                    count, self.k_cap)
            else:
                w, n = _query_topk_batch_delta(
                    self.unit, self._delta_dev, q, count, self.k_cap)
        elif self.quantized and self.n > 2:
            from gcn_song_embeddings_tpu.ops.quantize import int8_topk

            w, n = int8_topk(self.q_values, self.q_scales,
                             jnp.asarray(self.unit_host[padded]),
                             min(self.k_cap + 2, self.n))
        else:
            w, n = _query_topk_batch(self.unit, jnp.asarray(padded),
                                     self.k_cap)
        w, n = np.asarray(w), np.asarray(n)
        return [[] if dead_q[i] else self._format(w[i], n[i],
                                                  int(rows[i]), k)
                for i in range(rows.size)]

    def embed(self, row: int) -> np.ndarray:
        return np.asarray(self.unit_host[row])


class HybridIndex(EmbeddingIndex):
    """Device-resident hybrid (walk-head + embedding-tail) kNN index.

    Serves the WalkEmbedHybrid ranker (models/baselines/simple.py) — the
    round-4 roster winner on all six metrics — online: each batched query
    runs restart walks over the colisten-augmented graph, cosine top-k
    over the embedding table, and the sort-based merge in ONE device
    dispatch (`_hybrid_topk_batch`), so the QueryBatcher coalesces hybrid
    queries exactly like embedding-only ones.  The reference's query-time
    PPR capability (/root/reference/baselines.py:107-151) is the walk
    head here; the reference has no serving path at all.

    `device_graph` is the bipartite graph to walk; pass `train_pairs` +
    `colisten_copies` >= 1 to materialize co-listen pseudo-collections
    first (data/device.augment_with_colisten — the augmentation that makes
    the walk head precise).  `parallel_chains` splits each query's hop
    budget across lockstep chains: latency drops ~chains-fold (the hop
    scan shortens) at a slight distribution perturbation (ops/walks.py).

    Alternatively pass `nbhds=(weights, nodes)` — the precomputed
    neighborhoods artifact — to serve the walk head from CACHE: two row
    gathers + merge per query instead of a walk scan (deterministic,
    embedding-only-class latency; head truncated at the artifact's T).
    """

    def __init__(self, embeddings: np.ndarray, device_graph=None,
                 train_pairs: Optional[np.ndarray] = None,
                 colisten_copies: int = 1,
                 n_hops: int = 1000, alpha: float = 0.85,
                 parallel_chains: int = 1, seed: int = 0,
                 track_ids: Optional[list[str]] = None,
                 tracks_meta: Optional[dict] = None,
                 quantized: bool = False, k_cap: int = 128,
                 nbhds: Optional[tuple] = None):
        super().__init__(embeddings, track_ids, tracks_meta,
                         quantized=quantized, k_cap=k_cap)
        if nbhds is not None:
            # cached-head mode: walk head = the precomputed top-T
            # artifact (two gathers per query, deterministic, no walk
            # scan — see _hybrid_topk_batch_cached)
            self.nbhd_w = jnp.asarray(nbhds[0], dtype=jnp.float32)
            self.nbhd_n = jnp.asarray(nbhds[1], dtype=jnp.int32)
            self.tables = None
            return
        if device_graph is None:
            raise ValueError("HybridIndex needs device_graph (query-time "
                             "walks) or nbhds (precomputed head)")
        from gcn_song_embeddings_tpu.data.device import (
            augment_with_colisten,
        )
        from gcn_song_embeddings_tpu.ops.ppr import effective_chains
        from gcn_song_embeddings_tpu.ops.walks import fused_walk_tables

        self.nbhd_w = None
        if train_pairs is not None and colisten_copies > 0:
            device_graph = augment_with_colisten(
                device_graph, np.asarray(train_pairs), colisten_copies)
        self.tables = fused_walk_tables(device_graph)
        self.n_hops = n_hops
        self.alpha = alpha
        self.n_chains = effective_chains(n_hops, parallel_chains)
        self._key = jax.random.PRNGKey(seed)
        self._dispatches = 0

    def add_tracks(self, embeddings, track_ids=None, tracks_meta=None):
        raise NotImplementedError(
            "online adds are an EmbeddingIndex capability: the hybrid's "
            "walk head needs the new tracks in the graph/neighborhoods "
            "artifact first (ops.ppr.refresh_neighborhoods), then rebuild")

    def knn(self, row: int, k: int = 10) -> list[dict]:
        # route the single-query path through the batched hybrid kernel
        # (bucket 1) so walk randomness/merge semantics are identical
        return self.knn_rows(np.asarray([row]), k)[0]

    def knn_rows(self, rows: np.ndarray, k: int = 10) -> list[list[dict]]:
        rows = np.asarray(rows)
        if rows.size == 0:
            return []
        if rows.min() < 0 or rows.max() >= self.n:
            raise IndexError(f"query rows outside [0, {self.n})")
        if self._tombstones and np.isin(
                rows, list(self._tombstones)).any():
            # hybrid removal support is partial (the walk-head artifact
            # still lists removed rows as candidates — filtered by
            # _format); querying BY a removed row is always an error
            raise KeyError("query row was removed")
        rows = rows.astype(np.int32)
        k = max(min(k, self.k_cap, self.n - 1), 1)
        b = 1 << (int(rows.size) - 1).bit_length()         # next pow2
        padded = np.zeros((b,), np.int32)
        padded[: rows.size] = rows
        if self.tables is None:                            # cached head
            if self.quantized:
                w, n = _hybrid_topk_batch_cached_int8(
                    self.nbhd_w, self.nbhd_n, self.q_values,
                    self.q_scales, jnp.asarray(self.unit_host[padded]),
                    jnp.asarray(padded), self.k_cap)
            else:
                w, n = _hybrid_topk_batch_cached(
                    self.nbhd_w, self.nbhd_n, self.unit,
                    jnp.asarray(padded), self.k_cap)
        elif self.quantized:
            key = jax.random.fold_in(self._key, self._dispatches)
            self._dispatches += 1
            w, n = _hybrid_topk_batch_int8(
                self.tables, self.q_values, self.q_scales,
                jnp.asarray(self.unit_host[padded]), jnp.asarray(padded),
                key, self.n_hops, self.alpha, self.k_cap, self.n_chains)
        else:
            key = jax.random.fold_in(self._key, self._dispatches)
            self._dispatches += 1
            w, n = _hybrid_topk_batch(
                self.tables, self.unit, jnp.asarray(padded), key,
                self.n_hops, self.alpha, self.k_cap, self.n_chains)
        w, n = np.asarray(w), np.asarray(n)
        return [self._format(w[i], n[i], int(rows[i]), k)
                for i in range(rows.size)]


class QueryBatcher:
    """Serializes + coalesces device queries behind ONE dispatcher thread.

    Request threads enqueue (rows, k) work items and block on a Future;
    the dispatcher drains whatever is queued (up to max_batch rows),
    issues one batched device call via `EmbeddingIndex.knn_rows`, and
    fulfills the futures.  Under concurrent load, queries that arrive
    while a device call is in flight pile up and ride the NEXT call —
    adaptive micro-batching with no added idle latency for a lone query.

    This is the only thing that touches the device once serving starts,
    which is what makes `ThreadingHTTPServer` safe on the tunneled axon
    platform (one in-flight dispatch at a time) — and faster everywhere
    (one [B, N] MXU matmul instead of B matvec dispatches)."""

    def __init__(self, index: EmbeddingIndex, max_batch: int = 64):
        self.index = index
        self.max_batch = max_batch
        self._q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="knn-dispatch")
        self._stopped = False
        self._thread.start()

    def stop(self) -> None:
        self._stopped = True
        self._q.put(None)

    def knn(self, row: int, k: int) -> list[dict]:
        return self.knn_many([row], k)[0]

    def knn_many(self, rows, k: int) -> list[list[dict]]:
        fut: Future = Future()
        self._q.put((list(rows), k, fut))
        return fut.result()

    def add_tracks(self, emb, track_ids, tracks_meta) -> list[int]:
        """Online catalog add, serialized through the dispatcher thread
        (the delta upload is device work — same one-dispatch-at-a-time
        rule as queries)."""
        fut: Future = Future()
        self._q.put(("__add__", (emb, track_ids, tracks_meta), fut))
        return fut.result()

    def remove_tracks(self, tracks) -> list[int]:
        """Online removal, serialized like adds (the row zeroing is a
        device update)."""
        fut: Future = Future()
        self._q.put(("__remove__", (tracks,), fut))
        return fut.result()

    def _do_add(self, item) -> None:
        op, args, fut = item
        try:
            fn = (self.index.add_tracks if op == "__add__"
                  else self.index.remove_tracks)
            fut.set_result(fn(*args))
        except Exception as e:
            fut.set_exception(e)

    def _loop(self) -> None:
        while True:
            item = self._q.get()
            if item is None or self._stopped:
                return
            if isinstance(item[0], str):       # "__add__": run alone
                self._do_add(item)
                continue
            batch = [item]
            n_rows = len(item[0])
            pending_add = None
            # drain whatever else is already queued (coalesce concurrent
            # clients into one device call) without waiting
            while n_rows < self.max_batch:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    self._q.put(None)      # re-signal stop after this drain
                    break
                if isinstance(nxt[0], str):    # add: after this batch
                    pending_add = nxt
                    break
                batch.append(nxt)
                n_rows += len(nxt[0])
            all_rows = [r for rows, _, _ in batch for r in rows]
            kmax = max(k for _, k, _ in batch)
            try:
                results = self.index.knn_rows(np.asarray(all_rows), kmax)
            except Exception as e:  # fulfil every waiter with the error
                for _, _, fut in batch:
                    fut.set_exception(e)
                if pending_add is not None:
                    self._do_add(pending_add)
                continue
            off = 0
            for rows, k, fut in batch:
                per = [nbrs[:k] for nbrs in results[off: off + len(rows)]]
                off += len(rows)
                fut.set_result(per)
            if pending_add is not None:
                self._do_add(pending_add)


def make_handler(index: EmbeddingIndex, batcher: QueryBatcher | None = None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            params = parse_qs(url.query)
            try:
                if url.path == "/healthz":
                    self._json(200, {
                        "status": "ok", "tracks": index.n,
                        "dim": index.dim,
                        "removed": len(getattr(index, "_tombstones", ()))})
                elif url.path == "/knn":
                    k = min(int(params.get("k", ["10"])[0]), index.n - 1)
                    if "tracks" in params or "indices" in params:
                        rows = index.resolve_many(params)
                        nbrs = (batcher.knn_many(rows, k) if batcher
                                else index.knn_rows(np.asarray(rows), k))
                        self._json(200, {
                            "queries": [index.track_ids[r] for r in rows],
                            "neighbors": nbrs})
                    else:
                        row = index.resolve(params)
                        nbrs = (batcher.knn(row, k) if batcher
                                else index.knn(row, k))
                        self._json(200, {"query": index.track_ids[row],
                                         "neighbors": nbrs})
                elif url.path == "/embed":
                    row = index.resolve(params)
                    self._json(200, {"track": index.track_ids[row],
                                     "embedding":
                                     index.embed(row).tolist()})
                else:
                    self._json(404, {"error": f"no route {url.path}"})
            except (KeyError, ValueError, IndexError) as e:
                self._json(400, {"error": str(e)})

        def do_POST(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            if url.path not in ("/add", "/remove"):
                self._json(404, {"error": f"no route {url.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length))
                tracks = payload["tracks"]
                if url.path == "/remove":
                    rows = (batcher.remove_tracks(tracks) if batcher
                            else index.remove_tracks(tracks))
                    self._json(200, {"removed": rows,
                                     "tracks": index.n})
                    return
                emb = np.asarray([t["embedding"] for t in tracks],
                                 dtype=np.float32)
                ids = [t["track"] for t in tracks]
                meta = {t["track"]: {f: t[f] for f in ("name", "artist")
                                     if f in t}
                        for t in tracks if ("name" in t or "artist" in t)}
                rows = (batcher.add_tracks(emb, ids, meta) if batcher
                        else index.add_tracks(emb, ids, meta))
                self._json(200, {"added": ids, "rows": rows,
                                 "tracks": index.n})
            except (KeyError, ValueError, TypeError,
                    NotImplementedError, json.JSONDecodeError) as e:
                # TypeError covers malformed payload shapes (np.asarray
                # of ragged embeddings); genuine server bugs surface as
                # 500s with tracebacks instead of masquerading as 400s
                self._json(400, {"error": str(e)})

    return Handler


def serve(index: EmbeddingIndex, host: str = "127.0.0.1", port: int = 8800,
          batched: bool = True) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call .serve_forever() or run it
    in a thread; .shutdown() to stop).

    batched=True (default) routes every device query through a
    QueryBatcher dispatcher thread (see its docstring) — required for
    concurrent clients on the tunneled axon platform and faster under
    load everywhere.  The batcher is exposed as `server.batcher`; the
    overridden `server_close` stops it."""
    batcher = QueryBatcher(index) if batched else None
    server = ThreadingHTTPServer((host, port), make_handler(index, batcher))
    server.batcher = batcher

    if batcher is not None:
        orig_close = server.server_close

        def close_all():
            batcher.stop()
            orig_close()

        server.server_close = close_all
    return server


def _cached_head_artifacts(dataset_dir: str, colisten: int):
    """Resolve the cached-head hybrid's inputs for a dataset dir: load
    the train positives, apply the colisten config (shared cache-naming
    helper), and sweep/load the neighborhoods artifact.  One recipe for
    BOTH the single-chip and the sharded serve paths — keep them from
    diverging."""
    from gcn_song_embeddings_tpu.config import WalkConfig
    from gcn_song_embeddings_tpu.data import SongGraph
    from gcn_song_embeddings_tpu.data.device import (
        DeviceGraph,
        apply_colisten_config,
    )
    from gcn_song_embeddings_tpu.ops.ppr import precompute_neighborhoods

    graph = SongGraph(dataset_dir)
    train_pos, _ = graph.load_positives_split(
        os.path.join(dataset_dir, "positives.json"))
    wcfg = WalkConfig(colisten_copies=colisten)
    dg, nb_path = apply_colisten_config(
        DeviceGraph.from_graph(graph), train_pos, wcfg,
        os.path.join(dataset_dir, "neighborhoods.npz"))
    nbhds = precompute_neighborhoods(dg, wcfg, nb_path, verbose=True)
    return graph, train_pos, nbhds


def main() -> None:
    import argparse

    from gcn_song_embeddings_tpu.data import SongGraph

    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--emb", required=True, help="path to emb.npy")
    ap.add_argument("--dataset", default=None,
                    help="dataset dir for track metadata")
    ap.add_argument("--port", type=int, default=8800)
    ap.add_argument("--int8", action="store_true",
                    help="serve a quantized index (4x less HBM)")
    ap.add_argument("--hybrid", action="store_true",
                    help="serve the WalkEmbedHybrid ranker: walk head "
                         "over the dataset graph + embedding tail, "
                         "merged on device (requires --dataset)")
    ap.add_argument("--colisten", type=int, default=1,
                    help="colisten copies for the hybrid walk graph")
    ap.add_argument("--hops", type=int, default=1000,
                    help="hybrid walk hops per query")
    ap.add_argument("--chains", type=int, default=1,
                    help="split the hybrid hop budget across this many "
                         "lockstep chains (lower latency, slight "
                         "distribution perturbation)")
    ap.add_argument("--cached-head", action="store_true",
                    help="hybrid walk head from the precomputed "
                         "neighborhoods artifact (no per-query walks: "
                         "deterministic, embedding-class latency; "
                         "sweeps the artifact first if absent)")
    ap.add_argument("--sharded", action="store_true",
                    help="row-shard the catalog over ALL local devices "
                         "(parallel.ShardedServeIndex; for catalogs past "
                         "one device's HBM).  Combines with --int8 and, "
                         "via --hybrid --cached-head, with the hybrid "
                         "ranker; live-walk --hybrid is single-chip only")
    args = ap.parse_args()
    graph = SongGraph(args.dataset) if args.dataset else None
    if args.sharded:
        from gcn_song_embeddings_tpu.parallel.serve_sharded import (
            ShardedServeIndex,
            ShardedServingFrontend,
        )

        nbhds = None
        if args.hybrid:
            if not args.cached_head:
                ap.error("--sharded --hybrid requires --cached-head "
                         "(per-query walk scans don't shard)")
            if graph is None:
                ap.error("--hybrid requires --dataset")
            graph, _, nbhds = _cached_head_artifacts(args.dataset,
                                                     args.colisten)
        sindex = ShardedServeIndex(np.load(args.emb), nbhds=nbhds,
                                   quantized=args.int8)
        index = ShardedServingFrontend(
            sindex,
            track_ids=graph.track_ids if graph else None,
            tracks_meta=graph.tracks if graph else None)
        index.knn_rows(np.arange(min(2, index.n)), 10)   # warm a bucket
        print(f"serving {index.n} tracks on :{args.port} "
              f"(sharded over {sindex.mesh.shape['graph']} devices)")
        serve(index, port=args.port).serve_forever()
        return
    if args.hybrid:
        from gcn_song_embeddings_tpu.data.device import DeviceGraph

        if graph is None:
            ap.error("--hybrid requires --dataset (the graph to walk)")
        if args.cached_head:
            graph, _, nbhds = _cached_head_artifacts(args.dataset,
                                                     args.colisten)
            index = HybridIndex(
                np.load(args.emb), nbhds=nbhds,
                track_ids=graph.track_ids, tracks_meta=graph.tracks,
                quantized=args.int8)
        else:
            train_pos, _ = graph.load_positives_split(
                os.path.join(args.dataset, "positives.json"))
            index = HybridIndex(
                np.load(args.emb), DeviceGraph.from_graph(graph),
                train_pairs=train_pos, colisten_copies=args.colisten,
                n_hops=args.hops, parallel_chains=args.chains,
                track_ids=graph.track_ids, tracks_meta=graph.tracks,
                quantized=args.int8)
    else:
        index = EmbeddingIndex.from_run(args.emb, graph,
                                        quantized=args.int8)
    index.knn(0, 10)                       # warm the single-query jit
    index.knn_rows(np.arange(min(2, index.n)), 10)  # warm a batched bucket
    print(f"serving {index.n} tracks on :{args.port}")
    serve(index, port=args.port).serve_forever()


if __name__ == "__main__":
    main()
