"""Catalog-sharded serving: distributed kNN / hybrid retrieval on a mesh.

Single-chip serving (serve.py) keeps the whole [N, d] embedding table —
and, for the hybrid, the [N, T] neighborhoods artifact — resident in one
device's HBM.  At catalog sizes past ~10M rows (or with f32 tables and a
fat T) that stops fitting, and the reference has nothing to say about it
(its retrieval is an offline eval cache, eval.py:52-143).  This module is
the multi-chip serving path: tables are ROW-SHARDED over a ``graph`` mesh
axis and each query fans out as the classic distributed-MIPS schedule:

    1. gather the query's embedding rows from the sharded table
       (parallel/gather.sharded_table_gather — all_gather ids +
       psum_scatter rows, riding ICI),
    2. every device scores the replicated queries against ITS catalog
       shard on the MXU and takes a LOCAL top-k (via the serving
       selection primitive serve._select_topk — ApproxTopK at
       recall 1.0, score-exact, kernel-measured 1.2-1.3x over sort
       at this k/N regime),
    3. `all_gather` the [g, B, k] candidate lists (k·g rows per query —
       tiny next to the [B, N/g] score panels that never leave a device),
    4. re-rank the g·k candidates with one replicated top-k.

Scores are identical to the single-chip kernels bit-for-bit (the same
dot products at precision=HIGHEST, see ops/knn.py), so results match
serve.py's exactly up to ties between equal scores (broken by candidate
position here vs global row id there — only duplicate embeddings tie).

The hybrid (walk-head + embedding-tail, the roster winner — RESULTS.md
round 4) serves from the precomputed neighborhoods artifact exactly like
serve.HybridIndex's cached-head mode: the [N, T] head tables are sharded
alongside the embeddings, a query's head row rides the same collective
gather, and the device-side merge (ops/merge.merge_topk) runs replicated
on the re-ranked tail.  int8 tails shard the (values, scales) pair and
score with ops/quantize.int8_scores — the exact math the quality
artifact certifies (results/serve_int8.json).

Validated on the virtual 8-device CPU mesh (tests/test_serve_sharded.py)
and exercised by `__graft_entry__.dryrun_multichip`; on real hardware the
collectives ride ICI unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcn_song_embeddings_tpu.ops.merge import merge_topk
from gcn_song_embeddings_tpu.serve import TrackResolverMixin, _select_topk
from gcn_song_embeddings_tpu.ops.quantize import int8_scores, quantize_rows
from gcn_song_embeddings_tpu.parallel.gather import (
    sharded_table_gather,
    sharded_table_gather_ring,
)
from gcn_song_embeddings_tpu.parallel.mesh import pad_to_multiple


def _local_scores(emb_local: jnp.ndarray, q: jnp.ndarray,
                  rows: jnp.ndarray, n_valid: int, axis_name: str
                  ) -> jnp.ndarray:
    """[B, N/g] cosine scores of replicated queries vs the local shard,
    with the query's own row and the pad rows masked to -inf."""
    my = lax.axis_index(axis_name)
    shard_rows = emb_local.shape[0]
    sims = jnp.dot(q, emb_local.T,
                   precision=jax.lax.Precision.HIGHEST)      # [B, N/g]
    cols = my * shard_rows + lax.broadcasted_iota(
        jnp.int32, (1, shard_rows), 1)                       # global ids
    self_mask = cols == rows[:, None]
    pad_mask = cols >= n_valid
    return jnp.where(self_mask | pad_mask, -jnp.inf, sims)


def _local_scores_int8(values_local: jnp.ndarray, scales_local: jnp.ndarray,
                       q: jnp.ndarray, rows: jnp.ndarray, n_valid: int,
                       axis_name: str) -> jnp.ndarray:
    """int8 variant of `_local_scores` (ops/quantize.int8_scores math)."""
    my = lax.axis_index(axis_name)
    shard_rows = values_local.shape[0]
    sims = int8_scores(values_local, scales_local, q)        # [B, N/g]
    cols = my * shard_rows + lax.broadcasted_iota(
        jnp.int32, (1, shard_rows), 1)
    return jnp.where((cols == rows[:, None]) | (cols >= n_valid),
                     -jnp.inf, sims)


def _rerank(w_loc: jnp.ndarray, i_loc: jnp.ndarray, k: int,
            axis_name: str) -> tuple[jnp.ndarray, jnp.ndarray]:
    """all_gather local [B, k] candidates and re-rank to the global top-k
    (replicated on every device — g·k candidates per query)."""
    w_all = lax.all_gather(w_loc, axis_name)          # [g, B, k]
    n_all = lax.all_gather(i_loc, axis_name)
    g = w_all.shape[0]
    B = w_all.shape[1]
    w_cat = jnp.transpose(w_all, (1, 0, 2)).reshape(B, g * k)
    n_cat = jnp.transpose(n_all, (1, 0, 2)).reshape(B, g * k)
    w, idx = lax.top_k(w_cat, k)
    return w, jnp.take_along_axis(n_cat, idx, axis=1)


class ShardedServeIndex:
    """Serving index with the catalog row-sharded over a 1-axis mesh.

    Args:
      embeddings: [N, d] float array (rows are L2-normalized internally,
        like serve.EmbeddingIndex).
      mesh: a `jax.sharding.Mesh` with a ``graph`` axis (any other axes
        must have size 1), or None to build a 1-D mesh over all devices.
      nbhds: optional (weights [N, T], nodes [N, T]) precomputed
        neighborhoods artifact — enables `hybrid_knn` (cached walk head,
        serve.HybridIndex semantics).
      quantized: score the embedding tail on an int8 table (sharded
        values+scales, ops/quantize.py).  The f32 table is still used for
        query rows (gathered per query), matching serve.py's int8 path.
      k_cap: fixed top-k width of every device call (one jit entry per
        batch bucket).  Must satisfy k_cap <= N_padded / g (each shard
        must be able to supply k candidates).
    """

    def __init__(self, embeddings: np.ndarray, mesh: Optional[Mesh] = None,
                 nbhds: Optional[tuple] = None, quantized: bool = False,
                 k_cap: int = 128, gather_impl: str = "psum_scatter"):
        if gather_impl not in ("psum_scatter", "ring"):
            raise ValueError(
                f"gather_impl must be 'psum_scatter' or 'ring', "
                f"got {gather_impl!r}")
        # same two bit-equivalent collective schedules as ShardedTrainer
        # (parallel/gather.py): ring overlaps per-hop local gathers with
        # the in-flight ppermute -- prefer it for large row payloads
        self._gather = (sharded_table_gather_ring if gather_impl == "ring"
                        else sharded_table_gather)
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), axis_names=("graph",))
        if "graph" not in mesh.axis_names:
            raise ValueError(f"mesh {mesh.axis_names} has no 'graph' axis")
        for ax in mesh.axis_names:
            if ax != "graph" and mesh.shape[ax] != 1:
                raise ValueError(
                    f"serving mesh axis {ax!r} must have size 1 "
                    f"(got {mesh.shape[ax]}) — dp has no meaning here")
        self.mesh = mesh
        g = mesh.shape["graph"]

        emb = np.asarray(embeddings, dtype=np.float32)
        self.n, self.dim = emb.shape
        unit = emb / np.maximum(
            np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        n_pad = pad_to_multiple(self.n, g)
        if n_pad // g < k_cap:
            k_cap = max(n_pad // g, 1)
        self.k_cap = min(k_cap, self.n - 1) if self.n > 1 else 1
        padded = np.zeros((n_pad, self.dim), np.float32)
        padded[: self.n] = unit
        self.unit_host = padded[: self.n]   # /embed lookups stay host-side

        shard = NamedSharding(mesh, P("graph", None))
        shard1 = NamedSharding(mesh, P("graph"))
        self._row_spec = P("graph", None)
        self.quantized = quantized
        if quantized:
            # per-row quantization partitions cleanly: jit keeps the
            # sharded layout, so the int8 table is born distributed.
            # The f32 table is only TRANSIENT (one shard per device) —
            # dropping it keeps the int8 4x HBM saving; query rows are
            # gathered host-side from unit_host instead (same policy as
            # the single-device int8 path, serve.py)
            tmp = jax.device_put(padded, shard)
            vals, scales = jax.jit(quantize_rows)(tmp)
            del tmp
            self.q_values = jax.device_put(vals, shard)
            self.q_scales = jax.device_put(scales, shard1)
            self.unit = None
        else:
            self.unit = jax.device_put(padded, shard)
        self.nbhds = None
        if nbhds is not None:
            w = np.zeros((n_pad, nbhds[0].shape[1]), np.float32)
            w[: self.n] = nbhds[0]
            nn = np.zeros((n_pad, nbhds[1].shape[1]), np.int32)
            nn[: self.n] = nbhds[1]
            self.nbhds = (jax.device_put(w, shard),
                          jax.device_put(nn, shard))
        self._knn_fn = {}
        self._hybrid_fn = {}

    # ------------------------------------------------------------ kernels

    def _build_knn(self, k: int):
        mesh = self.mesh
        n_valid = self.n
        gather = self._gather

        if self.quantized:
            # int8: query rows arrive replicated (host-gathered — there
            # is no f32 device table to collectively gather from)
            def kernel(rows, q, values_local, scales_local):
                sims = _local_scores_int8(values_local, scales_local, q,
                                          rows, n_valid, "graph")
                w_loc, i_loc = _select_topk(sims, k)
                my = lax.axis_index("graph")
                n_loc = i_loc + my * values_local.shape[0]
                return _rerank(w_loc, n_loc, k, "graph")

            in_specs = (P(), P(), self._row_spec, P("graph"))
        else:
            def kernel(emb_local, rows):
                q = gather(emb_local, rows, "graph")             # [B, d]
                sims = _local_scores(emb_local, q, rows, n_valid, "graph")
                w_loc, i_loc = _select_topk(sims, k)
                my = lax.axis_index("graph")
                n_loc = i_loc + my * emb_local.shape[0]
                return _rerank(w_loc, n_loc, k, "graph")

            in_specs = (self._row_spec, P())

        return jax.jit(jax.shard_map(
            kernel, mesh=mesh, in_specs=in_specs,
            out_specs=(P(), P()),
            check_vma=False))

    def _build_hybrid(self, k: int):
        if self.nbhds is None:
            raise ValueError("hybrid_knn needs nbhds= at construction")
        mesh = self.mesh
        n_valid = self.n
        gather = self._gather

        if self.quantized:
            def kernel(nb_w_local, nb_n_local, rows, q,
                       values_local, scales_local):
                head_w = gather(nb_w_local, rows, "graph")
                head_n = gather(nb_n_local, rows, "graph")
                sims = _local_scores_int8(values_local, scales_local, q,
                                          rows, n_valid, "graph")
                w_loc, i_loc = _select_topk(sims, k)
                my = lax.axis_index("graph")
                n_loc = i_loc + my * values_local.shape[0]
                tail_w, tail_n = _rerank(w_loc, n_loc, k, "graph")
                return merge_topk(head_w, head_n, tail_w, tail_n)

            in_specs = (self._row_spec, self._row_spec, P(), P(),
                        self._row_spec, P("graph"))
        else:
            def kernel(emb_local, nb_w_local, nb_n_local, rows):
                q = gather(emb_local, rows, "graph")
                head_w = gather(nb_w_local, rows, "graph")
                head_n = gather(nb_n_local, rows, "graph")
                sims = _local_scores(emb_local, q, rows, n_valid, "graph")
                w_loc, i_loc = _select_topk(sims, k)
                my = lax.axis_index("graph")
                n_loc = i_loc + my * emb_local.shape[0]
                tail_w, tail_n = _rerank(w_loc, n_loc, k, "graph")
                # replicated inputs -> the merge is identical everywhere
                return merge_topk(head_w, head_n, tail_w, tail_n)

            in_specs = (self._row_spec, self._row_spec, self._row_spec,
                        P())

        return jax.jit(jax.shard_map(
            kernel, mesh=mesh, in_specs=in_specs,
            out_specs=(P(), P()),
            check_vma=False))

    # -------------------------------------------------------------- API

    def _prep_rows(self, rows) -> tuple[np.ndarray, int]:
        rows = np.asarray(rows)
        if rows.size == 0:
            raise ValueError("empty query batch")
        if rows.min() < 0 or rows.max() >= self.n:
            raise IndexError(f"query rows outside [0, {self.n})")
        b = 1 << (int(rows.size) - 1).bit_length()           # pow2 bucket
        padded = np.zeros((b,), np.int32)
        padded[: rows.size] = rows
        return padded, rows.size

    def knn_rows(self, rows, k: int = 10
                 ) -> tuple[np.ndarray, np.ndarray]:
        """[B] global query rows -> (weights [B, k], nodes [B, k]),
        self-excluded, ranked by cosine (or int8 cosine)."""
        k = max(min(k, self.k_cap), 1)
        padded, n_real = self._prep_rows(rows)
        fn = self._knn_fn.get(())
        if fn is None:
            fn = self._knn_fn[()] = self._build_knn(self.k_cap)
        if self.quantized:
            w, n = fn(jnp.asarray(padded),
                      jnp.asarray(self.unit_host[padded]),
                      self.q_values, self.q_scales)
        else:
            w, n = fn(self.unit, jnp.asarray(padded))
        return (np.asarray(w)[:n_real, :k], np.asarray(n)[:n_real, :k])

    def hybrid_knn_rows(self, rows, k: int = 10
                        ) -> tuple[np.ndarray, np.ndarray]:
        """[B] query rows -> hybrid (cached walk head + embedding tail)
        ranking, serve.HybridIndex cached-head semantics."""
        k = max(min(k, self.k_cap), 1)
        padded, n_real = self._prep_rows(rows)
        fn = self._hybrid_fn.get(())
        if fn is None:
            fn = self._hybrid_fn[()] = self._build_hybrid(self.k_cap)
        if self.quantized:
            w, n = fn(self.nbhds[0], self.nbhds[1], jnp.asarray(padded),
                      jnp.asarray(self.unit_host[padded]),
                      self.q_values, self.q_scales)
        else:
            w, n = fn(self.unit, self.nbhds[0], self.nbhds[1],
                      jnp.asarray(padded))
        return (np.asarray(w)[:n_real, :k], np.asarray(n)[:n_real, :k])


class ShardedServingFrontend(TrackResolverMixin):
    """serve.py-compatible facade over a `ShardedServeIndex`.

    Exposes the `EmbeddingIndex` query surface (`n`, `dim`, `track_ids`,
    `resolve`, `resolve_many`, `knn`, `knn_rows`, `embed`) so
    `serve.serve()` — HTTP endpoints, QueryBatcher coalescing, the whole
    single-dispatch discipline — runs unchanged over a catalog-sharded
    mesh index:

        front = ShardedServingFrontend(ShardedServeIndex(emb, nbhds=...),
                                       track_ids=graph.track_ids)
        serve(front).serve_forever()

    Queries route to `hybrid_knn_rows` when the index carries a
    neighborhoods artifact (the roster-winning hybrid ranking), else to
    the embedding-only `knn_rows`.  Results arrive self-excluded from
    the sharded kernels; degenerate -inf fill slots are dropped here.
    """

    def __init__(self, index: ShardedServeIndex,
                 track_ids: Optional[list] = None,
                 tracks_meta: Optional[dict] = None,
                 hybrid: Optional[bool] = None):
        self.index = index
        self.n = index.n
        self.dim = index.dim
        self.k_cap = index.k_cap
        self.track_ids = (list(track_ids) if track_ids
                          else [str(i) for i in range(self.n)])
        if len(self.track_ids) != self.n:
            raise ValueError(f"{len(self.track_ids)} track ids for "
                             f"{self.n} catalog rows")
        self.row_of = {tid: i for i, tid in enumerate(self.track_ids)}
        self.tracks_meta = tracks_meta or {}
        self.hybrid = (index.nbhds is not None if hybrid is None
                       else hybrid)
        if self.hybrid and index.nbhds is None:
            raise ValueError("hybrid=True needs an index built with nbhds=")

    def _format_rows(self, w: np.ndarray, n: np.ndarray, k: int
                     ) -> list[list[dict]]:
        out = []
        for wi, ni in zip(w, n):
            keep = np.isfinite(wi)           # drop degenerate -inf fills
            out.append([self._format_item(score, idx)
                        for score, idx in zip(wi[keep][:k], ni[keep][:k])])
        return out

    def add_tracks(self, embeddings, track_ids=None, tracks_meta=None):
        raise NotImplementedError(
            "online adds on a sharded index need a re-shard (rows are "
            "range-partitioned); rebuild the ShardedServeIndex, or serve "
            "deltas from a single-chip EmbeddingIndex tier")

    def remove_tracks(self, tracks):
        raise NotImplementedError(
            "online removals on a sharded index need a re-shard; "
            "rebuild the ShardedServeIndex without the removed rows")

    def knn(self, row: int, k: int = 10) -> list[dict]:
        return self.knn_rows(np.asarray([row]), k)[0]

    def knn_rows(self, rows, k: int = 10) -> list[list[dict]]:
        rows = np.asarray(rows)
        if rows.size == 0:
            return []
        k = max(min(k, self.k_cap, self.n - 1), 1)
        fn = (self.index.hybrid_knn_rows if self.hybrid
              else self.index.knn_rows)
        w, n = fn(rows, k)
        return self._format_rows(w, n, k)

    def embed(self, row: int) -> np.ndarray:
        return np.asarray(self.index.unit_host[row])
