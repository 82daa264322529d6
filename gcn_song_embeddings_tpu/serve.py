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
    GET /embed?track=<id>                 -> the raw embedding vector

Batched offline retrieval should use ops.knn.knn_from_emb instead; this
path is optimized for single-query latency.
"""

from __future__ import annotations

import json
from functools import partial
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k",))
def _query_topk(unit_emb: jnp.ndarray, row: jnp.ndarray, k: int):
    """One-query cosine top-(k+1): [N, d] x [d] matvec + top_k.

    Self is filtered BY ID downstream, not by dropping slot 0 — with
    duplicate embeddings top_k's index tie-break can put the duplicate in
    slot 0 and the query itself in slot 1."""
    sims = jnp.dot(unit_emb, unit_emb[row],
                   precision=jax.lax.Precision.HIGHEST)  # see ops/knn.py
    return jax.lax.top_k(sims, k + 1)


class EmbeddingIndex:
    """Device-resident kNN index over a track embedding matrix.

    quantized=True stores the table as int8 rows + per-row scales (4x less
    HBM, int8 MXU contraction — ops/quantize.py).  Measured quality cost on
    trained (tightly clustered) embeddings: hit@100 drops ~1% and MRR ~10%
    (near-tie rank shuffles); keep the f32 index when exact rank order
    matters.  In particular, embeddings trained at the reference's tiny
    margin (1e-5) separate by ~1e-4 cosine — BELOW int8 resolution — so
    quantized serving of them returns noise; train with margin >= 0.1
    (RunConfig.recommended()) before enabling it (RESULTS.md "Matmul
    precision")."""

    def __init__(self, embeddings: np.ndarray,
                 track_ids: Optional[list[str]] = None,
                 tracks_meta: Optional[dict] = None,
                 quantized: bool = False):
        emb = np.asarray(embeddings, dtype=np.float32)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        unit = emb / np.maximum(norms, 1e-12)
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
        self.track_ids = track_ids or [str(i) for i in range(self.n)]
        self.row_of = {tid: i for i, tid in enumerate(self.track_ids)}
        self.tracks_meta = tracks_meta or {}

    @classmethod
    def from_run(cls, emb_path: str, graph=None,
                 quantized: bool = False) -> "EmbeddingIndex":
        emb = np.load(emb_path)
        if graph is not None:
            return cls(emb, graph.track_ids, graph.tracks,
                       quantized=quantized)
        return cls(emb, quantized=quantized)

    def knn(self, row: int, k: int = 10) -> list[dict]:
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
        # filter self BY ID (duplicate embeddings can tie-break the
        # duplicate into slot 0 and the query into slot 1)
        keep = n != row
        w, n = w[keep][:k], n[keep][:k]
        out = []
        for score, idx in zip(np.asarray(w), np.asarray(n)):
            tid = self.track_ids[int(idx)]
            item = {"track": tid, "index": int(idx),
                    "score": round(float(score), 6)}
            meta = self.tracks_meta.get(tid)
            if meta:
                item["name"] = meta.get("name")
                item["artist"] = meta.get("artist")
            out.append(item)
        return out

    def embed(self, row: int) -> np.ndarray:
        return np.asarray(self.unit[row])

    def resolve(self, params: dict) -> int:
        if "index" in params:
            row = int(params["index"][0])
            if not 0 <= row < self.n:
                raise KeyError(f"index {row} out of range")
            return row
        tid = params["track"][0]
        if tid not in self.row_of:
            raise KeyError(f"unknown track {tid!r}")
        return self.row_of[tid]


def make_handler(index: EmbeddingIndex):
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
                    self._json(200, {"status": "ok", "tracks": index.n,
                                     "dim": index.dim})
                elif url.path == "/knn":
                    row = index.resolve(params)
                    k = min(int(params.get("k", ["10"])[0]), index.n - 1)
                    self._json(200, {"query": index.track_ids[row],
                                     "neighbors": index.knn(row, k)})
                elif url.path == "/embed":
                    row = index.resolve(params)
                    self._json(200, {"track": index.track_ids[row],
                                     "embedding":
                                     index.embed(row).tolist()})
                else:
                    self._json(404, {"error": f"no route {url.path}"})
            except (KeyError, ValueError, IndexError) as e:
                self._json(400, {"error": str(e)})

    return Handler


def serve(index: EmbeddingIndex, host: str = "127.0.0.1", port: int = 8800
          ) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call .serve_forever() or run it
    in a thread; .shutdown() to stop)."""
    server = ThreadingHTTPServer((host, port), make_handler(index))
    return server


def main() -> None:
    import argparse

    from gcn_song_embeddings_tpu.data import SongGraph

    ap = argparse.ArgumentParser()
    ap.add_argument("--emb", required=True, help="path to emb.npy")
    ap.add_argument("--dataset", default=None,
                    help="dataset dir for track metadata")
    ap.add_argument("--port", type=int, default=8800)
    ap.add_argument("--int8", action="store_true",
                    help="serve a quantized index (4x less HBM)")
    args = ap.parse_args()
    graph = SongGraph(args.dataset) if args.dataset else None
    index = EmbeddingIndex.from_run(args.emb, graph, quantized=args.int8)
    index.knn(0, 10)  # warm the jit before accepting traffic
    print(f"serving {index.n} tracks on :{args.port}")
    serve(index, port=args.port).serve_forever()


if __name__ == "__main__":
    main()
