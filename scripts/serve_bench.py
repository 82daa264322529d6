"""Serving latency/throughput benchmark (round-2 VERDICT item 6).

Starts the real HTTP server (QueryBatcher dispatcher on) over a synthetic
catalog and measures, through actual HTTP clients:

  * single-query latency: p50 / p99 over sequential GET /knn
  * concurrent load: C client threads x Q queries — wall, effective QPS,
    per-request p50/p99 (exercises the coalescing dispatcher)
  * batched endpoint: GET /knn?indices=... with B queries per request

On the tunneled axon platform each DEVICE CALL pays ~1-2 s of tunnel
round-trip (RESULTS.md "timing methodology"), so single-query latency is
tunnel-bound there; the interesting numbers are how far coalescing +
batching amortize that fixed cost (QPS under concurrency / batch).

Usage: python scripts/serve_bench.py [--tracks 100000] [--dim 128] ...
Prints one JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(int(p / 100 * len(xs)), len(xs) - 1)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--hybrid", action="store_true",
                    help="serve the walk-head + embedding-tail hybrid "
                         "over a synthetic bipartite graph (round-5 "
                         "VERDICT item 1)")
    ap.add_argument("--hops", type=int, default=1000)
    ap.add_argument("--chains", type=int, default=1,
                    help="hybrid: split the hop budget across lockstep "
                         "chains (latency knob)")
    ap.add_argument("--cached-head", action="store_true",
                    help="hybrid walk head from a precomputed artifact "
                         "(offline sweep first; no per-query walks)")
    ap.add_argument("--adds", type=int, default=0,
                    help="measure online adds: N POST /add batches of 16 "
                         "tracks through the live server, with query "
                         "latency re-measured while the delta is "
                         "outstanding (embedding index only)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (the axon sitecustomize "
                         "overrides JAX_PLATFORMS, so an env var is not "
                         "enough)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()   # hybrid walk-scan compiles amortize across runs
    import numpy as np

    from gcn_song_embeddings_tpu.serve import (
        EmbeddingIndex,
        HybridIndex,
        serve,
    )

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(args.tracks, args.dim)).astype(np.float32)
    if args.hybrid:
        # synthetic bipartite graph + co-listen pairs at catalog scale
        # (CSR arrays directly — no JSON round trip at 1M)
        from gcn_song_embeddings_tpu.data.device import DeviceGraph
        from gcn_song_embeddings_tpu.data.graph import _build_csr

        n_cols = max(args.tracks // 4, 1)
        deg = 8
        src = np.repeat(np.arange(args.tracks, dtype=np.int64), deg)
        dst = rng.integers(0, n_cols, size=src.size)
        i2c = _build_csr(src, dst, args.tracks)
        c2i = _build_csr(dst, src, n_cols)
        dg = DeviceGraph.from_arrays(i2c.indptr, i2c.indices,
                                     c2i.indptr, c2i.indices)
        pairs = rng.integers(0, args.tracks,
                             size=(args.tracks // 2, 2)).astype(np.int64)
        if args.cached_head:
            # amortize the walks offline: sweep the artifact once, serve
            # the head from cache (two gathers/query)
            from gcn_song_embeddings_tpu.config import WalkConfig
            from gcn_song_embeddings_tpu.data.device import (
                augment_with_colisten,
            )
            from gcn_song_embeddings_tpu.ops.ppr import (
                precompute_neighborhoods,
            )

            aug = augment_with_colisten(dg, pairs, 1)
            t0 = time.perf_counter()
            nbhds = precompute_neighborhoods(
                aug, WalkConfig(batch_walkers=8192), None)
            log(f"offline head sweep: {time.perf_counter() - t0:.1f} s")
            index = HybridIndex(emb, nbhds=nbhds, quantized=args.int8)
        else:
            index = HybridIndex(emb, dg, train_pairs=pairs,
                                colisten_copies=1, n_hops=args.hops,
                                parallel_chains=args.chains,
                                quantized=args.int8)
    else:
        index = EmbeddingIndex(emb, quantized=args.int8)
    server = serve(index, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def get(path):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=600) as r:
            return json.loads(r.read())

    # warm every jit bucket this run will touch (1..max pow2)
    log("warming jit buckets...")
    b = 1
    while b <= max(args.batch, args.clients):
        t0 = time.perf_counter()
        index.knn_rows(np.arange(b) % args.tracks, 10)
        log(f"  bucket {b}: {time.perf_counter() - t0:.1f} s")
        b *= 2

    qrows = rng.integers(0, args.tracks, size=args.queries * args.clients)

    # --- sequential single-query latency --------------------------------
    lat = []
    for q in qrows[: args.queries]:
        t0 = time.perf_counter()
        res = get(f"/knn?index={q}&k=10")
        lat.append(time.perf_counter() - t0)
        assert len(res["neighbors"]) == 10
    seq = {"p50_ms": round(1e3 * pct(lat, 50), 2),
           "p99_ms": round(1e3 * pct(lat, 99), 2),
           "mean_ms": round(1e3 * sum(lat) / len(lat), 2)}
    log("sequential:", seq)

    # --- concurrent clients ---------------------------------------------
    clat: list = []
    errors: list = []
    lock = threading.Lock()

    def client(ci):
        mine = qrows[ci * args.queries:(ci + 1) * args.queries]
        for q in mine:
            t0 = time.perf_counter()
            try:
                res = get(f"/knn?index={q}&k=10")
                assert len(res["neighbors"]) == 10
            except Exception as e:
                errors.append(e)
                return
            with lock:
                clat.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(ci,))
               for ci in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    cwall = time.perf_counter() - t0
    assert not errors, errors[:2]
    conc = {"clients": args.clients,
            "total_queries": len(clat),
            "wall_s": round(cwall, 2),
            "qps": round(len(clat) / cwall, 1),
            "p50_ms": round(1e3 * pct(clat, 50), 2),
            "p99_ms": round(1e3 * pct(clat, 99), 2)}
    log("concurrent:", conc)

    # --- batched endpoint -------------------------------------------------
    blat = []
    for _ in range(10):
        rows = rng.integers(0, args.tracks, size=args.batch)
        t0 = time.perf_counter()
        res = get("/knn?indices=" + ",".join(map(str, rows)) + "&k=10")
        blat.append(time.perf_counter() - t0)
        assert len(res["neighbors"]) == args.batch
    bat = {"batch": args.batch,
           "p50_ms": round(1e3 * pct(blat, 50), 2),
           "qps": round(args.batch / pct(blat, 50), 1)}
    log("batched:", bat)

    # --- online adds (POST /add) ----------------------------------------
    adds = None
    if args.adds:
        if args.hybrid:
            raise SystemExit("--adds measures the embedding index "
                             "(hybrid indexes reject online adds)")
        alat = []
        for i in range(args.adds):
            vecs = rng.normal(size=(16, args.dim)).astype(np.float32)
            body = json.dumps({"tracks": [
                {"track": f"new_{i}_{j}", "embedding": v.tolist()}
                for j, v in enumerate(vecs)]}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/add", data=body,
                headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            res = json.loads(urllib.request.urlopen(req, timeout=600).read())
            alat.append(time.perf_counter() - t0)
            assert res["tracks"] == args.tracks + 16 * (i + 1)
        # query latency with the delta outstanding (delta-aware kernel),
        # querying one of the freshly added rows
        qlat = []
        for _ in range(args.queries):
            t0 = time.perf_counter()
            res = get(f"/knn?track=new_0_0&k=10")
            qlat.append(time.perf_counter() - t0)
            assert len(res["neighbors"]) == 10
        adds = {"batches": args.adds, "rows_per_batch": 16,
                "add_p50_ms": round(1e3 * pct(alat, 50), 2),
                "add_p99_ms": round(1e3 * pct(alat, 99), 2),
                "query_with_delta_p50_ms": round(1e3 * pct(qlat, 50), 2)}
        log("adds:", adds)

    server.shutdown()
    server.server_close()
    print(json.dumps({
        "tracks": args.tracks, "dim": args.dim, "int8": args.int8,
        "hybrid": args.hybrid,
        **({"hops": args.hops, "chains": args.chains,
            "cached_head": args.cached_head}
           if args.hybrid else {}),
        "platform": str(jax.devices()[0]),
        "sequential": seq, "concurrent": conc, "batched": bat,
        **({"online_adds": adds} if adds else {})}))


if __name__ == "__main__":
    main()
