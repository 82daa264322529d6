"""Aggregation-gather A/B on the chip: XLA vs Pallas stream vs Pallas DMA.

VERDICT r2 item 2: run the DMA-pipeline experiment in the regime the
round-2 postmortem predicts per-row DMA fusion wins — the PinSage
aggregation hot op (reference /root/reference/pinsage_model.py:189-212):
B*T scattered 2 KB feature-row fetches feeding a Q-projection matmul.

Three arms, same math (ops/pallas_agg.py conv_aggregate modes):
  xla     gather -> einsum -> weighted mean (the production path)
  stream  fused_gather_aggregate: N_STREAMS block-stream pipeline kernel
  dma     dma_gather_aggregate: double-buffered explicit row-DMA pipeline

Timing: tunneled-TPU methodology (RESULTS.md) — each arm is ONE jit that
scans R reps with a carry-fed int offset (defeats CSE/hoisting), a scalar
is materialized, and the rate is the median of >=3 (R-rep minus 1-rep)
difference pairs.  Prints one JSON line with ms/op and effective gather
GB/s per arm at each batch size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[4096, 16384])
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--din", type=int, default=512)
    ap.add_argument("--hdim", type=int, default=512)
    ap.add_argument("--t", type=int, default=3)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()

    from gcn_song_embeddings_tpu.ops.pallas_agg import (
        dma_gather_aggregate,
        fused_gather_aggregate,
    )
    from gcn_song_embeddings_tpu.ops.pallas_agg import conv_aggregate

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    N, DIN, HDIM, T, R = args.n, args.din, args.hdim, args.t, args.reps

    h = jnp.asarray(rng.normal(size=(N, DIN)).astype(np.float32))
    Wq = jnp.asarray(rng.normal(size=(HDIM, DIN)).astype(np.float32) * .05)
    bq = jnp.asarray(np.full(HDIM, 0.3, np.float32))

    def timed(f, *a):
        t0 = time.perf_counter()
        jax.device_get(f(*a))
        return time.perf_counter() - t0

    arms = {
        "xla": lambda ids, w: conv_aggregate(h, ids, w, Wq, bq),
        "stream": lambda ids, w: fused_gather_aggregate(h, ids, w, Wq, bq),
        "dma": lambda ids, w: dma_gather_aggregate(h, ids, w, Wq, bq),
    }

    results = {"n": N, "din": DIN, "hdim": HDIM, "t": T, "reps": R}
    for B in args.batches:
        ids = jnp.asarray(rng.integers(0, N, (B, T)).astype(np.int32))
        w = jnp.asarray(rng.random((B, T)).astype(np.float32))

        # on-chip numerics: all three arms agree
        outs = {k: np.asarray(jax.jit(f)(ids, w)) for k, f in arms.items()}
        for k in ("stream", "dma"):
            d = float(np.abs(outs[k] - outs["xla"]).max())
            log(f"B={B} {k} vs xla max abs diff: {d:.2e}")
            results[f"B{B}_{k}_maxdiff"] = d

        for name, f in arms.items():
            def make(reps, f=f):
                @jax.jit
                def g(ids, w):
                    def rep(c, i):
                        off = (c > jnp.float32(1e30)).astype(jnp.int32)
                        out = f(ids + off, w)
                        return out.sum(), 0
                    c, _ = lax.scan(rep, jnp.float32(0), jnp.arange(reps))
                    return c
                return g
            g1, gR = make(1), make(R)
            timed(g1, ids, w)
            timed(gR, ids, w)
            diffs = []
            for _ in range(3):
                t1 = timed(g1, ids, w)
                tR = timed(gR, ids, w)
                diffs.append(tR - t1)
            ms = float(np.median(diffs)) / (R - 1) * 1e3
            gbs = B * T * DIN * 4 / (ms * 1e-3) / 1e9
            flops = 2 * B * T * DIN * HDIM
            log(f"B={B} {name}: {ms:.3f} ms/op, gather {gbs:.1f} GB/s, "
                f"{flops / (ms * 1e-3) / 1e12:.2f} TFLOP/s "
                f"(diffs {[round(x, 3) for x in diffs]})")
            results[f"B{B}_{name}_ms"] = round(ms, 4)
            results[f"B{B}_{name}_gather_GBs"] = round(gbs, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
