"""A/B: sort top_k vs ApproxTopK for the SERVING selection shape.

The streamed-eval A/B (scripts/topk_select_ab.py) measured ApproxTopK
neutral at k/chunk = 1001/8192 — the partial-reduce degenerates when k
is a large fraction of the reduced axis.  The SERVING kernels are the
opposite regime: one [B, N] score panel with k_cap+1 ~ 129 selected
from N up to 10^6 (k/N ~ 1e-4), which is the shape ApproxTopK was
built for.  This script times the embedding-serving batched kernel
(matmul + selection, serve._query_topk_batch's math) with both
primitives at B in {8, 64}, N=1M, k=128, verifies score-exactness, and
writes results/serve_topk_ab.json.  A material win motivates an
`approx` selection mode in serve.py.

Usage: python scripts/serve_topk_ab.py [--tracks 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())

    n, d, k = args.tracks, args.dim, args.k
    rng = np.random.default_rng(0)
    unit = rng.normal(size=(n, d)).astype(np.float32)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    unit = jnp.asarray(unit)

    def make(select):
        @partial(jax.jit, static_argnames=("kk", "reps"))
        def run(emb, rows, kk, reps):
            def body(acc, i):
                q = emb[(rows + i) % n]
                sims = jnp.dot(q, emb.T,
                               precision=lax.Precision.HIGHEST)
                w, idx = select(sims, kk)
                return acc + jnp.sum(w[:, -1]) + jnp.sum(idx[:, -1]), None

            acc, _ = lax.scan(body, jnp.float32(0),
                              jnp.arange(reps, dtype=jnp.int32))
            return acc

        return run

    sort_run = make(lambda s, kk: lax.top_k(s, kk))
    approx_run = make(lambda s, kk: lax.approx_max_k(s, kk,
                                                     recall_target=1.0))

    # score-exactness at this shape (one batch, compare value sets)
    rows = jnp.asarray(rng.integers(0, n, size=64).astype(np.int32))
    q = unit[rows]
    sims = jnp.dot(q, unit.T, precision=lax.Precision.HIGHEST)
    w_a, _ = lax.top_k(sims, k + 1)
    w_b, _ = lax.approx_max_k(sims, k + 1, recall_target=1.0)
    # approx_max_k returns sorted values when aggregate_to_topk (default)
    max_dw = float(jnp.max(jnp.abs(w_a - w_b)))
    log(f"score-exactness max|dw| = {max_dw:.2e}")

    out = {"n": n, "dim": d, "k": k, "max_abs_dw": max_dw}
    for B in (8, 64):
        rows_b = jnp.asarray(rng.integers(0, n, size=B).astype(np.int32))
        for name, run in (("sort", sort_run), ("approx", approx_run)):
            reps_s, reps_l = 2, 10
            float(run(unit, rows_b, k + 1, reps_s))
            float(run(unit, rows_b, k + 1, reps_l))
            diffs = []
            for _ in range(3):
                t0 = time.time()
                float(run(unit, rows_b, k + 1, reps_s))
                t_s = time.time() - t0
                t0 = time.time()
                float(run(unit, rows_b, k + 1, reps_l))
                t_l = time.time() - t0
                diffs.append((t_l - t_s) / (reps_l - reps_s))
            ms = 1e3 * float(np.median(diffs))
            out[f"B{B}_{name}_ms"] = round(ms, 3)
            log(f"B={B} {name}: {ms:.3f} ms per dispatch "
                f"({B / ms * 1e3:.0f} queries/s)")
        out[f"B{B}_speedup"] = round(
            out[f"B{B}_sort_ms"] / out[f"B{B}_approx_ms"], 3)

    with open(os.path.join(REPO, "results/serve_topk_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
