"""A/B: sort-based lax.top_k vs TPU ApproxTopK for the streamed kNN.

The 1M-capstone's dominant phase is cosine_topk_streamed (337 s for
151k queries at k=1000): each [B, chunk] tile pays a full sort-based
`lax.top_k(sim, k+1)` — ~80x the tile's matmul time.  TPU has a
purpose-built selection op (ApproxTopK / PartialReduce,
`jax.lax.approx_max_k`), EXACT at recall_target=1.0 and designed for
exactly this large-N moderate-k shape.  This script times the streamed
sweep both ways at dataset_large shape (N=1M, d=128, B=4096, k=1000)
and asserts identical results; if the approx path wins it should become
cosine_topk_streamed's selection primitive.

Usage: python scripts/topk_select_ab.py [--tracks 1000000]
Writes results/topk_select_ab.json.
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
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--reps-small", type=int, default=1)
    ap.add_argument("--reps-large", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from gcn_song_embeddings_tpu.ops.knn import cosine_topk_streamed
    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())

    n, d, B, k, chunk = (args.tracks, args.dim, args.batch, args.k,
                         args.chunk)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    queries = jnp.asarray(rng.integers(0, n, size=B).astype(np.int32))

    @partial(jax.jit, static_argnames=("k", "chunk"))
    def streamed_approx(emb, queries, k, chunk):
        """cosine_topk_streamed with ApproxTopK (recall 1.0 = exact) as
        the per-tile selection + merge primitive."""
        nn_, d_ = emb.shape
        kk = k + 1
        n_pad = ((nn_ + chunk - 1) // chunk) * chunk
        q = emb[queries]
        q_len = jnp.linalg.norm(q, axis=1, keepdims=True)
        e_len = jnp.linalg.norm(emb, axis=1)
        emb_pad = jnp.pad(emb, ((0, n_pad - nn_), (0, 0)))
        e_len_pad = jnp.pad(e_len, (0, n_pad - nn_))

        def tile(carry, start):
            best_w, best_n = carry
            rows = lax.dynamic_slice_in_dim(emb_pad, start, chunk, axis=0)
            lens = lax.dynamic_slice_in_dim(e_len_pad, start, chunk,
                                            axis=0)
            sim = jnp.dot(q, rows.T, preferred_element_type=jnp.float32,
                          precision=lax.Precision.HIGHEST)
            sim = sim / (q_len * lens[None, :] + 1e-16)
            valid = (start + jnp.arange(chunk)) < nn_
            sim = jnp.where(valid[None, :], sim, -jnp.inf)
            w, idx = lax.approx_max_k(sim, min(kk, chunk),
                                      recall_target=1.0)
            cand_w = jnp.concatenate([best_w, w], axis=1)
            cand_n = jnp.concatenate([best_n, idx + start], axis=1)
            new_w, pos = lax.top_k(cand_w, kk)
            new_n = jnp.take_along_axis(cand_n, pos, axis=1)
            return (new_w, new_n), None

        init = (jnp.full((q.shape[0], kk), -jnp.inf),
                jnp.zeros((q.shape[0], kk), dtype=jnp.int32))
        starts = jnp.arange(0, n_pad, chunk)
        (w, nn2), _ = lax.scan(tile, init, starts)
        return w[:, 1:], nn2[:, 1:]

    def sweep_fn(kern):
        @partial(jax.jit, static_argnames=("reps",))
        def run(emb, queries, reps):
            def body(acc, i):
                w, nidx = kern(emb, (queries + i) % n, k, chunk)
                return acc + jnp.sum(w[:, -1]) + jnp.sum(nidx[:, -1]), None

            acc, _ = lax.scan(body, jnp.float32(0),
                              jnp.arange(reps, dtype=jnp.int32))
            return acc

        return run

    # exactness: identical outputs on the same queries
    w_a, n_a = cosine_topk_streamed(emb, queries, k, chunk)
    w_b, n_b = streamed_approx(emb, queries, k, chunk)
    same_n = bool(jnp.all(n_a == n_b))
    max_dw = float(jnp.max(jnp.abs(w_a - w_b)))
    log(f"exactness: indices identical={same_n}, max|dw|={max_dw:.2e}")

    out = {"n": n, "B": B, "k": k, "chunk": chunk,
           "indices_identical": same_n, "max_abs_dw": max_dw}
    for name, kern in (("sort_topk", cosine_topk_streamed),
                       ("approx_topk_r1", streamed_approx)):
        run = sweep_fn(kern)
        float(run(emb, queries, args.reps_small))
        float(run(emb, queries, args.reps_large))
        diffs = []
        for _ in range(3):
            t0 = time.time()
            float(run(emb, queries, args.reps_small))
            t_s = time.time() - t0
            t0 = time.time()
            float(run(emb, queries, args.reps_large))
            t_l = time.time() - t0
            diffs.append((t_l - t_s) / (args.reps_large - args.reps_small))
        sec = float(np.median(diffs))
        out[name + "_s_per_dispatch"] = round(sec, 4)
        log(f"{name}: {sec:.3f} s per {B}-query dispatch "
            f"({B / sec:.0f} queries/s)")

    out["speedup"] = round(out["sort_topk_s_per_dispatch"]
                           / out["approx_topk_r1_s_per_dispatch"], 3)
    with open(os.path.join(REPO, "results/topk_select_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
