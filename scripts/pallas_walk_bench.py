"""Pallas fused-walk kernel vs XLA walker A/B (round-2 VERDICT item 5).

Times the hand-scheduled Pallas two-step-hop kernel (ops/pallas_walk.py:
explicit K-deep per-walker DMA pipeline on the scalar core) against the
production XLA walker (ops/walks.py walks_from_fused_tables: batched
hardware gathers under lax.scan) on the SAME extent-joined tables, same
B/H, same in-jit R-rep difference methodology (RESULTS.md).  Also checks
the two traces are bit-identical on the chip, not just in interpret mode.

The Pallas walker's B is SMEM-bound (state + uniforms + trace rows are
per-walker scalars), so the A/B runs like-for-like at B=2048; the XLA
walker's production-shape rate (B=100k) is in the roofline/locality
entries of RESULTS.md.  Prints one JSON line.
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
    ap.add_argument("--walkers", type=int, default=2048)
    ap.add_argument("--hops", type=int, default=500)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()

    from gcn_song_embeddings_tpu.data.device import DeviceGraph
    from gcn_song_embeddings_tpu.ops.pallas_walk import (
        pallas_walks_from_fused_tables,
    )
    from gcn_song_embeddings_tpu.ops.walks import (
        fused_walk_tables,
        walks_from_fused_tables,
    )
    from scripts.walk_locality_bench import (
        build_clustered,
        csr_from_pairs,
        relabel_pairs,
    )

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    B, H, R = args.walkers, args.hops, args.reps

    # 100k-track clustered graph, randomly relabeled (production layout)
    t, c = build_clustered(100_000, 20_000, 29, 200, rng)
    t, c = relabel_pairs(t, c, rng.permutation(100_000),
                         rng.permutation(20_000))
    dg = DeviceGraph.from_arrays(*csr_from_pairs(t, c, 100_000, 20_000))
    tables = fused_walk_tables(dg)

    def timed(f, key):
        t0 = time.perf_counter()
        jax.device_get(f(key))
        return time.perf_counter() - t0

    def rate(walk_fn, nodeset, label):
        def make(reps):
            @jax.jit
            def f(key):
                def rep(carry, i):
                    trace = walk_fn(jax.random.fold_in(key, i), nodeset)
                    return carry + trace.sum().astype(jnp.uint32), 0
                total, _ = lax.scan(rep, jnp.uint32(0), jnp.arange(reps))
                return total
            return f
        f1, fR = make(1), make(R)
        timed(f1, jax.random.PRNGKey(1))
        timed(fR, jax.random.PRNGKey(1))
        diffs = []
        for s in range(2, 5):
            t1 = timed(f1, jax.random.PRNGKey(2 * s))
            tR = timed(fR, jax.random.PRNGKey(2 * s + 1))
            diffs.append(tR - t1)
        hops = (R - 1) * nodeset.shape[0] * H
        r = hops / float(np.median(diffs))
        log(f"{label}: {r / 1e6:.1f}M hops/s "
            f"(diffs {[round(x, 3) for x in diffs]})")
        return round(r / 1e6, 1)

    xla_walk = jax.jit(lambda key, nodeset: walks_from_fused_tables(
        tables, nodeset, H, 0.85, key))

    def pallas_walk(key, nodeset):
        return pallas_walks_from_fused_tables(tables, nodeset, H, 0.85, key)

    nodeset = jnp.asarray(rng.integers(0, 100_000, B), jnp.int32)

    # hardware bit-identity at the timing shape (jitted: 2 dispatches).
    # Pallas arm FIRST: its compile is the one that can fail, so fail
    # fast instead of paying the XLA arm's compile before finding out.
    key = jax.random.PRNGKey(99)
    got = np.asarray(pallas_walk(key, nodeset))
    log("pallas walker compiled + ran")
    ref = np.asarray(xla_walk(key, nodeset))
    bit_identical = bool((ref == got).all())
    log(f"hardware bit-identity (B={B}, H={H}): {bit_identical}")

    results = {
        "walkers": B, "hops": H,
        "bit_identical_on_chip": bit_identical,
        "xla_hops_per_s_M": rate(xla_walk, nodeset, f"XLA walker B={B}"),
        "pallas_hops_per_s_M": rate(pallas_walk, nodeset,
                                    f"Pallas walker B={B}"),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
