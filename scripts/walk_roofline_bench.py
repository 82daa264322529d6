"""Walk-kernel roofline decomposition (round-2 VERDICT item 5).

Round 1 proved the AGGREGATION op pins the chip's random-row gather
bandwidth (RESULTS.md) — this does the same for the walk kernel, which is
LATENCY-bound (dependent gathers), not bandwidth-bound.  Components, all
timed with the in-jit R-rep difference methodology:

  chain1      x = tab[x]: ONE dependent [B]-row gather per step — the
              hardware floor for any kernel whose next address depends on
              the previous load (table size swept to isolate the
              large-table effect measured in round 1)
  chain2      x = tab2[tab1[x]]: two dependent gathers per step — the
              walker's exact dependence structure, zero walk logic
  walker      the production fused walker (walks_from_fused_tables)
  logic-only  same scan with the gathers replaced by arithmetic — proves
              the slot math / restart select are free

If walker ≈ chain2 ≈ 2 x chain1-step and logic-only is negligible, the
kernel IS the dependent-gather roofline: a Pallas rewrite drives the same
gather/DMA engines with more per-element overhead (the round-1 Pallas
aggregation kernel measured exactly that, 5x slower), so the only levers
are fewer dependent gathers per hop (done: extent-joining), more walkers
in flight (done: saturates), shorter chains (n_chains), and memory layout
(walk_locality_bench.py).  Prints one JSON line.
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
    ap.add_argument("--walkers", type=int, default=100_000)
    ap.add_argument("--hops", type=int, default=500)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--table-rows", type=int, default=None,
                    help="rows for the synthetic chain tables (default: "
                         "sweep 1M and 12M)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    B, H, R = args.walkers, args.hops, args.reps

    def timed(f, key):
        t0 = time.perf_counter()
        jax.device_get(f(key))
        return time.perf_counter() - t0

    def rate(build_step, label, extra_hops_factor=1.0):
        """build_step(key) -> jitted fn running R times the H-step scan."""
        def make(reps):
            @jax.jit
            def f(key):
                def rep(carry, i):
                    out = build_step(jax.random.fold_in(key, i))
                    return carry + out, 0
                total, _ = lax.scan(rep, jnp.uint32(0), jnp.arange(reps))
                return total
            return f
        f1, fR = make(1), make(R)
        timed(f1, jax.random.PRNGKey(1))       # compile + warm
        timed(fR, jax.random.PRNGKey(1))
        diffs = []
        for s in range(2, 5):                  # median of 3 pairs
            t1 = timed(f1, jax.random.PRNGKey(2 * s))
            tR = timed(fR, jax.random.PRNGKey(2 * s + 1))
            diffs.append(tR - t1)
        steps = (R - 1) * B * H * extra_hops_factor
        r = steps / float(np.median(diffs))
        log(f"{label}: {r / 1e6:.1f}M steps/s "
            f"(diffs {[round(x, 2) for x in diffs]})")
        return round(r / 1e6, 1)

    results = {"walkers": B, "hops": H}

    # --- chain1 / chain2 over synthetic tables, size swept ----------------
    sizes = ([args.table_rows] if args.table_rows
             else [1_000_000, 12_000_000])
    for m in sizes:
        # uniform random successor table: worst-case layout, exactly the
        # random-gather pattern of an unclustered graph
        tab1 = jnp.asarray(rng.integers(0, m, size=(m,), dtype=np.int32))
        tab2 = jnp.asarray(rng.integers(0, m, size=(m,), dtype=np.int32))
        x0 = jnp.asarray(rng.integers(0, m, size=(B,), dtype=np.int32))

        def chain1_step(key, tab1=tab1, x0=x0):
            def hop(x, _):
                return tab1[x], ()
            x, _ = lax.scan(hop, x0, None, length=H)
            return x.sum().astype(jnp.uint32)

        def chain2_step(key, tab1=tab1, tab2=tab2, x0=x0):
            def hop(x, _):
                return tab2[tab1[x]], ()
            x, _ = lax.scan(hop, x0, None, length=H)
            return x.sum().astype(jnp.uint32)

        mb = 4 * m / 1e6
        results[f"chain1_{m//1_000_000}Mrow"] = rate(
            chain1_step, f"chain1 [{mb:.0f} MB table]")
        results[f"chain2_{m//1_000_000}Mrow"] = rate(
            chain2_step, f"chain2 [{2*mb:.0f} MB tables]")

    # --- logic-only control ------------------------------------------------
    def logic_step(key):
        u = jax.random.uniform(key, (H, B, 3))
        org = jnp.zeros((B, 2), jnp.int32)

        def hop(cur, uh):
            s1, d1 = cur[:, 0], cur[:, 1] | 1
            idx1 = s1 + jnp.minimum(
                (uh[:, 0] * d1.astype(uh.dtype)).astype(jnp.int32),
                jnp.maximum(d1 - 1, 0))
            s2 = idx1 ^ 12345
            d2 = (idx1 >> 3) | 1
            idx2 = s2 + jnp.minimum(
                (uh[:, 1] * d2.astype(uh.dtype)).astype(jnp.int32),
                jnp.maximum(d2 - 1, 0))
            nxt = jnp.where(uh[:, 2, None] < 0.85, org,
                            jnp.stack([idx2, idx2 >> 2], axis=1))
            return nxt, ()
        out, _ = lax.scan(hop, org, u)
        return out.sum().astype(jnp.uint32)

    results["logic_only"] = rate(logic_step, "logic-only control")

    # --- the production walker over a real clustered 1M graph -------------
    from gcn_song_embeddings_tpu.data.device import DeviceGraph
    from gcn_song_embeddings_tpu.ops.walks import (
        fused_walk_tables,
        walks_from_fused_tables,
    )
    from scripts.walk_locality_bench import (
        build_clustered,
        csr_from_pairs,
        relabel_pairs,
    )

    t, c = build_clustered(1_000_000, 200_000, 29, 2000, rng)
    t, c = relabel_pairs(t, c, rng.permutation(1_000_000),
                         rng.permutation(200_000))
    dg = DeviceGraph.from_arrays(*csr_from_pairs(t, c, 1_000_000, 200_000))
    tables = fused_walk_tables(dg)
    nodeset = jnp.arange(B, dtype=jnp.int32)

    def walker_step(key):
        trace = walks_from_fused_tables(tables, nodeset, H, 0.85, key)
        return trace.sum().astype(jnp.uint32)

    results["walker_1M_random_labels"] = rate(
        walker_step, "fused walker (1M graph, random labels)")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
