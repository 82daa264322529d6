"""Incremental PPR refresh at dataset_large scale (round-5 VERDICT item 4).

Scenario: a 1M-track catalog with a standing colisten-augmented
neighborhoods artifact (the scale_1m_co work dir) receives a trickle of
NEW co-listen pairs.  Measures, on the real chip:

  * the affected-origin fraction for batches of 100 / 1k / 10k new pairs,
  * refresh_neighborhoods wall vs the full re-sweep wall for the same
    augmented graph,
  * a spot distribution-parity check (mean TV between refreshed and
    fully-reswept rows on a sample of affected origins, next to the
    seed-to-seed TV noise floor of two full sweeps of those origins).

Usage: python scripts/refresh_1m_check.py [--work-dir /tmp/scale_1m_co]
Writes results/refresh_1m.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/scale_1m_co")
    ap.add_argument("--pair-counts", default="100,1000,10000")
    ap.add_argument("--parity-sample", type=int, default=512)
    ap.add_argument("--out", default="results/refresh_1m.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gcn_song_embeddings_tpu.config import WalkConfig
    from gcn_song_embeddings_tpu.data import SongGraph
    from gcn_song_embeddings_tpu.data.device import (
        DeviceGraph,
        augment_with_colisten,
    )
    from gcn_song_embeddings_tpu.ops.ppr import (
        _neighborhood_sweep_nodeset,
        affected_origins,
        effective_chains,
        precompute_neighborhoods,
        refresh_neighborhoods,
    )
    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())

    ds = os.path.join(args.work_dir, "ds")
    g = SongGraph(ds, features_file=os.path.join(ds, "features.npy"))
    dg = DeviceGraph.from_graph(g)
    train_pos, _ = g.load_positives_split(os.path.join(ds, "positives.json"))
    cfg = WalkConfig(colisten_copies=1, batch_walkers=8192)

    # the standing augmented graph + its artifact (served from the cache
    # written by the round-4 scale_1m_co campaign when present)
    base_aug = augment_with_colisten(dg, train_pos, 1)
    base_path = os.path.join(ds, "neighborhoods.colisten1.npz")
    t0 = time.time()
    old_w, old_n = precompute_neighborhoods(base_aug, cfg, base_path,
                                            seed=0, verbose=True)
    log(f"standing artifact: {time.time() - t0:.1f}s "
        f"(cached={os.path.isfile(base_path)})")

    rng = np.random.default_rng(42)
    out_rows = []
    n_items = dg.n_items
    for m in [int(x) for x in args.pair_counts.split(",")]:
        new_pairs = rng.integers(0, n_items, size=(m, 2)).astype(np.int64)
        new_pairs = new_pairs[new_pairs[:, 0] != new_pairs[:, 1]]
        # the incrementally-augmented graph = base + the new pseudo-cols
        aug2 = augment_with_colisten(
            base_aug, new_pairs, 1)
        t0 = time.time()
        aff = affected_origins(old_w, old_n, new_pairs, n_items)
        t_aff = time.time() - t0
        t0 = time.time()
        ref_w, ref_n = refresh_neighborhoods(
            aug2, cfg, old_w, old_n, new_pairs, path=None, seed=3,
            verbose=True)
        t_refresh = time.time() - t0
        row = {"new_pairs": int(m), "affected": int(len(aff)),
               "affected_frac": round(len(aff) / n_items, 5),
               "affect_scan_s": round(t_aff, 2),
               "refresh_s": round(t_refresh, 1)}
        log(json.dumps(row))
        out_rows.append(row)
        # keep only the LAST iteration's arrays (host RAM at 1M scale)

    # full re-sweep wall for the LAST (largest) augmented graph
    t0 = time.time()
    full_w, full_n = precompute_neighborhoods(aug2, cfg, None, seed=1,
                                              verbose=True)
    t_full = time.time() - t0
    log(f"full re-sweep: {t_full:.1f}s")

    # parity spot-check on sampled affected origins: TV(refresh, full)
    # vs the seed-to-seed noise floor TV(full_seed2, full) on the SAME
    # origins (swept directly, no full third pass)
    samp = rng.permutation(aff)[: args.parity_sample].astype(np.int32)
    chains = effective_chains(cfg.n_hops, cfg.parallel_chains)
    pad = -len(samp) % cfg.batch_walkers
    block = np.concatenate([samp, np.full(pad, samp[-1], np.int32)])
    w2, n2 = _neighborhood_sweep_nodeset(
        aug2, jax.numpy.asarray(block), cfg.n_hops, cfg.alpha,
        cfg.t_precompute, jax.random.PRNGKey(7),
        cfg.batch_walkers, len(block) // cfg.batch_walkers,
        n_chains=chains, fused=cfg.fused_tables)
    w2, n2 = np.asarray(w2)[: len(samp)], np.asarray(n2)[: len(samp)]

    def tv_rows(wa, na, wb, nb):
        out = np.empty(wa.shape[0])
        for i in range(wa.shape[0]):
            d1 = {int(x): float(v) for x, v in zip(na[i], wa[i]) if v > 0}
            d2 = {int(x): float(v) for x, v in zip(nb[i], wb[i]) if v > 0}
            out[i] = 0.5 * sum(abs(d1.get(k, 0.0) - d2.get(k, 0.0))
                               for k in set(d1) | set(d2))
        return out

    tv_refresh = float(tv_rows(ref_w[samp], ref_n[samp],
                               full_w[samp], full_n[samp]).mean())
    tv_noise = float(tv_rows(w2, n2, full_w[samp], full_n[samp]).mean())
    log(f"parity: TV(refresh, full)={tv_refresh:.4f} vs seed-noise "
        f"TV={tv_noise:.4f}")

    result = {
        "n_tracks": int(n_items),
        "rows": out_rows,
        "full_resweep_s": round(t_full, 1),
        "parity_sample": int(len(samp)),
        "tv_refresh_vs_full": round(tv_refresh, 5),
        "tv_seed_noise": round(tv_noise, 5),
        "platform": str(jax.devices()[0]),
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
