"""Large-batch train-step strategy A/B: frontier expansion vs full-graph.

RESULTS.md records aggregate train throughput DECLINING with batch size
(38.9M edges/s @B=128 -> 21.5M @B=4096): the frontier expansion gathers
3B*(T+1)^l feature rows per step with no dedup, and the aggregation
gather is bandwidth-bound (~100 GB/s on scattered 2 KB rows — see the
3-arm A/B).  The full-graph strategy (models/pinsage.fullgraph_embeddings,
train.fullgraph_forward) computes the conv stack over the whole catalog
instead — N*T rows per layer, independent of B — and indexes the triple
batch out of it; identical math (tests/test_pinsage_model.py).

This bench times _train_chunk per batch at several B with the strategy
off/on (same in-jit difference methodology as bench.py) and prints one
JSON line of edges/s for both arms.  Also times the 1M-catalog embed
sweep via both embed_all strategies.
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
    ap.add_argument("--tracks", type=int, default=20_000)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[128, 1024, 4096])
    ap.add_argument("--chunk-small", type=int, default=20)
    ap.add_argument("--chunk-large", type=int, default=100)
    ap.add_argument("--embed-tracks", type=int, default=1_000_000)
    ap.add_argument("--skip-embed", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()

    from gcn_song_embeddings_tpu.config import (
        RunConfig,
        config_with_overrides,
    )
    from gcn_song_embeddings_tpu.models.pinsage import (
        embed_all,
        init_pinsage,
    )
    from gcn_song_embeddings_tpu.train import trainer as trn

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    N, FEAT, T, L = args.tracks, 512, 3, 2

    features = jnp.asarray(rng.normal(size=(N, FEAT)).astype(np.float32))
    nb_n = jnp.asarray(rng.integers(0, N, (N, 100)).astype(np.int32))
    nb_w = jnp.asarray(np.sort(rng.random((N, 100)).astype(np.float32),
                               axis=1)[:, ::-1].copy())
    positives = jnp.asarray(rng.integers(0, N, (50_000, 2)).astype(np.int32))
    params = init_pinsage(jax.random.PRNGKey(0), L, FEAT, 512, 128)

    def timed(f):
        t0 = time.perf_counter()
        jax.device_get(f())
        return time.perf_counter() - t0

    def edges_per_step(b):
        m, tot = 3 * b, 0
        for _ in range(L):
            tot += m * T
            m *= (T + 1)
        return tot

    results = {"n_tracks": N}
    for B in args.batches:
        for strat in ("off", "on"):
            cfg = config_with_overrides(RunConfig(run_name="fgbench"), {
                "model.in_dim": FEAT, "train.batch_size": B,
                "train.fullgraph_forward": strat,
            })
            tx = trn.make_optimizer(cfg)
            opt_state = tx.init(params)

            def chunk(n_chunk, i):
                p, o, m = trn._train_chunk(
                    params, opt_state, features, nb_w, nb_n, positives,
                    jax.random.fold_in(jax.random.PRNGKey(1), i),
                    cfg.train, cfg.model, N, n_chunk, tx)
                return m.sum()

            s, bg = args.chunk_small, args.chunk_large
            timed(lambda: chunk(s, 0))
            timed(lambda: chunk(bg, 1))
            diffs = []
            for i in range(3):
                t1 = timed(lambda: chunk(s, 2 + 2 * i))
                t2 = timed(lambda: chunk(bg, 3 + 2 * i))
                diffs.append((t2 - t1) / (bg - s))
            ms = float(np.median(diffs)) * 1e3
            eps = edges_per_step(B) / (ms * 1e-3)
            log(f"B={B} fullgraph={strat}: {ms:.3f} ms/batch "
                f"({eps / 1e6:.1f}M edges/s)")
            results[f"B{B}_{strat}_ms"] = round(ms, 4)
            results[f"B{B}_{strat}_Medges_s"] = round(eps / 1e6, 1)

    if not args.skip_embed:
        NE = args.embed_tracks
        featsE = jnp.asarray(
            rng.normal(size=(NE, 128)).astype(np.float32))
        nbE = jnp.asarray(rng.integers(0, NE, (NE, T)).astype(np.int32))
        nwE = jnp.asarray(rng.random((NE, T)).astype(np.float32))
        pE = init_pinsage(jax.random.PRNGKey(0), L, 128, 512, 128)
        for strat in ("blocks", "fullgraph"):
            def sweep(strat=strat):
                return embed_all(pE, featsE, nwE, nbE, NE, L, T,
                                 batch_size=4096, strategy=strat)[-1]
            t1 = timed(sweep)
            t2 = timed(sweep)
            log(f"embed {NE} tracks strategy={strat}: cold {t1:.2f}s "
                f"warm {t2:.2f}s ({NE / t2 / 1e3:.1f}k tracks/s)")
            results[f"embed1m_{strat}_s"] = round(t2, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
