"""bf16 A/B at the FLOP-bound bench shape (round 4 follow-up).

bench.py's FLOP-bound line (L4, hidden 1024, out 256, B=4096, full-graph)
measured 38.1 TFLOP/s f32 = 41% of the no-gather ceiling; the op mix
there is part gather/HBM traffic, part matmul.  `train.dtype="bfloat16"`
halves both the gathered bytes and the matmul time (MXU native width) —
this script measures both arms with bench.py's own machinery and writes
results/flopbound_bf16.json.  (The B=128 headline shape measured bf16
NEUTRAL — it is latency-bound; this shape is where bf16 should pay.)

Usage: python scripts/flopbound_bf16_ab.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import numpy as np

    import bench
    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    features, nb_w, nb_n, positives = bench.build_problem()
    flops = bench.flopbound_matmul_flops(bench.N_TRACKS)

    out = {}
    for dtype in ("float32", "bfloat16"):
        import jax
        import jax.numpy as jnp
        import time

        from gcn_song_embeddings_tpu.config import (
            RunConfig,
            config_with_overrides,
        )
        from gcn_song_embeddings_tpu.models.pinsage import init_pinsage
        from gcn_song_embeddings_tpu.train import trainer as trn

        cfg = config_with_overrides(RunConfig(run_name=f"fb_{dtype}"), {
            "model.in_dim": bench.FEAT_DIM,
            "model.hidden_dim": bench.FB_HIDDEN,
            "model.out_dim": bench.FB_OUT,
            "model.n_layers": bench.FB_LAYERS, "model.T": bench.T,
            "train.batch_size": bench.FB_BATCH,
            "train.fullgraph_forward": "on",
            "train.dtype": dtype,
        })
        params = init_pinsage(jax.random.PRNGKey(0), bench.FB_LAYERS,
                              bench.FEAT_DIM, bench.FB_HIDDEN, bench.FB_OUT)
        tx = trn.make_optimizer(cfg)
        opt_state = tx.init(params)
        fj, wj = jnp.asarray(features), jnp.asarray(nb_w)
        nj, pj = jnp.asarray(nb_n), jnp.asarray(positives)
        key = jax.random.PRNGKey(2)

        def run_chunk(n_chunk, i):
            nonlocal params, opt_state
            k = jax.random.fold_in(key, i)
            t0 = time.time()
            params, opt_state, m = trn._train_chunk(
                params, opt_state, fj, wj, nj, pj, k, cfg.train, cfg.model,
                bench.N_TRACKS, n_chunk, tx)
            np.asarray(m)
            return time.time() - t0

        run_chunk(bench.FB_CHUNK_SMALL, 0)
        run_chunk(bench.FB_CHUNK_LARGE, 1)
        diffs = []
        for i in range(3):
            t_s = run_chunk(bench.FB_CHUNK_SMALL, 2 + 2 * i)
            t_l = run_chunk(bench.FB_CHUNK_LARGE, 3 + 2 * i)
            diffs.append((t_l - t_s)
                         / (bench.FB_CHUNK_LARGE - bench.FB_CHUNK_SMALL))
        per_batch = float(np.median(diffs))
        tflops = flops / per_batch / 1e12
        out[dtype] = {"step_ms": round(per_batch * 1e3, 3),
                      "tflops": round(tflops, 2),
                      "mfu_vs_f32_ceiling": round(
                          tflops / bench.V5E_CEILING_TFLOPS, 3)}
        print(dtype, out[dtype], file=sys.stderr, flush=True)

    out["bf16_speedup"] = round(out["float32"]["step_ms"]
                                / out["bfloat16"]["step_ms"], 3)
    path = os.path.join(REPO, "results", "flopbound_bf16.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
