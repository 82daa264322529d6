"""bf16 A/B at the FLOP-bound bench shape (round 4 follow-up).

bench.py's FLOP-bound line (L4, hidden 1024, out 256, B=4096, full-graph)
measured 38.1 TFLOP/s f32 = 41% of the no-gather ceiling; the op mix
there is part gather/HBM traffic, part matmul.  `train.dtype="bfloat16"`
halves both the gathered bytes and the matmul time (MXU native width) —
this script runs bench.measure_flopbound (THE bench harness, not a copy)
at both dtypes and writes results/flopbound_bf16.json.

History: round 4 measured NEUTRAL (1.006x) and read it as evidence for
a descriptor-rate-limited gather engine.  Round 5's direct controls
refuted that reading twice over: the wide-row control (~2x) and the
bf16-row gather rate (~1.95x) show the engine is BYTE-bound — the round-4
neutrality was a bug: conv_apply's preferred_element_type=f32 upcast the
running h after layer 0, so only the FIRST layer's gather was ever bf16.
fullgraph_embeddings now stores h back at the feature dtype between
layers (f32 unchanged); this script measures the honest bf16 effect.

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
    import bench
    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    features, nb_w, nb_n, positives = bench.build_problem()

    out = {}
    for dtype in ("float32", "bfloat16"):
        per_batch, tflops = bench.measure_flopbound(
            features, nb_w, nb_n, positives, dtype=dtype)
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
