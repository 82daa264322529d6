"""Multi-device scaling-efficiency benchmark (BASELINE.md target:
edges/s scaling efficiency >= 85% from 1 device to N).

Measures sharded train-step throughput (aggregate edges/s) on growing
submeshes of the available devices: 1, 2, 4, ..., N.  On real multi-chip
hardware this exercises ICI collectives; in this environment it runs on the
virtual CPU mesh (set XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu) to validate the scaling *structure* — the per-device
batch stays constant (weak scaling) so ideal scaling is flat step time.

Prints one JSON summary with per-mesh throughput and efficiency vs 1 device.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bench.py --force-cpu
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
    ap.add_argument("--force-cpu", action="store_true")
    ap.add_argument("--tracks", type=int, default=20000)
    ap.add_argument("--feature-dim", type=int, default=256)
    ap.add_argument("--batch-per-device", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--graph-axis", type=int, default=2,
                    help="graph-shard axis size when the mesh allows it")
    args = ap.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gcn_song_embeddings_tpu.config import (
        RunConfig,
        config_with_overrides,
    )
    from gcn_song_embeddings_tpu.parallel.mesh import make_mesh
    from gcn_song_embeddings_tpu.parallel.train_step import ShardedTrainer

    devices = jax.devices()
    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log(f"{len(devices)} devices: {devices[0].platform}")

    rng = np.random.default_rng(0)
    n = args.tracks
    feat = rng.normal(size=(n, args.feature_dim)).astype(np.float32)
    nb_n = rng.integers(0, n, size=(n, 100)).astype(np.int32)
    nb_w = np.sort(rng.random((n, 100)).astype(np.float32), 1)[:, ::-1]
    pos = rng.integers(0, n, size=(50000, 2)).astype(np.int32)

    sizes = []
    d = 1
    while d <= len(devices):
        sizes.append(d)
        d *= 2

    results = {}
    for nd in sizes:
        n_graph = args.graph_axis if nd % args.graph_axis == 0 and \
            nd >= args.graph_axis else 1
        mesh = make_mesh(n_dp=nd // n_graph, n_graph=n_graph,
                         devices=devices[:nd])
        cfg = config_with_overrides(RunConfig(), {
            "model.in_dim": args.feature_dim,
            "train.batch_size": args.batch_per_device * nd,
        })
        tr = ShardedTrainer(mesh, cfg, n, feat, (nb_w.copy(), nb_n), pos)
        # warm up with the SAME chunk length as the timed run: the jitted
        # chunk step traces on the [steps, 2] key shape, so a different
        # warmup length would leave a full recompile inside the timing
        np.asarray(tr.train_chunk(args.steps))
        t0 = time.time()
        losses = tr.train_chunk(args.steps)
        np.asarray(losses)
        dt = (time.time() - t0) / args.steps
        # aggregate edges per step: 3B nodes * sum_l T*(T+1)^l
        T, L = cfg.model.T, cfg.model.n_layers
        m = 3 * cfg.train.batch_size
        edges = sum(m * (T + 1) ** lv * T for lv in range(L))
        results[nd] = {"mesh": dict(mesh.shape),
                       "step_ms": round(dt * 1e3, 2),
                       "edges_per_s": round(edges / dt, 0)}
        log(f"{nd} devices {dict(mesh.shape)}: {dt*1e3:.2f} ms/step")

    base = results[sizes[0]]["edges_per_s"] / sizes[0]
    for nd in sizes:
        per_dev = results[nd]["edges_per_s"] / nd
        results[nd]["scaling_efficiency"] = round(per_dev / base, 3)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
