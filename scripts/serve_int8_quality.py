"""Measure int8 serving quality vs f32 (VERDICT r3 item 6).

`serve.py` claims the int8 path costs ~1% hit@100 / ~10% MRR on
robust-margin embeddings and collapses on reference-margin (1e-5)
embeddings whose ranking signal lives below int8 resolution.  This
script turns that prose into a results artifact: train PinSage on the
hard benchmark at BOTH margins (same dataset/split), rank every test
pair under (a) f32 cosine and (b) the exact int8 scoring the serving
index uses (`ops/quantize.int8_topk` math: int8 x int8 MXU contraction,
per-row scales), and write results/serve_int8.json with the paired
metrics.

Usage: python scripts/serve_int8_quality.py [--work-dir /tmp/colisten_ab]
(defaults to the colisten_ab work dir so the dataset + PPR cache and any
already-trained runs are reused).
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


def int8_rank_eval(emb, test_pairs, hit_ks=(10, 100, 500), mrr_k=1000,
                   batch=2048):
    """Rank metrics under the serving index's int8 scoring: quantize the
    unit-row table once (quantize_rows), quantize each query row, score
    with the int8 dot (same math as ops/quantize.int8_topk), and take the
    positive's rank.  Self column excluded and ties counted at AVERAGE
    rank, matching evals/device_eval.rank_eval — int8 rounding collapses
    distinct rows toward identical codes, so tie-optimistic ranking here
    would understate the int8 drop vs the tie-fair f32 arm."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gcn_song_embeddings_tpu.ops.quantize import (
        int8_scores,
        quantize_rows,
    )

    emb = np.asarray(emb, np.float32)
    unit = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                            1e-12)
    vals, scales = quantize_rows(jnp.asarray(unit))
    pairs = np.asarray(test_pairs, np.int32)
    n = pairs.shape[0]

    @jax.jit
    def rank_block(q_ids, p_ids):
        # THE serving scorer (ops/quantize.int8_scores) — not a copy
        sims = int8_scores(vals, scales, jnp.asarray(unit)[q_ids])
        # exclude self (rank among OTHER items, like the f32 evaluator)
        rows = jnp.arange(q_ids.shape[0])
        sims = sims.at[rows, q_ids].set(-jnp.inf)
        pos = sims[rows, p_ids]
        # pos comes from the same scored matrix, so exact equality is the
        # right tie predicate here (int8 scores are discrete)
        better = jnp.sum(sims > pos[:, None], axis=1)
        tied = jnp.sum(sims == pos[:, None], axis=1) - 1  # minus pos itself
        # unfloored half-unit average rank, matching device_eval
        # (advisor round 4)
        return 1.0 + better + tied.astype(jnp.float32) * 0.5

    ranks = np.empty(n, np.float64)
    for s in range(0, n, batch):
        e = min(s + batch, n)
        blk = np.zeros((batch, 2), np.int32)
        blk[: e - s] = pairs[s:e]
        r = np.asarray(rank_block(jnp.asarray(blk[:, 0]),
                                  jnp.asarray(blk[:, 1])))
        ranks[s:e] = r[: e - s]
    out = {f"hit@{k}": float((ranks <= k).mean()) for k in hit_ks}
    capped = np.minimum(ranks, mrr_k)
    out[f"mrr@{mrr_k}"] = float((1.0 / capped).mean())
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/colisten_ab")
    ap.add_argument("--tracks", type=int, default=20_000)
    ap.add_argument("--collections", type=int, default=4_000)
    ap.add_argument("--positives", type=int, default=60_000)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--out", default="results/serve_int8.json")
    args = ap.parse_args()

    import jax
    import numpy as np

    from gcn_song_embeddings_tpu.config import (
        RunConfig,
        config_with_overrides,
    )
    from gcn_song_embeddings_tpu.data import SongGraph
    from gcn_song_embeddings_tpu.data.device import DeviceGraph
    from gcn_song_embeddings_tpu.evals.device_eval import rank_eval
    from gcn_song_embeddings_tpu.train.trainer import PinSageTrainer

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())

    from gcn_song_embeddings_tpu.data.synth import ensure_hard_dataset

    ds_path = ensure_hard_dataset(
        os.path.join(args.work_dir, "ds"), n_tracks=args.tracks,
        n_collections=args.collections, n_positives=args.positives,
        seed=0, log=log)

    g = SongGraph(ds_path,
                  features_file=os.path.join(ds_path, "features.npy"))
    dg = DeviceGraph.from_graph(g)
    train_pos, test_pos = g.load_positives_split(
        os.path.join(ds_path, "positives.json"))

    rows = {}
    for name, margin, lr in (("margin_0.1", 0.1, 1e-3),
                             ("margin_1e-5", 1e-5, 1e-3)):
        cfg = config_with_overrides(
            RunConfig(run_name=f"int8q_{name}"), {
                "train.epochs": args.epochs,
                "train.margin": margin, "train.lr": lr,
                "walk.batch_walkers": 8192})
        t0 = time.time()
        tr = PinSageTrainer(dg, g.n_items, g.features, train_pos, cfg=cfg,
                            base_run_dir=os.path.join(args.work_dir,
                                                      "runs"),
                            nbhds_path=os.path.join(ds_path,
                                                    "neighborhoods.npz"),
                            log=False, load_save=True, verbose=True)
        tr.train()
        emb = np.asarray(tr.embed(bsize=4096))
        log(f"{name}: trained+embedded in {time.time() - t0:.1f}s")
        f32 = rank_eval(emb, test_pos, hit_ks=(10, 100, 500), mrr_k=1000,
                        batch=4096)
        i8 = int8_rank_eval(emb, test_pos)
        rows[name] = {
            "f32": {k: round(v, 5) for k, v in f32.items()},
            "int8": {k: round(v, 5) for k, v in i8.items()},
            "hit100_rel_drop": round(
                1 - i8["hit@100"] / max(f32["hit@100"], 1e-12), 4),
            "mrr_rel_drop": round(
                1 - i8["mrr@1000"] / max(f32["mrr@1000"], 1e-12), 4),
        }
        log(name, json.dumps(rows[name]))

    out_path = os.path.join(REPO, args.out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({"dataset": {"tracks": g.n_items,
                               "test_pairs": int(len(test_pos)),
                               "kind": "hard", "epochs": args.epochs},
                   "rows": rows}, f, indent=2)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
