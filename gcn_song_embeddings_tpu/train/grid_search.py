"""Hyperparameter grid search (reference grid_search.py).

The reference builds a cartesian grid, trains each config with `exec`-set
params into runs_gs/gridsearch#<i.j.k...>, evaluates mrr + hitrate@100 via
EmbLoader, and writes a JSON sorted by MRR (grid_search.py:49-105).  Here
the grid is a typed {dotted.param: [values]} dict and every run directory
carries its full RunConfig.
"""

from __future__ import annotations

import hashlib
import itertools
import json
from typing import Any

import numpy as np

from gcn_song_embeddings_tpu.config import RunConfig, config_with_overrides
from gcn_song_embeddings_tpu.data.device import DeviceGraph
from gcn_song_embeddings_tpu.evals import metrics as M
from gcn_song_embeddings_tpu.ops.knn import knn_from_emb


def get_param_sets(grid: dict[str, list[Any]]
                   ) -> list[tuple[str, dict[str, Any]]]:
    """Cartesian product with reference-style run ids "i.j.k..."
    (grid_search.py:49-78)."""
    keys = list(grid.keys())
    out = []
    for combo in itertools.product(*(range(len(grid[k])) for k in keys)):
        run_id = ".".join(str(i) for i in combo)
        params = {k: grid[k][i] for k, i in zip(keys, combo)}
        out.append((run_id, params))
    return out


def grid_search(graph, train_pos: np.ndarray, test_pos: np.ndarray,
                grid: dict[str, list[Any]],
                base_cfg: RunConfig | None = None,
                base_run_dir: str = "./runs_gs",
                out_path: str | None = "grid_search.json",
                eval_k: int = 1000, verbose: bool = True) -> list[dict]:
    """Train + evaluate every grid point; returns results sorted by MRR
    descending (reference grid_search.py:80-105)."""
    from gcn_song_embeddings_tpu.train.trainer import PinSageTrainer

    base_cfg = base_cfg or RunConfig()
    device_graph = DeviceGraph.from_graph(graph)
    results = []
    nbhds_path = getattr(graph, "nbhds_path", None)

    for run_id, params in get_param_sets(grid):
        # suffix a value hash: run dirs keyed by grid INDEX alone would
        # resume a stale fully-trained checkpoint when the grid's values
        # change between invocations (load_save=True + shape-only
        # checkpoint validation) and report its metrics as the new
        # config's
        tag = hashlib.sha1(
            json.dumps(params, sort_keys=True).encode()).hexdigest()[:8]
        run_name = f"gridsearch#{run_id}-{tag}"
        cfg = config_with_overrides(base_cfg, params).replace(
            run_name=run_name)
        if verbose:
            print(f"[grid] {run_name}: {params}")
        trainer = PinSageTrainer(
            device_graph, graph.n_items, graph.features, train_pos,
            cfg=cfg, base_run_dir=base_run_dir, nbhds_path=nbhds_path,
            log=False, load_save=True, verbose=verbose)
        trainer.train()
        emb = trainer.embed()
        k = min(eval_k, graph.n_items - 1)
        _, knn_n = knn_from_emb(emb, k=k)
        res = {
            "id": run_id,
            "params": params,
            "mrr": M.mrr(knn_n, test_pos, k),
            "hit_rate": M.hit_rate(knn_n, test_pos, min(100, k)),
        }
        results.append(res)
        if verbose:
            print(f"[grid] {run_name}: mrr={res['mrr']:.5f} "
                  f"hr@100={res['hit_rate']:.5f}")

    results.sort(key=lambda r: r["mrr"], reverse=True)
    if out_path:
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(results, f, indent=2)
    return results
