"""PinSage-as-a-baseline adapter (reference PinSageWrapper,
baselines.py:331-377): trains the framework's PinSage trainer behind the
`EmbeddingModel` interface so the eval harness can compare it against the
CF / graph / content baselines.

Hyperparameter overrides are a typed dotted-path dict (e.g.
{"train.epochs": 10, "model.T": 5}) instead of the reference's `exec` pokes
(baselines.py:347-348).
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional

import numpy as np

from gcn_song_embeddings_tpu.config import RunConfig, config_with_overrides
from gcn_song_embeddings_tpu.data.device import DeviceGraph
from gcn_song_embeddings_tpu.models.baselines.base import EmbeddingModel
from gcn_song_embeddings_tpu.ops.knn import knn_from_emb


class PinSageWrapper(EmbeddingModel):
    def __init__(self, train_params: Optional[dict[str, Any]] = None,
                 run_name: Optional[str] = None, log: bool = True,
                 base_run_dir: str = "temp_runs",
                 nbhds: Optional[tuple[np.ndarray, np.ndarray]] = None):
        self.train_params = train_params or {}
        self.run_name = run_name or time.strftime("%X_%x").replace("/", "-")
        self.log = log
        self.base_run_dir = base_run_dir
        self.embedding: np.ndarray | None = None
        self._nbhds = nbhds

    def train(self, graph, ids, train_set, test_set, features) -> None:
        from gcn_song_embeddings_tpu.train.trainer import PinSageTrainer

        cfg = config_with_overrides(RunConfig(run_name=self.run_name),
                                    self.train_params)
        device_graph = DeviceGraph.from_graph(graph)
        nbhds_path = getattr(graph, "nbhds_path", None)
        trainer = PinSageTrainer(
            device_graph, len(ids), np.asarray(features),
            np.asarray(train_set), cfg=cfg, base_run_dir=self.base_run_dir,
            nbhds_path=nbhds_path, nbhds=self._nbhds,
            log=self.log, load_save=False, verbose=False)
        trainer.train()
        emb_path = os.path.join(self.base_run_dir, self.run_name, "emb.npy")
        trainer.save_embeddings(emb_path)
        self.embedding = np.load(emb_path)
        self.trainer = trainer

    def embed(self, nodeset):
        return self.embedding[np.asarray(nodeset)]

    def knn(self, nodeset, k):
        return knn_from_emb(self.embedding, np.asarray(nodeset), k)
