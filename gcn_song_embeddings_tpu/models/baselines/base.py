"""Recommender interfaces (reference baselines.py:33-53).

`train(graph, ids, train_set, test_set, features)` then `knn(nodeset, k)`
-> (weights [n, k], nodes [n, k]); EmbeddingModel adds `embed(nodeset)`.
The graph argument is the framework's `SongGraph` (host CSR view); models
that need device compute build a `DeviceGraph` from it.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np


class PredictionModel(ABC):
    """Base recommender (reference PredictionModel, baselines.py:33-46)."""

    @abstractmethod
    def train(self, graph, ids, train_set, test_set, features) -> None:
        """Fit on the graph + train positives; test_set is provided for
        parity with the reference signature and must not be trained on."""

    @abstractmethod
    def knn(self, nodeset: np.ndarray, k: int
            ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k recommendations for each query: (weights, nodes)."""


class EmbeddingModel(PredictionModel):
    """A recommender backed by node embeddings (baselines.py:48-53)."""

    @abstractmethod
    def embed(self, nodeset: np.ndarray) -> np.ndarray:
        """Return embedding rows for `nodeset`."""
