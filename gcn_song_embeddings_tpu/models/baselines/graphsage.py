"""Unsupervised GNN-embedding baseline (GraphSAGE / GAT / GCN).

Capability of the reference's vendored "GNNs easily called" library
(lib/gnns/GNNs_unsupervised.py: GNN facade with mean-aggregator SageLayers,
uniform neighbor sampling num_sample=10, unsupervised margin loss on
random-walk positives vs distant negatives) and the `GraphSAGE` baseline
that wraps it (baselines.py:517-544 — broken as shipped, SURVEY §7b.8; the
capability is implemented correctly here).  The encoder family (and the
supervised/regression facades) lives in `models/gnnlib.py`.
"""

from __future__ import annotations

import numpy as np

from gcn_song_embeddings_tpu.models.baselines.base import EmbeddingModel
from gcn_song_embeddings_tpu.models.gnnlib import GNNCore
from gcn_song_embeddings_tpu.ops.knn import knn_from_emb


class GraphSAGEUnsup:
    """2-layer sampled GNN encoder trained with a triplet margin loss on
    1-hop positives (the lib's Unsup_Loss 'margin' mode semantics).
    `layer` selects the aggregator family: sage (default), gcn, or gat."""

    def __init__(self, hidden_dim: int = 128, out_dim: int = 128,
                 n_sample: int = 10, steps: int = 1500, batch: int = 512,
                 lr: float = 1e-3, margin: float = 3.0, seed: int = 0,
                 layer: str = "sage"):
        self.core = GNNCore(layer=layer, task="unsupervised",
                            hidden_dim=hidden_dim, out_dim=out_dim,
                            n_sample=n_sample, steps=steps, batch=batch,
                            lr=lr, margin=margin, seed=seed)
        self.out_dim = out_dim

    @property
    def losses(self):
        return self.core.losses

    def fit(self, indptr: np.ndarray, indices: np.ndarray,
            features: np.ndarray | None, n_nodes: int) -> np.ndarray:
        return self.core.fit(indptr, indices, features, n_nodes)


class GraphSAGE(EmbeddingModel):
    """GNN-embedding recommender over the (optionally projected) track graph
    (the working version of reference baselines.py:517-544).  Pass
    layer="gcn"/"gat" for the sibling encoder families."""

    def __init__(self, projected: bool = True, **kwargs):
        self.projected = projected
        self.kwargs = kwargs
        self.embedding: np.ndarray | None = None

    def train(self, graph, ids, train_set, test_set, features) -> None:
        from gcn_song_embeddings_tpu.ops.graph_ops import adjacency_tracks

        adj = adjacency_tracks(graph, projected=self.projected).tocsr()
        model = GraphSAGEUnsup(**self.kwargs)
        feats = np.asarray(features, dtype=np.float32) \
            if features is not None else None
        self.embedding = model.fit(adj.indptr, adj.indices, feats, len(ids))

    def embed(self, nodeset):
        return self.embedding[np.asarray(nodeset)]

    def knn(self, nodeset, k):
        return knn_from_emb(self.embedding, np.asarray(nodeset), k)
