"""SimpleSimilarity family: link-prediction score recommenders.

Reference baselines.py:153-192: `JaccardIndex`, `AdamicAdar`, `Preferential`
score every query against all nodes on the (optionally bipartite-projected)
graph via per-pair networkx calls.  Here each model is a batched
sparse-matrix computation (ops/graph_ops.py) + device top-k.

Note the reference bug (SURVEY §7b.7): its `JaccardIndex` is mis-bound to
`nx.preferential_attachment` (baselines.py:180).  The capability — a real
Jaccard-index recommender — is implemented correctly here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gcn_song_embeddings_tpu.models.baselines.base import PredictionModel
from gcn_song_embeddings_tpu.ops import graph_ops


class SimpleSimilarity(PredictionModel):
    """Base: score(queries) -> [q, N] matrix, then device top-k."""

    score_fn = None  # staticmethod(adj, queries) -> np.ndarray

    def __init__(self, projected: bool = True, batch_size: int = 256):
        self.projected = projected
        self.batch_size = batch_size

    def train(self, graph, ids, train_set, test_set, features) -> None:
        self.adj = graph_ops.adjacency_tracks(graph,
                                              projected=self.projected)
        self.n = len(ids)

    def knn(self, nodeset, k):
        nodeset = np.asarray(nodeset, dtype=np.int64)
        w_out, n_out = [], []
        for start in range(0, len(nodeset), self.batch_size):
            q = nodeset[start:start + self.batch_size]
            scores = type(self).score_fn(self.adj, q)
            w, n = jax.lax.top_k(jnp.asarray(scores[:, :self.n]), k)
            w_out.append(np.asarray(w))
            n_out.append(np.asarray(n))
        return np.concatenate(w_out, 0), np.concatenate(n_out, 0)


class JaccardIndex(SimpleSimilarity):
    score_fn = staticmethod(graph_ops.jaccard_scores)


class AdamicAdar(SimpleSimilarity):
    score_fn = staticmethod(graph_ops.adamic_adar_scores)


class Preferential(SimpleSimilarity):
    score_fn = staticmethod(graph_ops.preferential_scores)
