"""Simple baselines: Random, EmbLoader, PersPageRank, JaccardFast.

Capabilities of reference baselines.py:107-151 (PersPageRank), 194-220
(JaccardFast), 281-328 (EmbLoader), 380-397 (Random) — re-designed on the
framework's device kernels: PersPageRank reuses the walk/PPR kernels at query
time, JaccardFast computes its intersection counts with one sparse SpGEMM and
scores/topks on device, EmbLoader serves any saved embedding matrix through
the tiled cosine-topk kernel.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gcn_song_embeddings_tpu.data.device import DeviceGraph
from gcn_song_embeddings_tpu.models.baselines.base import (
    EmbeddingModel,
    PredictionModel,
)
from gcn_song_embeddings_tpu.ops.knn import knn_from_emb
from gcn_song_embeddings_tpu.ops.ppr import (
    sample_neighborhood_topt_tables,
)
from gcn_song_embeddings_tpu.ops.walks import fused_walk_tables
from gcn_song_embeddings_tpu.utils.pipeline import lagged


class Random(PredictionModel):
    """Random recommendations (reference Random, baselines.py:380-397)."""

    def __init__(self, seed: int = 0):
        self.seed = seed

    def train(self, graph, ids, train_set, test_set, features) -> None:
        self.n = len(ids)

    def knn(self, nodeset, k):
        # key the stream on the queries so batched sweeps don't repeat the
        # same permutations for every batch
        nodeset = np.asarray(nodeset)
        rng = np.random.default_rng(
            [self.seed, int(nodeset[0]) if len(nodeset) else 0,
             len(nodeset)])
        nq = len(nodeset)
        if k * 4 >= self.n:
            # dense catalogs: per-query permutations are cheap and exact
            nodes = np.stack([rng.permutation(self.n)[:k]
                              for _ in range(nq)])
        else:
            # k << n: full per-query permutations would make the
            # harness's all-catalog sweep O(N^2); oversample with
            # replacement, dedupe per row, and top up until k distinct
            # samples exist (loops until satisfied — one round almost
            # always suffices at k <= n/4)
            cand = rng.integers(0, self.n, size=(nq, 4 * k))
            nodes = np.empty((nq, k), dtype=np.int64)
            for i in range(nq):
                u = np.unique(cand[i])
                while u.size < k:
                    u = np.unique(np.concatenate(
                        [u, rng.integers(0, self.n, 4 * k)]))
                nodes[i] = rng.permutation(u)[:k]
        return np.ones_like(nodes, dtype=np.float32), nodes.astype(np.int32)


class EmbLoader(EmbeddingModel):
    """Serve precomputed embeddings as a recommender
    (reference EmbLoader, baselines.py:297-328).

    Accepts a single `<dir>/emb.npy` / explicit .npy path (this framework's
    artifact) or a directory of per-id `.npy` / `.pt` files (reference
    layout, pinsage_training.py:297-327).
    """

    def __init__(self, load_path: str):
        self.load_path = load_path
        self.embedding: np.ndarray | None = None

    def train(self, graph, ids, train_set, test_set, features) -> None:
        p = self.load_path
        if os.path.isfile(p) and p.endswith(".npy"):
            self.embedding = np.load(p)
        elif os.path.isfile(os.path.join(p, "emb.npy")):
            self.embedding = np.load(os.path.join(p, "emb.npy"))
        else:
            from gcn_song_embeddings_tpu.data.graph import load_feature_dir

            self.embedding = load_feature_dir(p, ids)
        if self.embedding.shape[0] != len(ids):
            raise ValueError(
                f"embedding rows {self.embedding.shape[0]} != ids {len(ids)}")

    def embed(self, nodeset):
        return self.embedding[np.asarray(nodeset)]

    def knn(self, nodeset, k):
        return knn_from_emb(self.embedding, np.asarray(nodeset), k)


class PersPageRank(PredictionModel):
    """PPR-at-query-time recommender (reference PersPageRank,
    baselines.py:107-151: same restart walks with n_hops=1000, executed per
    kNN query).  Runs entirely on device via the walk + top-T kernels.

    colisten_copies > 0 (framework extension, not in the reference)
    materializes train-positive pairs as pseudo-collections before
    walking (data/device.augment_with_colisten) — measured the single
    most PRECISE ranker on the hard benchmark (hit@100 0.662 / mrr 0.194
    vs 0.411/0.061 plain; RESULTS.md round-4 walk-vs-conv control)."""

    def __init__(self, n_hops: int = 1000, alpha: float = 0.85,
                 seed: int = 0, batch_size: int = 1024,
                 colisten_copies: int = 0):
        self.n_hops = n_hops
        self.alpha = alpha
        self.seed = seed
        self.batch_size = batch_size
        self.colisten_copies = colisten_copies

    def train(self, graph, ids, train_set, test_set, features) -> None:
        self.device_graph = DeviceGraph.from_graph(graph)
        if self.colisten_copies > 0:
            from gcn_song_embeddings_tpu.data.device import (
                augment_with_colisten,
            )

            self.device_graph = augment_with_colisten(
                self.device_graph, np.asarray(train_set),
                self.colisten_copies)
        # extent-joined tables built ONCE (bit-identical chain, 2.2x
        # faster hops); inside the per-batch jit the O(nnz) join would
        # re-run on device every dispatch
        self.tables = fused_walk_tables(self.device_graph)

    def knn(self, nodeset, k):
        nodeset = np.asarray(nodeset, dtype=np.int32)
        nq = len(nodeset)
        bs = self.batch_size
        key = jax.random.PRNGKey(self.seed)
        w_out = np.empty((nq, k), dtype=np.float32)
        n_out = np.empty((nq, k), dtype=np.int32)

        def dispatch(start):
            stop = min(start + bs, nq)
            block = np.full((bs,), nodeset[stop - 1], dtype=np.int32)
            block[: stop - start] = nodeset[start:stop]
            bkey = jax.random.fold_in(key, start)
            w, n = sample_neighborhood_topt_tables(
                self.tables, jnp.asarray(block), self.n_hops, self.alpha,
                k, bkey)
            return start, stop, w, n

        for start, stop, w, n in lagged(
                dispatch(s) for s in range(0, nq, bs)):
            w_out[start:stop] = np.asarray(w)[: stop - start]
            n_out[start:stop] = np.asarray(n)[: stop - start]
        return w_out, n_out


class WalkEmbedHybrid(PredictionModel):
    """Walk-precision + embedding-recall hybrid (framework extension; no
    reference counterpart).

    The round-4 walk-vs-conv control (RESULTS.md) showed the two model
    families split the hard benchmark: query-time PPR over the
    colisten-augmented graph is the most PRECISE ranker (hit@10/100,
    MRR), while the PinSage embedding generalizes much further down the
    list (hit@500, coverage).  This model takes both in one ranking: each
    top-k list starts with the walk's nonzero-visit neighbors in walk
    order and is completed by embedding-cosine rank, skipping items the
    walk already placed.

    `emb_source` is an embedding matrix, an `emb.npy` path, or a run
    directory (EmbLoader semantics)."""

    def __init__(self, emb_source, n_hops: int = 1000, alpha: float = 0.85,
                 seed: int = 0, batch_size: int = 1024,
                 colisten_copies: int = 1):
        self.walker = PersPageRank(n_hops=n_hops, alpha=alpha, seed=seed,
                                   batch_size=batch_size,
                                   colisten_copies=colisten_copies)
        self.emb_source = emb_source

    def train(self, graph, ids, train_set, test_set, features) -> None:
        self.walker.train(graph, ids, train_set, test_set, features)
        if isinstance(self.emb_source, np.ndarray):
            self.embedding = self.emb_source
        else:
            loader = EmbLoader(self.emb_source)
            loader.train(graph, ids, train_set, test_set, features)
            self.embedding = loader.embedding

    def knn(self, nodeset, k):
        from gcn_song_embeddings_tpu.ops.merge import merge_topk

        walk_w, walk_n = self.walker.knn(nodeset, k)
        emb_w, emb_n = knn_from_emb(self.embedding,
                                    np.asarray(nodeset), k)
        # device-side sort-based merge (ops/merge.py) — the per-row
        # Python set-merge this replaces cost 40.9 s per 20k queries at
        # k=1000 (round-4 roster CSV); merge_ranked_lists below is kept
        # as the CI oracle
        w, n = merge_topk(jnp.asarray(walk_w), jnp.asarray(walk_n),
                          jnp.asarray(emb_w), jnp.asarray(emb_n))
        return np.asarray(w), np.asarray(n)


def merge_ranked_lists(head_w: np.ndarray, head_n: np.ndarray,
                       tail_w: np.ndarray, tail_n: np.ndarray
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Per row: keep `head` entries with weight > 0 in order, then fill
    with `tail` entries not already present.  Head weights are offset
    above the tail's range so downstream consumers that re-sort by weight
    preserve the merged ORDER (scores are ordinal here, like the
    reference's PPR visit probabilities).

    This is the readable numpy oracle for ops/merge.merge_topk (the
    device kernel production paths use); the CI test pins the two
    together.  Head and tail widths may differ (knn_from_emb clamps its
    k to n-1): the output is max(head_k, tail_k) wide, short rows filled
    with the last placed node at weight -inf."""
    B, head_k = head_n.shape
    tail_k = tail_n.shape[1]
    k = max(head_k, tail_k)
    out_w = np.full((B, k), -np.inf, dtype=np.float32)
    out_n = np.empty((B, k), dtype=np.int32)
    # head scores shifted above every tail score
    shift = float(np.abs(tail_w).max()) + 1.0 if tail_w.size else 1.0
    for i in range(B):
        keep = head_w[i] > 0
        h_n = head_n[i][keep]
        seen = set(h_n.tolist())
        t_mask = np.fromiter((n not in seen for n in tail_n[i]),
                             count=tail_k, dtype=bool)
        t_n = tail_n[i][t_mask][: k - len(h_n)]
        t_w = tail_w[i][t_mask][: k - len(h_n)]
        out_n[i, :len(h_n)] = h_n
        out_w[i, :len(h_n)] = head_w[i][keep] + shift
        out_n[i, len(h_n):len(h_n) + len(t_n)] = t_n
        out_w[i, len(h_n):len(h_n) + len(t_n)] = t_w
        fill = len(h_n) + len(t_n)
        if fill < k:                       # degenerate tiny catalogs
            out_n[i, fill:] = t_n[-1] if len(t_n) else h_n[-1]
    return out_w, out_n


class JaccardFast(PredictionModel):
    """Jaccard similarity over playlist membership (reference JaccardFast,
    baselines.py:194-220): intersections = C^T C via sparse SpGEMM,
    |union| = deg_a + deg_b - |intersection|, scores topk'd on device.

    Matches the reference output shape quirk: topk(k) then drop column 0
    (so k-1 columns are returned, assuming self ranks first)."""

    def train(self, graph, ids, train_set, test_set, features) -> None:
        from gcn_song_embeddings_tpu.data.graph import col_track_matrix

        ct = col_track_matrix(graph)                     # [C, N] 0/1
        inter = (ct.T @ ct).tocsr()                      # [N, N] SpGEMM
        self.intersections = inter
        self.nbh_sizes = np.asarray(inter.diagonal()).ravel()

    def knn(self, nodeset, k):
        nodeset = np.asarray(nodeset, dtype=np.int64)
        inter = np.asarray(
            self.intersections[nodeset, :].todense(), dtype=np.float32)
        deg_a = self.nbh_sizes[nodeset][:, None].astype(np.float32)
        deg_b = self.nbh_sizes[None, :].astype(np.float32)
        union = deg_a + deg_b - inter
        scores = jnp.asarray(inter) / (jnp.asarray(union) + 1e-10)
        w, n = jax.lax.top_k(scores, k)
        return np.asarray(w)[:, 1:], np.asarray(n)[:, 1:]
