"""Node2Vec baseline: device walks + scanned skip-gram training.

Reference `FastNode2Vec` (baselines.py:223-255): bipartite-project to a
weighted track-track graph, run fastnode2vec (dim=128, walk_length=20,
context=10, p=2.0, q=0.5, 10 epochs), stack word vectors into the
embedding matrix.  The TPU re-design keeps those hyperparameters but runs
the biased walks with the alias/rejection kernel (ops/node2vec.py) and
trains skip-gram-with-negative-sampling as one `lax.scan` of SGD steps on
device (replacing gensim's C word2vec).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gcn_song_embeddings_tpu.models.baselines.base import EmbeddingModel
from gcn_song_embeddings_tpu.ops.knn import knn_from_emb
from gcn_song_embeddings_tpu.ops.node2vec import (
    build_alias_graph,
    node2vec_walks,
)


def train_skipgram(walks: jnp.ndarray, n_nodes: int, dim: int = 128,
                   context: int = 10, negatives: int = 5,
                   epochs: int = 10, batch: int = 8192,
                   lr0: float = 0.025, lr_min: float = 1e-4,
                   seed: int = 0) -> np.ndarray:
    """Skip-gram with negative sampling over walk windows.

    Pairs are sampled uniformly (walk row, center position, offset within
    ±context); negatives are uniform over nodes (gensim uses a unigram^0.75
    table; uniform is adequate for ranking parity on these graphs).  The
    learning rate decays linearly lr0 -> lr_min like word2vec/gensim.
    """
    n_walks, walk_len = walks.shape
    key = jax.random.PRNGKey(seed)
    k_in, k_out, key = jax.random.split(key, 3)
    W_in = (jax.random.uniform(k_in, (n_nodes, dim)) - 0.5) / dim
    W_out = jnp.zeros((n_nodes, dim), dtype=jnp.float32)

    # one (center, context) pair per window slot per epoch, like word2vec's
    # full window sweep
    total_pairs = n_walks * walk_len * context * epochs
    n_steps = max(total_pairs // batch, 1)

    def step(carry, args):
        W_in, W_out = carry
        step_key, frac = args
        kw, kp, ko, kn = jax.random.split(step_key, 4)
        lr = lr0 * (1 - frac) + lr_min * frac

        rows = jax.random.randint(kw, (batch,), 0, n_walks)
        pos = jax.random.randint(kp, (batch,), 0, walk_len)
        off = jax.random.randint(ko, (batch,), 1, context + 1)
        sign = jnp.where(jax.random.uniform(kn, (batch,)) < 0.5, -1, 1)
        ctx_pos = jnp.clip(pos + off * sign, 0, walk_len - 1)
        center = walks[rows, pos]
        ctx = walks[rows, ctx_pos]
        negs = jax.random.randint(
            jax.random.fold_in(kn, 1), (batch, negatives), 0, n_nodes)

        v = W_in[center]                              # [B, d]
        u_pos = W_out[ctx]                            # [B, d]
        u_neg = W_out[negs]                           # [B, neg, d]

        s_pos = jnp.sum(v * u_pos, axis=1)
        s_neg = jnp.einsum("bd,bnd->bn", v, u_neg)
        g_pos = jax.nn.sigmoid(s_pos) - 1.0           # dL/ds_pos
        g_neg = jax.nn.sigmoid(s_neg)                 # dL/ds_neg

        grad_v = g_pos[:, None] * u_pos + jnp.einsum(
            "bn,bnd->bd", g_neg, u_neg)
        W_in = W_in.at[center].add(-lr * grad_v)
        W_out = W_out.at[ctx].add(-lr * g_pos[:, None] * v)
        W_out = W_out.at[negs].add(
            -lr * g_neg[:, :, None] * v[:, None, :])
        return (W_in, W_out), None

    keys = jax.random.split(key, n_steps)
    fracs = jnp.linspace(0.0, 1.0, n_steps)

    @jax.jit
    def run(W_in, W_out):
        (W_in, W_out), _ = lax.scan(step, (W_in, W_out), (keys, fracs))
        return W_in, W_out

    W_in, W_out = run(W_in, W_out)
    return np.asarray(W_in)


class FastNode2Vec(EmbeddingModel):
    """node2vec on the weighted track-track projection
    (reference hyperparameters, baselines.py:242-243)."""

    def __init__(self, projected: bool = True, dim: int = 128,
                 walk_length: int = 20, context: int = 10, p: float = 2.0,
                 q: float = 0.5, epochs: int = 10, walks_per_node: int = 10,
                 seed: int = 0):
        self.projected = projected
        self.dim = dim
        self.walk_length = walk_length
        self.context = context
        self.p = p
        self.q = q
        self.epochs = epochs
        self.walks_per_node = walks_per_node
        self.seed = seed
        self.embedding: np.ndarray | None = None

    def train(self, graph, ids, train_set, test_set, features) -> None:
        from gcn_song_embeddings_tpu.ops.graph_ops import project_bipartite

        n = len(ids)
        proj = project_bipartite(graph)
        alias = build_alias_graph(proj.indptr, proj.indices,
                                  proj.data.astype(np.float64))
        starts = np.tile(np.arange(n, dtype=np.int32),
                         self.walks_per_node)
        key = jax.random.PRNGKey(self.seed)
        walks = node2vec_walks(alias, jnp.asarray(starts),
                               self.walk_length, self.p, self.q, key)
        self.embedding = train_skipgram(
            walks, n, dim=self.dim, context=self.context,
            epochs=self.epochs, seed=self.seed)

    def embed(self, nodeset):
        return self.embedding[np.asarray(nodeset)]

    def knn(self, nodeset, k):
        return knn_from_emb(self.embedding, np.asarray(nodeset), k)
