"""node2vec second-order biased random walks on device.

The reference delegates to fastnode2vec (numba walks + gensim word2vec C,
baselines.py:223-255).  TPU-native re-design:

  * Weighted first-order neighbor sampling uses per-node ALIAS TABLES
    (Walker's method), built once on the host in O(E): sampling a weighted
    neighbor on device is then two gathers + one comparison — no per-row
    cumsums.
  * The p/q second-order bias is applied by REJECTION: propose from the
    alias table, accept with bias(candidate)/max_bias where bias is 1/p for
    returning to the previous node, 1 for a candidate adjacent to it, 1/q
    otherwise (Grover & Leskovec 2016).  A fixed number of rejection rounds
    keeps shapes static; the final round falls through unconditionally
    (bias error after R rounds is O(((max-min)/max)^R), negligible for the
    reference's p=2, q=0.5).
  * Adjacency tests are vectorized binary searches over the sorted CSR
    rows (32 fori_loop steps cover any degree).

Walks for a whole batch of starts advance in lockstep inside one
`lax.scan`, like ops/walks.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class AliasGraph(NamedTuple):
    """CSR + per-slot alias tables for O(1) weighted neighbor sampling."""

    indptr: jnp.ndarray   # [n + 1] int32
    indices: jnp.ndarray  # [nnz] int32
    prob: jnp.ndarray     # [nnz] float32 — alias acceptance probability
    alias: jnp.ndarray    # [nnz] int32 — in-row alias slot

    @property
    def n(self) -> int:
        return self.indptr.shape[0] - 1


def build_alias_graph(indptr: np.ndarray, indices: np.ndarray,
                      weights: np.ndarray | None = None) -> AliasGraph:
    """Build Walker alias tables per CSR row (host, O(E))."""
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int32)
    nnz = indices.shape[0]
    if weights is None:
        weights = np.ones(nnz, dtype=np.float64)
    prob = np.ones(nnz, dtype=np.float32)
    alias = np.zeros(nnz, dtype=np.int32)
    n = indptr.shape[0] - 1
    for v in range(n):
        s, e = indptr[v], indptr[v + 1]
        deg = e - s
        if deg == 0:
            continue
        w = weights[s:e].astype(np.float64)
        p = w / w.sum() * deg
        small = [i for i in range(deg) if p[i] < 1.0]
        large = [i for i in range(deg) if p[i] >= 1.0]
        pr = p.copy()
        al = np.arange(deg, dtype=np.int32)
        while small and large:
            sm = small.pop()
            lg = large.pop()
            pr_sm = pr[sm]
            al[sm] = lg
            pr[lg] = pr[lg] - (1.0 - pr_sm)
            if pr[lg] < 1.0:
                small.append(lg)
            else:
                large.append(lg)
        prob[s:e] = np.minimum(pr, 1.0).astype(np.float32)
        alias[s:e] = al
    return AliasGraph(indptr=jnp.asarray(indptr, dtype=jnp.int32),
                      indices=jnp.asarray(indices),
                      prob=jnp.asarray(prob),
                      alias=jnp.asarray(alias))


def _alias_sample(g: AliasGraph, nodes: jnp.ndarray, key: jax.Array
                  ) -> jnp.ndarray:
    """Weighted neighbor per node (degree-0 nodes return themselves)."""
    k1, k2 = jax.random.split(key)
    start = g.indptr[nodes]
    deg = g.indptr[nodes + 1] - start
    safe_deg = jnp.maximum(deg, 1)
    slot = jax.random.randint(k1, nodes.shape, 0, 1 << 30) % safe_deg
    u = jax.random.uniform(k2, nodes.shape)
    take_alias = u >= g.prob[start + slot]
    final_slot = jnp.where(take_alias, g.alias[start + slot], slot)
    nb = g.indices[start + final_slot]
    return jnp.where(deg > 0, nb, nodes)


def _is_edge(g: AliasGraph, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Vectorized membership test v in sorted neighbors(u)."""
    lo = g.indptr[u]
    hi = g.indptr[u + 1]
    nnz = g.indices.shape[0]

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        val = g.indices[jnp.clip(mid, 0, nnz - 1)]
        go_right = (val < v) & (lo < hi)
        return (jnp.where(go_right, mid + 1, lo),
                jnp.where(go_right, hi, mid))

    lo, hi = lax.fori_loop(0, 32, body, (lo, hi))
    in_row = lo < g.indptr[u + 1]
    return in_row & (g.indices[jnp.clip(lo, 0, nnz - 1)] == v)


@partial(jax.jit,
         static_argnames=("walk_length", "p", "q", "rejection_rounds"))
def node2vec_walks(g: AliasGraph, starts: jnp.ndarray, walk_length: int,
                   p: float, q: float, key: jax.Array,
                   rejection_rounds: int = 3) -> jnp.ndarray:
    """[B] starts -> [B, walk_length] node sequences (first column =
    starts), p/q-biased like node2vec."""
    starts = starts.astype(jnp.int32)
    inv_p, inv_q = 1.0 / p, 1.0 / q
    max_bias = max(inv_p, 1.0, inv_q)

    k0, key = jax.random.split(key)
    second = _alias_sample(g, starts, k0)

    def step(carry, step_key):
        prev, cur = carry

        def propose(rk):
            k1, k2 = jax.random.split(rk)
            cand = _alias_sample(g, cur, k1)
            bias = jnp.where(
                cand == prev, inv_p,
                jnp.where(_is_edge(g, prev, cand), 1.0, inv_q))
            accept = jax.random.uniform(k2, cand.shape) < bias / max_bias
            return cand, accept

        keys = jax.random.split(step_key, rejection_rounds)
        nxt, done = propose(keys[0])
        for r in range(1, rejection_rounds):
            cand, accept = propose(keys[r])
            nxt = jnp.where(done, nxt, cand)
            done = done | accept
        # final fallback: keep last proposal regardless (bounded bias error)
        return (cur, nxt), nxt

    step_keys = jax.random.split(key, walk_length - 2)
    _, rest = lax.scan(step, (starts, second), step_keys)
    walks = jnp.concatenate(
        [starts[:, None], second[:, None], rest.T], axis=1)
    return walks
