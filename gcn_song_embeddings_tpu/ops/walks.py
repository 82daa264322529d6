"""On-device random-walk simulation over the HBM-resident bipartite CSR.

Reference behavior (pinsage_model.py:32-53): for each node in a nodeset, run
`n_hops` two-step walks (item -> uniform random collection -> uniform random
item), record the reached item after every hop, and restart to the origin
with probability `alpha` AFTER each hop (note: alpha is the *restart*
probability — the reference's inverted-PPR convention, pinsage_model.py:50-51).

The reference executes this as a doubly-nested interpreted Python loop over
DGL `g.successors` calls — its #1 hot spot (SURVEY §3.1).  Here the entire
batch of walkers advances in lockstep inside a single `lax.scan` over hops:
each hop is two vectorized CSR gathers + threefry PRNG, so the TPU runs
O(B) walkers per step at HBM-gather throughput with zero host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from gcn_song_embeddings_tpu.data.device import DeviceGraph


def _uniform_neighbor(indptr: jnp.ndarray, indices: jnp.ndarray,
                      nodes: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Pick a uniform random neighbor for each node in `nodes`.

    `u` is uniform [0, 1) per node.  Degree-0 nodes are clamped to their own
    first slot (the reference would crash on them; datasets guarantee
    degree >= 1 — see data/synth.py).
    """
    start = indptr[nodes]
    deg = indptr[nodes + 1] - start
    offset = jnp.minimum((u * deg.astype(u.dtype)).astype(jnp.int32),
                         jnp.maximum(deg - 1, 0))
    return indices[start + offset]


@partial(jax.jit, static_argnames=("n_hops",))
def random_walks(graph: DeviceGraph, nodeset: jnp.ndarray, n_hops: int,
                 alpha: float, key: jax.Array) -> jnp.ndarray:
    """Simulate restart walks; returns trace [B, n_hops] of visited item ids.

    Matches reference `do_random_walks` (pinsage_model.py:32-53) in
    distribution: trace[i, j] is the item reached on hop j of walker i.

    All randomness is generated in ONE vectorized threefry call up front
    ([n_hops, B, 3]); the scan then only does gathers + compares per hop,
    which keeps the inner loop at HBM-gather speed instead of paying a
    PRNG invocation per step.
    """
    nodeset = nodeset.astype(jnp.int32)
    b = nodeset.shape[0]
    uniforms = jax.random.uniform(key, (n_hops, b, 3))

    def hop(cur: jnp.ndarray, u: jnp.ndarray):
        col = _uniform_neighbor(graph.i2c_indptr, graph.i2c_indices, cur,
                                u[:, 0])
        item = _uniform_neighbor(graph.c2i_indptr, graph.c2i_indices, col,
                                 u[:, 1])
        nxt = jnp.where(u[:, 2] < alpha, nodeset, item)
        return nxt, item

    _, trace = lax.scan(hop, nodeset, uniforms)
    return trace.T  # [B, n_hops]
