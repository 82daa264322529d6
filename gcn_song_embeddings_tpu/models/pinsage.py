"""Functional PinSage model: importance-weighted conv stack + G1/G2 head.

Numerics mirror the reference exactly (pinsage_model.py:171-265):

  ConvLayer(h_self [B,Din], h_nb [B,T,Din], w [B,T]):
      q    = leaky_relu(h_nb @ Wq^T + bq)                  # per-neighbor MLP Q
      agg  = sum_t(w_t * q_t) / sum_t(w_t)                 # importance mean
      out  = leaky_relu(concat([h_self, agg]) @ Ww^T + bw) # post-agg MLP W
      out  = out / ||out||_2                               # row L2 norm
  head(x) = G2 @ leaky_relu(G1 @ x + b1)                   # G2 has no bias

Init matches the reference: Xavier-uniform weights, biases filled with 0.3
(pinsage_model.py:182-187, 239-244).

The L-layer "nodeflow" is where the design departs from the reference.  The
reference builds dynamic frontier sets with `torch.unique`
(pinsage_model.py:142-168) and scatters activations back into a full-graph
buffer per layer (`put_embeddings` clones the whole [N, D] h every forward —
SURVEY §3.1 calls this out as a hot spot).  Dynamic shapes defeat XLA, so we
instead expand frontiers WITHOUT dedup: frontier_l = concat([frontier_{l-1},
topT_neighbors(frontier_{l-1}).flatten()]) has static size B*(T+1)^l.
Duplicated nodes recompute identical activations, so per-node outputs are
bit-identical to the reference while every shape is static and the whole
forward is one fused XLA program (for B=128, T=3, L=2 the deepest frontier is
2048 rows — trivially cheaper than an O(N*D) clone per layer).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ConvParams(NamedTuple):
    Wq: jnp.ndarray  # [hidden, in_dim]
    bq: jnp.ndarray  # [hidden]
    Ww: jnp.ndarray  # [out, in_dim + hidden]
    bw: jnp.ndarray  # [out]


class PinSageParams(NamedTuple):
    layers: tuple[ConvParams, ...]
    G1_w: jnp.ndarray  # [out, out]
    G1_b: jnp.ndarray  # [out]
    G2_w: jnp.ndarray  # [out, out]


def _xavier_uniform(key: jax.Array, shape: tuple[int, int],
                    dtype=jnp.float32) -> jnp.ndarray:
    """torch.nn.init.xavier_uniform_ equivalent: U(-a, a),
    a = sqrt(6 / (fan_in + fan_out)) with (fan_out, fan_in) weight layout."""
    fan_out, fan_in = shape
    a = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def init_pinsage(key: jax.Array, n_layers: int, in_dim: int, hidden_dim: int,
                 out_dim: int, bias_init: float = 0.3,
                 dtype=jnp.float32) -> PinSageParams:
    """Initialize parameters (reference pinsage_model.py:174-187, 218-244).

    Layer l has input dim `in_dim` for l=0 and `out_dim` afterwards
    (pinsage_model.py:232), all layers output `out_dim`.
    """
    in_dims = [in_dim] + [out_dim] * (n_layers - 1)
    keys = jax.random.split(key, 2 * n_layers + 2)
    layers = []
    for l in range(n_layers):
        wq = _xavier_uniform(keys[2 * l], (hidden_dim, in_dims[l]), dtype)
        ww = _xavier_uniform(keys[2 * l + 1],
                             (out_dim, in_dims[l] + hidden_dim), dtype)
        layers.append(ConvParams(
            Wq=wq, bq=jnp.full((hidden_dim,), bias_init, dtype),
            Ww=ww, bw=jnp.full((out_dim,), bias_init, dtype)))
    g1 = _xavier_uniform(keys[-2], (out_dim, out_dim), dtype)
    g2 = _xavier_uniform(keys[-1], (out_dim, out_dim), dtype)
    return PinSageParams(layers=tuple(layers), G1_w=g1,
                         G1_b=jnp.full((out_dim,), bias_init, dtype), G2_w=g2)


def pack_nbhds(nbhd_weights: jnp.ndarray, nbhd_nodes: jnp.ndarray,
               T: int) -> jnp.ndarray:
    """Pack the top-T (weights, nodes) neighborhood columns into ONE
    [N, 2T] int32 table (f32 weights bitcast to int32).

    The B=128 train step is kernel-latency-bound on TPU (each forward level
    otherwise issues two separate row gathers); one packed gather per level
    measured 0.24 -> 0.21 ms/batch on v5e.  On the sharded path the win is
    bigger still: one collective gather with a 2T-int32 payload replaces two
    full-row-width collectives (parallel/train_step.py).
    """
    w = jax.lax.bitcast_convert_type(
        nbhd_weights[:, :T].astype(jnp.float32), jnp.int32)
    return jnp.concatenate([w, nbhd_nodes[:, :T].astype(jnp.int32)], axis=1)


def unpack_nbhd_rows(rows: jnp.ndarray, T: int
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of pack_nbhds for gathered rows [m, 2T] -> (w [m,T], n [m,T])."""
    return (jax.lax.bitcast_convert_type(rows[:, :T], jnp.float32),
            rows[:, T:])


def pack_nbhds_np(nbhd_weights, nbhd_nodes, T: int):
    """NumPy twin of pack_nbhds (same [N, 2T] bitcast layout, decoded by
    unpack_nbhd_rows) for callers that pack on the host before sharding
    the table across a mesh (parallel/train_step.py)."""
    import numpy as np

    w = np.ascontiguousarray(
        np.asarray(nbhd_weights)[:, :T], dtype=np.float32).view(np.int32)
    return np.concatenate(
        [w, np.asarray(nbhd_nodes)[:, :T].astype(np.int32)], axis=1)


def packed_nbhd_gather(packed: jnp.ndarray, T: int):
    """gather_nbhds(ids) closure over a pack_nbhds table (local HBM)."""
    def gather_nbhds(ids):
        return unpack_nbhd_rows(packed[ids], T)
    return gather_nbhds


def conv_apply(p: ConvParams, h_self: jnp.ndarray, h_nb: jnp.ndarray,
               nb_w: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """One PinSage convolution (reference ConvLayer.forward,
    pinsage_model.py:189-212).

    h_self: [B, Din]; h_nb: [B, T, Din]; nb_w: [B, T].
    """
    q = jax.nn.leaky_relu(
        jnp.einsum("btd,hd->bth", h_nb, p.Wq,
                   preferred_element_type=jnp.float32) + p.bq)
    w_sum = nb_w.sum(axis=1, keepdims=True)
    # Guard all-zero neighborhoods (isolated origin whose walks only ever
    # revisit itself); the reference divides by zero here.
    denom = jnp.where(w_sum == 0.0, 1.0, w_sum) + eps
    agg = (nb_w[:, :, None] * q).sum(axis=1) / denom
    # The reference computes W @ concat([h_self, agg]); splitting the
    # matmul over the concat boundary is the same math
    # ([a, b] @ M.T == a @ M[:, :da].T + b @ M[:, da:].T) but never
    # materializes the [B, Din+hidden] concat operand — measured 4.9%
    # faster for the full fwd+bwd sweep at the FLOP-bound shape
    # (results/fb_conv_split.json; the shape is compute-bound, so the
    # win is matmul scheduling, not bytes).
    d = h_self.shape[1]
    new_h = jax.nn.leaky_relu(
        jnp.dot(h_self, p.Ww[:, :d].T,
                preferred_element_type=jnp.float32)
        + jnp.dot(agg, p.Ww[:, d:].T,
                  preferred_element_type=jnp.float32) + p.bw)
    norm = jnp.linalg.norm(new_h, axis=1, keepdims=True)
    return new_h / jnp.where(norm == 0.0, 1.0, norm)


def head_apply(params: PinSageParams, x: jnp.ndarray) -> jnp.ndarray:
    """Final G2(leaky_relu(G1(x))) head, applied to the output nodeset only,
    NOT re-normalized (pinsage_model.py:259; the loss normalizes)."""
    hidden = jax.nn.leaky_relu(
        jnp.dot(x, params.G1_w.T, preferred_element_type=jnp.float32)
        + params.G1_b)
    return jnp.dot(hidden, params.G2_w.T, preferred_element_type=jnp.float32)


def forward_with_gather(params: PinSageParams, gather_features,
                        gather_nbhds, nodeset: jnp.ndarray, n_layers: int,
                        T: int) -> jnp.ndarray:
    """Forward pass parameterized over the table-gather primitive.

    `gather_features(ids) -> [m, in_dim]` and
    `gather_nbhds(ids) -> (weights [m, T], nodes [m, T])` abstract whether
    the node tables are local HBM arrays or row-sharded across a mesh with
    collective gathers (parallel/gather.py).  The compute is identical.
    """
    nodeset = nodeset.astype(jnp.int32)

    # Top-down frontier expansion (static shapes: B*(T+1)^l).
    frontiers = [nodeset]
    nb_per_level: list[tuple[jnp.ndarray, jnp.ndarray]] = []
    for _ in range(n_layers):
        f = frontiers[-1]
        nb_w, nb_n = gather_nbhds(f)
        nb_per_level.append((nb_w, nb_n))
        frontiers.append(jnp.concatenate([f, nb_n.reshape(-1)]))

    # Bottom-up conv stack.  Computing h over frontiers[l] consumes h over
    # frontiers[l+1] = concat([frontiers[l], neighbors(frontiers[l])]), so
    # the self block is h[:m] and the neighbor block is h[m:].
    h = gather_features(frontiers[n_layers])
    for l in reversed(range(n_layers)):
        m = frontiers[l].shape[0]
        nb_w, _ = nb_per_level[l]
        h_self = h[:m]
        h_nb = h[m:].reshape(m, T, h.shape[1])
        # conv layer index: deepest frontier uses conv_layers[0]
        # (reference pinsage_model.py:255: S[0] is the largest frontier).
        h = conv_apply(params.layers[n_layers - 1 - l], h_self, h_nb, nb_w)

    return head_apply(params, h)


def fullgraph_embeddings(params: PinSageParams, features: jnp.ndarray,
                         nbhd_weights: jnp.ndarray, nbhd_nodes: jnp.ndarray,
                         n_layers: int, T: int,
                         block_rows: int = 131_072) -> jnp.ndarray:
    """Pre-head activations for ALL items via dense per-layer sweeps.

    The precomputed top-T neighborhoods are batch-independent (reference
    relevant_nodes_per_layer_precomp slices the same cache at every
    level, pinsage_model.py:156-168), so layer l's activation for node v
    is the same whether v is reached through a frontier or computed in a
    full-catalog sweep.  Cost per layer is ONE [N, T]-row gather +
    batched matmuls — N*(T+1) feature-row touches per layer versus the
    frontier expansion's 3B*(T+1)^L blowup, so this wins whenever the
    nodeset's expanded frontier exceeds the catalog (B=4096 at T=3, L=2:
    196k gathered rows vs N=20k).  Layer order matches
    forward_with_gather: layers[0] consumes raw features.
    """
    nb_w = nbhd_weights[:, :T]
    nb_n = nbhd_nodes[:, :T].astype(jnp.int32)
    n = features.shape[0]
    h = features
    # Mixed precision: conv_apply accumulates in f32
    # (preferred_element_type), but the RUNNING h is stored back at the
    # feature dtype — under train.dtype=bfloat16 every layer's [N, T]-row
    # gather moves half the bytes (the gather engine is byte-bound:
    # bench.py gather_bf16_row_ratio ~2) and the saved residuals halve
    # too.  A no-op for f32 features.
    store_dtype = features.dtype
    for l in range(n_layers):
        p = params.layers[l]
        if n <= block_rows:
            h_nb = h[nb_n.reshape(-1)].reshape(n, T, h.shape[1])
            h = conv_apply(p, h, h_nb, nb_w).astype(store_dtype)
        else:
            # million-scale sweep: one [N, T, D] intermediate would be
            # several GB, so run the layer as a lax.map over row blocks
            # (gathers still hit the full resident h; same math)
            nblk = -(-n // block_rows)
            offs = jnp.arange(block_rows, dtype=jnp.int32)

            def blk(i, h=h, p=p):
                ids = jnp.minimum(i * block_rows + offs, n - 1)
                h_nb = h[nb_n[ids].reshape(-1)].reshape(
                    block_rows, T, h.shape[1])
                return conv_apply(p, h[ids], h_nb,
                                  nb_w[ids]).astype(store_dtype)

            h = jax.lax.map(blk, jnp.arange(nblk, dtype=jnp.int32)
                            ).reshape(nblk * block_rows, -1)[:n]
    return h


@partial(jax.jit, static_argnames=("n_layers", "T"))
def pinsage_forward_fullgraph(params: PinSageParams, features: jnp.ndarray,
                              nbhd_weights: jnp.ndarray,
                              nbhd_nodes: jnp.ndarray, nodeset: jnp.ndarray,
                              n_layers: int, T: int) -> jnp.ndarray:
    """pinsage_forward computed via a full-catalog sweep (same math;
    faster once `nodeset` is a sizable fraction of the catalog)."""
    h = fullgraph_embeddings(params, features, nbhd_weights, nbhd_nodes,
                             n_layers, T)
    return head_apply(params, h[nodeset.astype(jnp.int32)])


def fullgraph_wins(batch_rows: int, n_items: int, n_layers: int,
                   T: int) -> bool:
    """Feature-row cost model behind `train.fullgraph_forward='auto'`.

    The frontier forward gathers feature rows ONCE, for the deepest
    frontier: batch_rows*(T+1)^L (the per-level neighborhood lookups are
    cheap 2T-int32 packed gathers, not feature rows).  The full-graph
    sweep touches N*(T+1) rows per layer (T gathered + 1 resident self
    read).  Heuristic row counts — the decision matches the measured
    winner at every A/B'd batch size (RESULTS.md "full-graph forward
    strategy": B=128/1024 frontier, B=4096 full-graph)."""
    frontier_rows = batch_rows * (T + 1) ** n_layers
    return frontier_rows > n_items * (T + 1) * n_layers


@partial(jax.jit, static_argnames=("n_layers", "T"))
def pinsage_forward(params: PinSageParams, features: jnp.ndarray,
                    nbhd_weights: jnp.ndarray, nbhd_nodes: jnp.ndarray,
                    nodeset: jnp.ndarray, n_layers: int, T: int
                    ) -> jnp.ndarray:
    """Embed `nodeset` rows: [B] -> [B, out_dim] (single-device tables).

    Args:
      features: [N, in_dim] z-normalized node features.
      nbhd_weights / nbhd_nodes: [N, >=T] precomputed PPR neighborhoods
        (from ops.ppr.precompute_neighborhoods); the top-T slice is used,
        like `relevant_nodes_per_layer_precomp` (pinsage_model.py:156-168).
      nodeset: [B] int32 item ids.
    """
    packed = pack_nbhds(nbhd_weights, nbhd_nodes, T)
    return forward_with_gather(params, lambda ids: features[ids],
                               packed_nbhd_gather(packed, T),
                               nodeset, n_layers, T)


@partial(jax.jit, static_argnames=("n_layers", "T", "batch_size",
                                   "n_blocks"))
def _embed_blocks(params: PinSageParams, features: jnp.ndarray,
                  nbhd_weights: jnp.ndarray, nbhd_nodes: jnp.ndarray,
                  start: jnp.ndarray, n_items: int, n_layers: int, T: int,
                  batch_size: int, n_blocks: int) -> jnp.ndarray:
    """Embed `n_blocks` consecutive [batch_size] blocks in one dispatch
    (lax.scan) — amortizes per-dispatch latency over large catalogs."""
    offsets = jnp.arange(batch_size, dtype=jnp.int32)
    packed = pack_nbhds(nbhd_weights, nbhd_nodes, T)  # once, outside the scan
    gather_nbhds = packed_nbhd_gather(packed, T)

    def block(_, i):
        ids = (start + i * batch_size + offsets) % n_items
        return None, forward_with_gather(
            params, lambda f: features[f], gather_nbhds, ids, n_layers, T)

    _, outs = jax.lax.scan(block, None,
                           jnp.arange(n_blocks, dtype=jnp.int32))
    return outs.reshape(n_blocks * batch_size, -1)


@partial(jax.jit, static_argnames=("n_layers", "T"))
def _embed_all_fullgraph(params: PinSageParams, features: jnp.ndarray,
                         nbhd_weights: jnp.ndarray, nbhd_nodes: jnp.ndarray,
                         n_layers: int, T: int) -> jnp.ndarray:
    h = fullgraph_embeddings(params, features, nbhd_weights, nbhd_nodes,
                             n_layers, T)
    return head_apply(params, h)


def embed_all(params: PinSageParams, features: jnp.ndarray,
              nbhd_weights: jnp.ndarray, nbhd_nodes: jnp.ndarray,
              n_items: int, n_layers: int, T: int,
              batch_size: int = 1024, blocks_per_call: int = 32,
              strategy: str = "fullgraph") -> jnp.ndarray:
    """Embed every item (reference PinSage.embed + save_embeddings,
    pinsage_training.py:258-327) -> [n_items, out_dim].

    strategy="fullgraph" (default) computes the conv stack once over the
    whole catalog — N*(T+1) row touches per layer instead of the blocked
    frontier expansion's N*(T+1)^L, strictly cheaper for an all-items
    sweep and one dispatch instead of N/(batch*blocks).
    strategy="blocks" keeps the scanned frontier path (the per-nodeset
    building block, also the fallback if [N, out_dim] intermediates ever
    exceed HBM): each dispatch scans `blocks_per_call` blocks of
    `batch_size` nodes — at million-track scale per-dispatch latency
    otherwise dominates."""
    if strategy == "fullgraph":
        # slice [:n_items]: callers may pass row-padded tables
        # (parallel/train_step.py pads rows to the graph-axis multiple)
        return _embed_all_fullgraph(params, features, nbhd_weights,
                                    nbhd_nodes, n_layers, T)[:n_items]
    import numpy as np

    from gcn_song_embeddings_tpu.utils.pipeline import lagged

    blocks_per_call = max(min(blocks_per_call,
                              -(-n_items // batch_size)), 1)
    outs = []
    stride = batch_size * blocks_per_call

    def dispatch(start):
        return start, _embed_blocks(params, features, nbhd_weights,
                                    nbhd_nodes, jnp.int32(start), n_items,
                                    n_layers, T, batch_size, blocks_per_call)

    # One-deep pipeline (utils/pipeline.py): materialize dispatch i-1's
    # [stride, out_dim] block on the host while dispatch i computes.
    for start, out in lagged(dispatch(s) for s in range(0, n_items, stride)):
        outs.append(np.asarray(out)[: min(stride, n_items - start)])
    return jnp.asarray(np.concatenate(outs, axis=0))
