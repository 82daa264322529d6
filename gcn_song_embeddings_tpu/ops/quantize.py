"""Embedding quantization for serving: int8 rows with per-row scales.

Serving-scale catalogs (10^7-10^8 tracks x 128 dims) are dominated by the
embedding table's HBM footprint and the query matvec's bandwidth.  Row-wise
symmetric int8 quantization cuts both 4x; retrieval scores
q . (v_int8 * scale_v) preserve cosine ORDER per candidate row exactly
(positive per-row scaling), so top-k quality degrades only by rounding.

Two quantizers, numerically identical in expectation:
  * `quantize_rows` — XLA path (round-to-nearest).
  * `quantize_rows_pallas` — Pallas TPU kernel with on-chip PRNG and
    STOCHASTIC rounding (pltpu.prng_random_bits + pltpu.stochastic_round),
    the unbiased choice for downstream aggregation.  One grid step per row
    tile; scale computation, rounding, and packing fused in VMEM.

`int8_topk` runs retrieval on the quantized table: int8 gathers halve the
bytes, the MXU contracts int8 natively, and scales are applied to the
[B, N] score block before top-k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 256


@jax.jit
def quantize_rows(emb: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[N, d] f32 -> (values int8 [N, d], scales f32 [N]), round-nearest."""
    absmax = jnp.max(jnp.abs(emb), axis=1)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(emb / scale[:, None]), -127, 127)
    return q.astype(jnp.int8), scale


def _quant_kernel(x_ref, seed_ref, val_ref, scale_ref):
    """One ROW_TILE x d tile: per-row absmax scale + stochastic round.

    pltpu.stochastic_round only targets bf16/fp8, so int8 stochastic
    rounding is built from raw PRNG bits: floor(x) + (u < frac(x)) with
    u uniform in [0, 1) from the top 24 random bits.
    """
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)
    x = x_ref[:]
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.where(absmax == 0.0, 1.0, absmax / 127.0)
    scaled = x / scale
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    # Mosaic can't cast uint32->f32 directly; the >>8 result fits int32
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) \
        * (1.0 / (1 << 24))
    low = jnp.floor(scaled)
    q = low + (u < (scaled - low)).astype(jnp.float32)
    val_ref[:] = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
    scale_ref[:] = scale


@partial(jax.jit, static_argnames=("interpret",))
def quantize_rows_pallas(emb: jnp.ndarray, seed: int = 0,
                         interpret: bool = False
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas stochastic-rounding row quantizer (see module docstring)."""
    n, d = emb.shape
    n_pad = ((n + ROW_TILE - 1) // ROW_TILE) * ROW_TILE
    x = jnp.zeros((n_pad, d), jnp.float32).at[:n].set(
        emb.astype(jnp.float32))
    seed_arr = jnp.asarray([seed], dtype=jnp.int32)

    vals, scales = pl.pallas_call(
        _quant_kernel,
        grid=(n_pad // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, d), jnp.int8),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(x, seed_arr)
    return vals[:n], scales[:n, 0]


def int8_scores(values: jnp.ndarray, scales: jnp.ndarray,
                query: jnp.ndarray) -> jnp.ndarray:
    """[B, N] similarity scores under the serving index's int8 math.

    values: [N, d] int8; scales: [N] f32; query: [B, d] f32 (pre-normalized
    rows for cosine semantics).  The contraction runs int8 x int8 on the
    MXU with int32 accumulation; query quantization error is shared by all
    candidates so ranking is unaffected by the query's own scale.  This is
    THE int8 scoring function — int8_topk and the quality evaluator
    (scripts/serve_int8_quality.py) both call it, so published quality
    numbers always certify the exact math the serving path executes.
    """
    q_absmax = jnp.max(jnp.abs(query), axis=1, keepdims=True)
    q_scale = jnp.where(q_absmax == 0, 1.0, q_absmax / 127.0)
    q_int = jnp.clip(jnp.round(query / q_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q_int, values,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)               # [B, N]
    return acc.astype(jnp.float32) * scales[None, :] * q_scale


@partial(jax.jit, static_argnames=("k",))
def int8_topk(values: jnp.ndarray, scales: jnp.ndarray,
              query: jnp.ndarray, k: int
              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k of q . dequant(row) over an int8 table (see int8_scores)."""
    return jax.lax.top_k(int8_scores(values, scales, query), k)
