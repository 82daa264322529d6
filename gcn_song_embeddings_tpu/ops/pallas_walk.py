"""Pallas TPU kernel: fused two-step restart-walk hop (VERDICT r1 item 5).

The production walker (`ops/walks.py walks_from_fused_tables`) advances all
B walkers one two-step hop per `lax.scan` step: two dependent [B]-row XLA
gathers over the extent-joined edge tables plus slot/restart arithmetic
(reference hot loop: /root/reference/pinsage_model.py:32-53).  RESULTS.md
establishes that loop is HBM-gather-LATENCY-bound.  This kernel is the
hand-scheduled alternative the round-1 verdict asked to measure: the whole
walk — both gathers, slot arithmetic, restart select, trace write — fused
into ONE Pallas kernel with an explicit multi-walker in-flight DMA pipeline,
so hop h+1's row fetches for walker w overlap hop h's for walkers w+1..w+K.

Layout: Mosaic requires HBM DMA windows to be aligned to the (8, 128)
int32 tile — 1024 elements / 4 KB — so the 2-3 int32 edge records are
repacked into 8-int32 slots (so a record never straddles a tile) and each
gather DMAs the ONE aligned 4 KB window containing its record into SMEM,
reading the scalars at offset (idx * 8) % 1024.  That 4 KB-per-8 B-record
amplification is itself part of the measured answer: the DMA path cannot
issue the sub-transaction random row reads the hardware gather engine is
built around.

Schedule (grid = one step per hop, sequential on the scalar core):

    tick t of B+2K:   finalize(t-2K)  <- wait gather2, restart select,
                                         state + trace update
                      stage2(t-K)     <- wait gather1, issue gather2
                      issue1(t)       <- slot arith, issue gather1
    K in-flight single-line DMAs per stage; per-walker state (row start,
    degree) lives in SMEM; the hop's [B, 3] uniform block is pipeline-
    streamed into SMEM; the finished [B] trace row is DMA'd SMEM -> HBM.

The chain is BIT-IDENTICAL to `walks_from_fused_tables` under the same key:
both consume `jax.random.uniform(key, (hops, B, 3))` in the same order with
byte-for-byte the `uniform_slot` arithmetic (tests/test_pallas_walk.py).

Measured on-chip (round 3, results/pallas_walk_ab.out): B=2048, H=500 —
this kernel 5.7M hops/s, BIT-IDENTICAL trace to the XLA walker's 87.8M
hops/s.  The scalar-core DMA issue loop loses 15x to the hardware gather
engine, so the XLA walker stays the default; this kernel is the measured
A/B arm (K_INFLIGHT = 4 in-flight single-window DMAs per stage).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_INFLIGHT = 4   # DMA pipeline depth per gather stage
REC = 8          # int32 slots per edge record
WIN = 1024       # DMA window: the (8, 128) int32 HBM tile, 4 KB


def _pack_records(tbl: jnp.ndarray) -> jnp.ndarray:
    """[n, w<=REC] int32 -> flat [ceil(n*8/1024)*1024]; record i lives at
    flat offset i * 8, fetched via the aligned 4 KB window containing it
    (Mosaic: 1-D int32 HBM DMA slices must be 1024-element tile-aligned;
    a record never straddles a window since 1024 % 8 == 0)."""
    n, w = tbl.shape
    n_pad = ((n + 127) // 128) * 128          # flat multiple of 1024
    rec = jnp.zeros((n_pad, REC), jnp.int32).at[:n, :w].set(
        tbl.astype(jnp.int32))
    return rec.reshape(-1)


def _slot(u, deg):
    """Bit-identical to ops.walks.uniform_slot on scalars."""
    return jnp.minimum((u * deg.astype(jnp.float32)).astype(jnp.int32),
                       jnp.maximum(deg - 1, 0))


def _walk_kernel(org_ref, u_ref, i2c_ref, c2i_ref, out_ref,
                 state, idx1s, idx2s, buf1, buf2, trace,
                 sem1, sem2, sem_out, *, alpha: float, n_walkers: int):
    """One grid step = one two-step hop for all n_walkers walkers.

    org_ref  SMEM scalar-prefetch [2B] int32: (i2c start, deg) per origin
    u_ref    SMEM block [1, 1, 3B] f32: this hop's uniforms, u[w,j] at
             3w+j.  Flat in the lane dim: an SMEM block pads its LAST dim
             to 128 lanes, so a [1, B, 3] block costs 42x its bytes and
             blows the 1 MiB SMEM budget; and the pipeline requires the
             last two block dims to divide (8, 128) or equal the array
             dims, so the array is shaped [H, 1, 3B] with block
             [1, 1, 3B] (results/pallas_walk_ab.log r3 attempts 1-2)
    i2c_ref  HBM flat packed lines: per item->col edge, col's c2i extents
    c2i_ref  HBM flat packed lines: (item, i2c start, i2c deg) per edge
    out_ref  HBM flat [H*B] int32 trace (manual DMA of one B-row per hop)
    state    SMEM flat [2B]: walker w's (row start, degree) at 2w, 2w+1
    idx1s/2s SMEM [K]: issued record indices (rebuild DMA + lane offset)
    buf1/2   SMEM flat [K*1024] landing windows (slot s at [s*WIN, WIN));
             sem1/2 DMA[K]; trace SMEM [B]
    """
    h = pl.program_id(0)
    k = K_INFLIGHT
    b = n_walkers
    alpha_f = jnp.float32(alpha)

    @pl.when(h == 0)
    def _():
        def init(w, c):
            state[2 * w] = org_ref[2 * w]
            state[2 * w + 1] = org_ref[2 * w + 1]
            return c
        jax.lax.fori_loop(0, b, init, 0, unroll=False)

    # Landing buffers are FLAT [K*WIN] SMEM: Mosaic tiles a 2-D [K, WIN]
    # SMEM memref as (4, 128) and rejects single-row slices ("Slice shape
    # along dimension 0 must be aligned to tiling (4)", results/
    # pallas_walk_ab.log r2); a 1-D WIN-aligned window slice is tile-legal,
    # exactly like the HBM side.
    def slot_win(buf, w):
        return buf.at[pl.ds(pl.multiple_of((w % k) * WIN, WIN), WIN)]

    def dma1(w, idx):
        win = pl.multiple_of((idx * REC) // WIN * WIN, WIN)
        return pltpu.make_async_copy(i2c_ref.at[pl.ds(win, WIN)],
                                     slot_win(buf1, w), sem1.at[w % k])

    def dma2(w, idx):
        win = pl.multiple_of((idx * REC) // WIN * WIN, WIN)
        return pltpu.make_async_copy(c2i_ref.at[pl.ds(win, WIN)],
                                     slot_win(buf2, w), sem2.at[w % k])

    def tick(t, c):
        # finalize walker t-2K: gather2 landed -> trace + restart select
        @pl.when(t >= 2 * k)
        def _():
            w = t - 2 * k
            idx = idx2s[w % k]
            dma2(w, idx).wait()
            off = (w % k) * WIN + (idx * REC) % WIN
            item = buf2[off]
            restart = u_ref[0, 0, 3 * w + 2] < alpha_f
            trace[w] = item
            state[2 * w] = jnp.where(restart, org_ref[2 * w],
                                     buf2[off + 1])
            state[2 * w + 1] = jnp.where(restart, org_ref[2 * w + 1],
                                         buf2[off + 2])

        # stage2 for walker t-K: gather1 landed -> issue gather2
        @pl.when((t >= k) & (t < b + k))
        def _():
            w = t - k
            idx = idx1s[w % k]
            dma1(w, idx).wait()
            off = (w % k) * WIN + (idx * REC) % WIN
            s2 = buf1[off]
            d2 = buf1[off + 1]
            idx2 = s2 + _slot(u_ref[0, 0, 3 * w + 1], d2)
            idx2s[w % k] = idx2
            dma2(w, idx2).start()

        # issue gather1 for walker t
        @pl.when(t < b)
        def _():
            idx = state[2 * t] + _slot(u_ref[0, 0, 3 * t],
                                       state[2 * t + 1])
            idx1s[t % k] = idx
            dma1(t, idx).start()
        return c

    jax.lax.fori_loop(0, b + 2 * k, tick, 0, unroll=False)

    row = pl.multiple_of(h * b, WIN)  # b is a multiple of 1024
    out = pltpu.make_async_copy(trace, out_ref.at[pl.ds(row, b)], sem_out)
    out.start()
    out.wait()


@partial(jax.jit, static_argnames=("n_hops", "alpha", "interpret"))
def pallas_walks_from_fused_tables(tables, nodeset: jnp.ndarray,
                                   n_hops: int, alpha: float,
                                   key: jax.Array,
                                   interpret: bool = False) -> jnp.ndarray:
    """Drop-in for walks_from_fused_tables (same tables, same trace [B, H]).

    B is padded to a multiple of 1024 internally (the per-hop trace row
    is DMA'd as tile-aligned 1-D windows).
    """
    origin_ext, i2c_ext, c2i_ext = tables
    nodeset = nodeset.astype(jnp.int32)
    b0 = nodeset.shape[0]
    b = ((b0 + WIN - 1) // WIN) * WIN     # trace-row DMA is tile-aligned
    nodeset = jnp.zeros((b,), jnp.int32).at[:b0].set(nodeset)
    # uniforms drawn at the CALLER's batch size (bit-identity with the XLA
    # walker under the same key); pad walkers consume u=0 deterministically
    uniforms = jnp.zeros((n_hops, b, 3), jnp.float32).at[:, :b0].set(
        jax.random.uniform(key, (n_hops, b0, 3))).reshape(n_hops, 1, 3 * b)
    org = origin_ext[nodeset].astype(jnp.int32).reshape(-1)  # [2B] SMEM

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_hops,),
        in_specs=[
            pl.BlockSpec((1, 1, 3 * b), lambda h, org: (h, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # i2c lines (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # c2i lines (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SMEM((2 * b,), jnp.int32),         # walker state
            pltpu.SMEM((K_INFLIGHT,), jnp.int32),    # gather1 record idxs
            pltpu.SMEM((K_INFLIGHT,), jnp.int32),    # gather2 record idxs
            pltpu.SMEM((K_INFLIGHT * WIN,), jnp.int32),  # gather1 windows
            pltpu.SMEM((K_INFLIGHT * WIN,), jnp.int32),  # gather2 windows
            pltpu.SMEM((b,), jnp.int32),             # hop trace row
            pltpu.SemaphoreType.DMA((K_INFLIGHT,)),
            pltpu.SemaphoreType.DMA((K_INFLIGHT,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    trace = pl.pallas_call(
        partial(_walk_kernel, alpha=alpha, n_walkers=b),
        out_shape=jax.ShapeDtypeStruct((n_hops * b,), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(org, uniforms, _pack_records(i2c_ext), _pack_records(c2i_ext))
    # [B, n_hops], same layout as walks_from_fused_tables
    return trace.reshape(n_hops, b).T[:b0]
