"""Benchmark: PinSage training throughput on one chip vs the reference design.

Prints ONE JSON line:
    {"metric": "train_edges_per_s_chip", "value": N, "unit": "edges/s",
     "vs_baseline": R}

where `value` is aggregate-edges-processed per second by the fused
sample+forward+backward+Adam train step at the reference configuration
(B=128, L=2, T=3, hidden 512, out 128, OpenL3-width 512 features — SURVEY
§2.1), and `vs_baseline` is the speedup over a faithful torch-CPU
re-implementation of the reference's per-batch math (3 forward passes +
max-margin loss + Adam, pinsage_model.py:189-265 / pinsage_training.py:181-214)
run on the same host, same synthetic data.  Edges per step = neighbor
aggregations = sum over conv layers of (frontier size x T).

The line also carries a second, FLOP-bound shape (`flopbound_*` keys): the
reference grid's large config (n_layers=4, hidden 1024, out 256 —
/root/reference/dashboard.py:136-137) at B=4096 with the full-graph
forward, reported as TFLOP/s and the fraction of the measured ~92.5
TFLOP/s no-gather v5e ceiling (RESULTS.md roofline), so the compute-bound
regime has a standing MFU number next to the latency-bound headline.

The baseline timing is cached in BENCH_BASELINE.json (delete to re-measure).
All progress goes to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_TRACKS = 20000
N_COLS = 4000
FEAT_DIM = 512
BATCH = 128
N_LAYERS = 2
T = 3
HIDDEN = 512
OUT = 128
CHUNK_SMALL = 100
CHUNK_LARGE = 500
REPS = 3

BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def edges_per_step(batch: int, n_layers: int, t: int) -> int:
    """Neighbor aggregations per train step (3 forwards of [B] nodes)."""
    m = 3 * batch
    total = 0
    for _ in range(n_layers):
        total += m * t
        m = m * (t + 1)
    return total


def build_problem(seed: int = 0):
    rng = np.random.default_rng(seed)
    features = rng.normal(size=(N_TRACKS, FEAT_DIM)).astype(np.float32)
    t_store = 100
    nb_n = rng.integers(0, N_TRACKS, size=(N_TRACKS, t_store)).astype(np.int32)
    nb_w = np.sort(rng.random((N_TRACKS, t_store)).astype(np.float32),
                   axis=1)[:, ::-1].copy()
    positives = rng.integers(0, N_TRACKS, size=(50000, 2)).astype(np.int32)
    return features, nb_w, nb_n, positives


def measure_tpu(features, nb_w, nb_n, positives) -> float:
    """Seconds per train batch on the default JAX device."""
    import jax
    import jax.numpy as jnp

    from gcn_song_embeddings_tpu.config import RunConfig, config_with_overrides
    from gcn_song_embeddings_tpu.train import trainer as trn
    from gcn_song_embeddings_tpu.models.pinsage import init_pinsage

    log(f"jax devices: {jax.devices()}")
    cfg = config_with_overrides(RunConfig(run_name="bench"), {
        "model.in_dim": FEAT_DIM, "model.hidden_dim": HIDDEN,
        "model.out_dim": OUT, "model.n_layers": N_LAYERS, "model.T": T,
        "train.batch_size": BATCH,
    })
    params = init_pinsage(jax.random.PRNGKey(0), N_LAYERS, FEAT_DIM,
                          HIDDEN, OUT)
    tx = trn.make_optimizer(cfg)
    opt_state = tx.init(params)
    fj = jnp.asarray(features)
    wj = jnp.asarray(nb_w)
    nj = jnp.asarray(nb_n)
    pj = jnp.asarray(positives)

    key = jax.random.PRNGKey(1)

    # NOTE: block_until_ready does not reliably block on the experimental
    # axon platform — force a device-to-host transfer to synchronize.
    # Each dispatch carries O(1 s) tunnel latency, so per-batch time is
    # measured as the DIFFERENCE between a large and a small chunk call
    # (both pre-compiled), which cancels the fixed round-trip cost.
    def run_chunk(n_chunk, i):
        nonlocal params, opt_state
        k = jax.random.fold_in(key, i)
        t0 = time.time()
        params, opt_state, m = trn._train_chunk(
            params, opt_state, fj, wj, nj, pj, k, cfg.train, cfg.model,
            N_TRACKS, n_chunk, tx)
        np.asarray(m)
        return time.time() - t0

    # Cold/warm split (VERDICT r2 item 5): the first chunk call pays
    # tunnel + (remote) compile — possibly served by the persistent
    # compile cache (utils/compile_cache.py) — while the second compile
    # (other chunk size) plus warmup is reported separately so
    # round-over-round `compile_s` deltas aren't read as perf changes.
    # compile_cache provenance (VERDICT r4 item 8): a cache HIT writes no
    # new entries to the persistent cache dir; a MISS does — recorded so
    # compile_s values are comparable across rounds at a glance.
    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    cache_dir = enable_compile_cache()
    before = set(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else set()
    t0 = time.time()
    run_chunk(CHUNK_SMALL, 0)
    compile_small_s = time.time() - t0
    run_chunk(CHUNK_LARGE, 1)
    compile_s = time.time() - t0
    after = set(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else set()
    cache_state = "hit" if after == before else "miss"
    log(f"compile+warmup: {compile_s:.1f}s "
        f"(first compile {compile_small_s:.1f}s, "
        f"persistent cache {cache_state}: {len(after - before)} new "
        f"entries)")

    diffs = []
    for i in range(REPS):
        t_small = run_chunk(CHUNK_SMALL, 2 + 2 * i)
        t_large = run_chunk(CHUNK_LARGE, 3 + 2 * i)
        log(f"  rep {i}: small({CHUNK_SMALL})={t_small:.3f}s "
            f"large({CHUNK_LARGE})={t_large:.3f}s")
        diffs.append((t_large - t_small) / (CHUNK_LARGE - CHUNK_SMALL))
    per_batch = float(np.median(diffs))
    log(f"tpu per-batch: {per_batch * 1e3:.3f} ms "
        f"(epoch of 500 batches ~ {per_batch * 500:.2f}s)")
    return per_batch, compile_s, cache_state


FB_BATCH = 4096
FB_LAYERS = 4
FB_HIDDEN = 1024
FB_OUT = 256
FB_CHUNK_SMALL = 20
FB_CHUNK_LARGE = 100
# measured no-gather compute ceiling for this op shape on v5e (RESULTS.md
# "aggregation roofline decomposition": fused einsum+elementwise on
# resident rows sustains ~90-95 TFLOP/s, f32 == bf16)
V5E_CEILING_TFLOPS = 92.5


def flopbound_matmul_flops(n_tracks: int) -> int:
    """Analytic matmul FLOPs per FLOP-bound train step (full-graph
    strategy: every layer convolves the WHOLE catalog, N*T Q-rows +
    N W-rows; backward ~2x forward on the same matmuls)."""
    total = 0
    d_in = FEAT_DIM
    for _ in range(FB_LAYERS):
        total += 2 * n_tracks * T * d_in * FB_HIDDEN          # Q
        total += 2 * n_tracks * (d_in + FB_HIDDEN) * FB_OUT   # W
        d_in = FB_OUT
    total += 2 * (3 * FB_BATCH) * FB_OUT * FB_OUT * 2          # G1+G2 head
    return 3 * total                                           # fwd + bwd


def measure_flopbound(features, nb_w, nb_n, positives,
                      dtype: str = "float32"):
    """Seconds per train batch at the reference grid's LARGE shape
    (n_layers=4, hidden 1024, out 256 — /root/reference/dashboard.py:
    136-137, grid_search_results/grid_search2.json) with B=4096 and the
    full-graph forward.  The headline B=128 shape is gather/latency-bound
    (MXU at ~35 of ~92 TFLOP/s); this one exercises the compute-bound
    regime and is reported as TFLOP/s + fraction of the measured no-gather
    ceiling (VERDICT r3 item 4)."""
    import jax
    import jax.numpy as jnp

    from gcn_song_embeddings_tpu.config import RunConfig, config_with_overrides
    from gcn_song_embeddings_tpu.train import trainer as trn
    from gcn_song_embeddings_tpu.models.pinsage import init_pinsage

    cfg = config_with_overrides(RunConfig(run_name=f"bench_fb_{dtype}"), {
        "model.in_dim": FEAT_DIM, "model.hidden_dim": FB_HIDDEN,
        "model.out_dim": FB_OUT, "model.n_layers": FB_LAYERS, "model.T": T,
        "train.batch_size": FB_BATCH, "train.fullgraph_forward": "on",
        "train.dtype": dtype,
    })
    params = init_pinsage(jax.random.PRNGKey(0), FB_LAYERS, FEAT_DIM,
                          FB_HIDDEN, FB_OUT)
    tx = trn.make_optimizer(cfg)
    opt_state = tx.init(params)
    fj = jnp.asarray(features)
    wj = jnp.asarray(nb_w)
    nj = jnp.asarray(nb_n)
    pj = jnp.asarray(positives)
    key = jax.random.PRNGKey(2)

    def run_chunk(n_chunk, i):
        nonlocal params, opt_state
        k = jax.random.fold_in(key, i)
        t0 = time.time()
        params, opt_state, m = trn._train_chunk(
            params, opt_state, fj, wj, nj, pj, k, cfg.train, cfg.model,
            N_TRACKS, n_chunk, tx)
        np.asarray(m)
        return time.time() - t0

    t0 = time.time()
    run_chunk(FB_CHUNK_SMALL, 0)
    run_chunk(FB_CHUNK_LARGE, 1)
    log(f"flopbound compile+warmup: {time.time() - t0:.1f}s")
    diffs = []
    for i in range(REPS):
        t_small = run_chunk(FB_CHUNK_SMALL, 2 + 2 * i)
        t_large = run_chunk(FB_CHUNK_LARGE, 3 + 2 * i)
        log(f"  fb rep {i}: small({FB_CHUNK_SMALL})={t_small:.3f}s "
            f"large({FB_CHUNK_LARGE})={t_large:.3f}s")
        diffs.append((t_large - t_small) / (FB_CHUNK_LARGE - FB_CHUNK_SMALL))
    per_batch = float(np.median(diffs))
    tflops = flopbound_matmul_flops(N_TRACKS) / per_batch / 1e12
    log(f"flopbound per-batch: {per_batch * 1e3:.3f} ms = "
        f"{tflops:.1f} TFLOP/s "
        f"({100 * tflops / V5E_CEILING_TFLOPS:.0f}% of the no-gather "
        f"ceiling)")
    return per_batch, tflops


def measure_gather_rates(widths=(256, 512, 1024), n_idx=N_TRACKS * T,
                         reps_small=4, reps_large=20):
    """Measured gather-engine row rate (rows/s) per row width on the
    default device — the input to the machine-checked roofline (VERDICT
    r4 item 3).  One jitted scan gathers `n_idx` random rows per rep and
    reduces them to a scalar (XLA fuses gather+reduce, so the rows never
    round-trip HBM); per-rep time is the (R_large - R_small) difference,
    cancelling dispatch latency like every other bench arm.

    The 1024-wide arm is the DESCRIPTOR-RATE control: same row count at
    2x the bytes.  rate(512)/rate(1024) ~ 1 means the engine is bound by
    row descriptors, not bytes (the round-3 hypothesis — then wider
    embeddings are gather-free); ~2 means byte-bound."""
    import jax
    import jax.numpy as jnp
    from functools import partial as _partial

    rng = np.random.default_rng(7)
    idx = jnp.asarray(rng.integers(0, N_TRACKS, n_idx).astype(np.int32))

    @_partial(jax.jit, static_argnames=("reps",))
    def run(h, idx, reps):
        def body(acc, i):
            rows = h[(idx + i) % h.shape[0]]     # vary idx: no hoisting
            return acc + jnp.sum(rows, dtype=jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(reps, dtype=jnp.int32))
        return acc

    def measure(h, d, bytes_per_el):
        float(run(h, idx, reps_small))           # compile both variants
        float(run(h, idx, reps_large))
        diffs = []
        for _ in range(REPS):
            t0 = time.time()
            float(run(h, idx, reps_small))
            t_small = time.time() - t0
            t0 = time.time()
            float(run(h, idx, reps_large))
            t_large = time.time() - t0
            diffs.append((t_large - t_small) / (reps_large - reps_small))
        rate = n_idx / float(np.median(diffs))
        log(f"gather rate d={d} ({bytes_per_el}B/el): "
            f"{rate / 1e6:.1f}M rows/s "
            f"({rate * d * bytes_per_el / 1e9:.0f} GB/s)")
        return rate

    rates = {}
    rng2 = np.random.default_rng(8)
    for d in widths:
        h = jnp.asarray(rng2.normal(size=(N_TRACKS, d)).astype(np.float32))
        rates[d] = measure(h, d, 4)
    # bf16 arm: same row count and width at HALF the bytes — if the
    # engine is byte-bound (wide-row control ~2), bf16 table rows should
    # gather ~2x faster, making bf16 node tables a real lever
    h16 = jnp.asarray(
        rng2.normal(size=(N_TRACKS, 512))).astype(jnp.bfloat16)
    rate_bf16 = measure(h16, 512, 2)
    return rates, rate_bf16


# HBM passes over the gathered neighbor rows per train step: the forward
# gather, the backward's re-gather of the same rows for dQ, and the
# scatter-accumulate of dh — the model behind RESULTS.md's "~306 MB per
# forward plus the backward's re-gathers" decomposition, now machine-
# checked (flopbound_roofline_ratio ~ 1 says measured == predicted).
GATHER_PASSES = 3


def measure_stream_bw(n_f32: int = 64 * 1024 * 1024,
                      reps_small: int = 20, reps_large: int = 200) -> float:
    """Measured dense HBM streaming read bandwidth (bytes/s): a scanned
    nonlinear reduce over a 256 MB resident array (one read pass per rep,
    nothing written back), diff-timed like every other arm.  Rep counts
    are sized so the diff carries ~45 GB ≈ 60 ms of signal — with only 8
    diff-reps the ~2.6 ms signal drowned in tunnel jitter and single
    runs read 1100-2200 "GB/s", above the chip's HW peak.  Feeds the
    activation-traffic term of the roofline (a sanity line — the
    contiguous-gather control is the decisive instrument)."""
    import jax
    import jax.numpy as jnp
    from functools import partial as _partial

    x = jnp.ones((n_f32,), jnp.float32)

    @_partial(jax.jit, static_argnames=("reps",))
    def run(x, reps):
        def body(acc, i):
            # abs(x + i) is NONLINEAR in x: the algebraic simplifier
            # cannot factor the reduce out of the scan (a linear
            # sum(x * c_i) was rewritten to c_i * sum(x), hoisting the
            # read and measuring 2185 "GB/s" — above the chip's HW peak)
            return acc + jnp.sum(jnp.abs(x + i.astype(jnp.float32))), None

        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(reps, dtype=jnp.int32))
        return acc

    float(run(x, reps_small))
    float(run(x, reps_large))
    diffs = []
    for _ in range(REPS):
        t0 = time.time()
        float(run(x, reps_small))
        t_small = time.time() - t0
        t0 = time.time()
        float(run(x, reps_large))
        t_large = time.time() - t0
        diffs.append((t_large - t_small) / (reps_large - reps_small))
    bw = n_f32 * 4 / float(np.median(diffs))
    log(f"stream read bandwidth: {bw / 1e9:.0f} GB/s")
    return bw


def flopbound_activation_bytes() -> int:
    """HBM traffic of the FB step's saved intermediates: each layer's Q
    activation [N*T, hidden] and W concat/output are written by the
    forward and re-read by the backward (2 passes).  The no-gather MXU
    ceiling already includes writing ONE matmul output, so this term
    models only the save-and-reload traffic the training step adds on
    top of it — an approximation (XLA may rematerialize or fuse some of
    these), which is why the ratio is published rather than asserted to
    be exactly 1."""
    rows = N_TRACKS * T
    total = 0
    d_in = FEAT_DIM
    for _ in range(FB_LAYERS):
        total += 2 * rows * FB_HIDDEN * 4              # Q activation
        total += 2 * N_TRACKS * (d_in + FB_HIDDEN) * 4  # W concat input
        total += 2 * N_TRACKS * FB_OUT * 4             # layer output h
        d_in = FB_OUT
    return total


def roofline_predict(gather_rates: dict, stream_bw: float
                     ) -> tuple[float, float, float]:
    """(gather, matmul, activation) predicted seconds per FLOP-bound
    train step, from the measured gather row rates, the no-gather MXU
    ceiling, and the measured streaming bandwidth.  Layer input widths
    at the FB shape: FEAT_DIM then FB_OUT (the fullgraph forward gathers
    N*T rows of the running h per layer)."""
    dims = [FEAT_DIM] + [FB_OUT] * (FB_LAYERS - 1)
    rows = N_TRACKS * T

    def rate(d):
        if d in gather_rates:
            return gather_rates[d]
        # interpolate in rows/s between measured widths
        ws = sorted(gather_rates)
        lo = max([w for w in ws if w <= d], default=ws[0])
        hi = min([w for w in ws if w >= d], default=ws[-1])
        if lo == hi:
            return gather_rates[lo]
        f = (d - lo) / (hi - lo)
        return gather_rates[lo] * (1 - f) + gather_rates[hi] * f

    gather_s = GATHER_PASSES * sum(rows / rate(d) for d in dims)
    matmul_s = flopbound_matmul_flops(N_TRACKS) / (V5E_CEILING_TFLOPS * 1e12)
    act_s = flopbound_activation_bytes() / stream_bw
    return gather_s, matmul_s, act_s


def measure_torch_baseline(features, nb_w, nb_n, positives) -> float:
    """Reference-equivalent per-batch time: torch CPU, 3 forwards + loss +
    backward + Adam, same math as pinsage_model.py:189-265 (independent
    re-implementation; weights random)."""
    import torch

    torch.manual_seed(0)
    f = torch.from_numpy(features)
    w_all = torch.from_numpy(nb_w[:, :T].copy())
    n_all = torch.from_numpy(nb_n[:, :T].astype(np.int64))
    pos = torch.from_numpy(positives.astype(np.int64))

    dims_in = [FEAT_DIM, OUT]
    layers = []
    params = []
    for l in range(N_LAYERS):
        Q = torch.nn.Linear(dims_in[l], HIDDEN)
        W = torch.nn.Linear(dims_in[l] + HIDDEN, OUT)
        layers.append((Q, W))
        params += list(Q.parameters()) + list(W.parameters())
    G1 = torch.nn.Linear(OUT, OUT)
    G2 = torch.nn.Linear(OUT, OUT, bias=False)
    params += list(G1.parameters()) + list(G2.parameters())
    opt = torch.optim.Adam(params, lr=1e-4)
    lrelu = torch.nn.functional.leaky_relu

    def forward(nodeset):
        frontiers = [nodeset]
        nbs = []
        for _ in range(N_LAYERS):
            fr = frontiers[-1]
            nbs.append((w_all[fr], n_all[fr]))
            frontiers.append(torch.cat([fr, n_all[fr].reshape(-1)]))
        h = f[frontiers[-1]]
        for l in range(N_LAYERS - 1, -1, -1):
            m = frontiers[l].shape[0]
            Q, W = layers[N_LAYERS - 1 - l]
            nb_wt, _ = nbs[l]
            h_nb = h[m:].reshape(m, T, h.shape[1])
            q = lrelu(Q(h_nb))
            agg = (nb_wt[:, :, None] * q).sum(1) / nb_wt.sum(1, keepdim=True)
            h = lrelu(W(torch.cat([h[:m], agg], dim=1)))
            h = h / h.norm(dim=1, keepdim=True)
        return G2(lrelu(G1(h)))

    def step(i):
        rng = np.random.default_rng(i)
        rows = rng.integers(0, pos.shape[0], BATCH)
        batch = pos[rows]
        neg = torch.from_numpy(
            rng.integers(0, N_TRACKS, BATCH).astype(np.int64))
        hq = forward(batch[:, 0])
        hp = forward(batch[:, 1])
        hn = forward(neg)
        nrm = torch.nn.functional.normalize
        hq, hp, hn = nrm(hq, dim=1), nrm(hp, dim=1), nrm(hn, dim=1)
        loss = torch.clamp((hq * hn).sum(1) - (hq * hp).sum(1) + 1e-5,
                           min=0).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()

    step(0)  # warmup
    n_steps = 20
    t0 = time.time()
    for i in range(1, n_steps + 1):
        step(i)
    per_batch = (time.time() - t0) / n_steps
    log(f"torch-cpu per-batch: {per_batch * 1e3:.2f} ms")
    return per_batch


def main() -> None:
    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    features, nb_w, nb_n, positives = build_problem()
    eps = edges_per_step(BATCH, N_LAYERS, T)
    log(f"edges per step: {eps}")

    # The torch baseline is RE-MEASURED every run (it costs ~2 s) so
    # vs_baseline reflects this host right now, not whatever load existed
    # when a cache was first written; the cached value is kept for drift
    # visibility.  Set GCN_TPU_BENCH_CACHED=1 to reuse the cache instead
    # (round-over-round comparability runs).
    bench_config = {"batch": BATCH, "n_layers": N_LAYERS, "T": T,
                    "hidden": HIDDEN, "out": OUT, "feat_dim": FEAT_DIM,
                    "n_tracks": N_TRACKS}
    cached = None
    cached_record = None
    if os.path.isfile(BASELINE_PATH):
        with open(BASELINE_PATH) as fh:
            d = json.load(fh)
        if d.get("config") == bench_config:
            cached = d.get("torch_cpu_s_per_batch")
            cached_record = d.get("min_record") or {
                # legacy layout: stamps were top-level (and possibly from
                # a later run than the min itself — unrecoverable; keep)
                "measured_unix": d.get("measured_unix"),
                "loadavg_1m": d.get("loadavg_1m")}
        else:
            log("cached baseline is for a DIFFERENT bench config — "
                "ignoring it")
    if cached is not None and os.environ.get("GCN_TPU_BENCH_CACHED"):
        base_per_batch = cached
        log(f"cached torch baseline: {base_per_batch * 1e3:.2f} ms/batch")
    else:
        measured = measure_torch_baseline(features, nb_w, nb_n, positives)
        this_record = {"torch_cpu_s_per_batch": measured,
                       "measured_unix": time.time(),
                       "loadavg_1m": os.getloadavg()[0]}
        base_per_batch, min_record = measured, this_record
        if cached is not None:
            log(f"baseline drift vs cached: {measured / cached:.3f}x "
                f"({measured * 1e3:.2f} vs {cached * 1e3:.2f} ms)")
            # vs_baseline uses the FASTEST torch measurement seen on this
            # host: co-tenant load on the small CPU host can slow the
            # baseline 2-3x between rounds, which would inflate the
            # speedup; giving the baseline its best-ever time keeps the
            # ratio conservative and round-over-round comparable.  Sanity
            # floor: a measurement under 1/4 of the standing min is a
            # timing glitch, not a faster host — don't let it become the
            # permanent denominator (ADVICE r3).
            if measured < 0.25 * cached:
                log("new measurement is <0.25x the standing min — "
                    "treating as a glitch, keeping the cached baseline")
                base_per_batch, min_record = cached, cached_record
            elif measured >= cached:
                base_per_batch, min_record = cached, cached_record
        with open(BASELINE_PATH, "w") as fh:
            json.dump({"torch_cpu_s_per_batch": base_per_batch,
                       "note": "fastest torch-CPU per-batch measured on "
                               "this host for this config (sticky min); "
                               "min_record stamps the run that PRODUCED "
                               "the min, last_run the most recent "
                               "measurement",
                       "min_record": min_record,
                       "last_run": this_record,
                       "config": bench_config}, fh, indent=2)

    per_batch, compile_s, cache_state = measure_tpu(features, nb_w, nb_n,
                                                    positives)
    fb_per_batch, fb_tflops = measure_flopbound(features, nb_w, nb_n,
                                                positives)
    # Contiguous-neighbor control: SAME jitted step (no recompile — only
    # the id data changes), neighbor ids = consecutive rows, so every
    # "gather" is a near-stream.  step_contig ~= step_random says the
    # random-gather traffic is hidden under compute (the shape is
    # matmul-bound at its effective rate); step_contig << step_random
    # says the gathers are exposed on the critical path.
    nb_n_contig = ((np.arange(N_TRACKS, dtype=np.int64)[:, None]
                    + np.arange(nb_n.shape[1])[None, :])
                   % N_TRACKS).astype(np.int32)
    fb_c_per_batch, _ = measure_flopbound(features, nb_w, nb_n_contig,
                                          positives)
    log(f"flopbound contiguous-gather control: {fb_c_per_batch*1e3:.3f} "
        f"ms vs random {fb_per_batch*1e3:.3f} ms -> exposed gather "
        f"share {(1 - fb_c_per_batch/fb_per_batch)*100:.0f}%")
    # machine-checked roofline (VERDICT r4 item 3): predicted FB step =
    # measured gather time + ceiling matmul time; ratio ~ 1.0-1.2 says
    # the 41%-MFU decomposition is arithmetic, not prose
    gather_rates, gather_rate_bf16_512 = measure_gather_rates()
    stream_bw = measure_stream_bw()
    gather_pred_s, matmul_pred_s, act_pred_s = roofline_predict(
        gather_rates, stream_bw)
    pred_s = gather_pred_s + matmul_pred_s + act_pred_s
    roofline_ratio = fb_per_batch / pred_s
    wide_ratio = gather_rates[512] / gather_rates[1024]
    bf16_gather_ratio = gather_rate_bf16_512 / gather_rates[512]
    log(f"roofline: predicted {1e3 * pred_s:.2f} "
        f"ms (gather {1e3 * gather_pred_s:.2f} + matmul "
        f"{1e3 * matmul_pred_s:.2f} + activations "
        f"{1e3 * act_pred_s:.2f}) vs measured "
        f"{1e3 * fb_per_batch:.2f} ms -> ratio {roofline_ratio:.3f}; "
        f"wide-row control rate512/rate1024 = {wide_ratio:.2f} "
        f"(~1 = descriptor-bound, ~2 = byte-bound); bf16 rows gather "
        f"{bf16_gather_ratio:.2f}x f32 at d=512")
    value = eps / per_batch
    vs = base_per_batch / per_batch
    print(json.dumps({"metric": "train_edges_per_s_chip",
                      "value": round(value, 1),
                      "unit": "edges/s",
                      "vs_baseline": round(vs, 3),
                      "compile_s": round(compile_s, 1),
                      "compile_cache": cache_state,
                      "warm_step_ms": round(per_batch * 1e3, 4),
                      "flopbound_tflops": round(fb_tflops, 2),
                      "flopbound_mfu_vs_ceiling": round(
                          fb_tflops / V5E_CEILING_TFLOPS, 3),
                      "flopbound_step_ms": round(fb_per_batch * 1e3, 3),
                      "flopbound_contig_step_ms": round(
                          fb_c_per_batch * 1e3, 3),
                      "flopbound_roofline_ratio": round(roofline_ratio, 3),
                      "roofline_pred_ms": {
                          "gather": round(gather_pred_s * 1e3, 3),
                          "matmul": round(matmul_pred_s * 1e3, 3),
                          "activations": round(act_pred_s * 1e3, 3)},
                      "hbm_stream_gbps": round(stream_bw / 1e9, 1),
                      "gather_mrows_per_s": {
                          str(d): round(r / 1e6, 1)
                          for d, r in gather_rates.items()},
                      "gather_wide_row_ratio": round(wide_ratio, 3),
                      "gather_bf16_row_ratio": round(bf16_gather_ratio, 3),
                      "flopbound_config": f"L{FB_LAYERS}-h{FB_HIDDEN}-"
                                          f"o{FB_OUT}-B{FB_BATCH}-"
                                          f"fullgraph"}))


if __name__ == "__main__":
    main()
