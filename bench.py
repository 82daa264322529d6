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
    t0 = time.time()
    run_chunk(CHUNK_SMALL, 0)
    compile_small_s = time.time() - t0
    run_chunk(CHUNK_LARGE, 1)
    compile_s = time.time() - t0
    log(f"compile+warmup: {compile_s:.1f}s "
        f"(first compile {compile_small_s:.1f}s)")

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
    return per_batch, compile_s


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
    if os.path.isfile(BASELINE_PATH):
        with open(BASELINE_PATH) as fh:
            d = json.load(fh)
        if d.get("config") == bench_config:
            cached = d.get("torch_cpu_s_per_batch")
        else:
            log("cached baseline is for a DIFFERENT bench config — "
                "ignoring it")
    if cached is not None and os.environ.get("GCN_TPU_BENCH_CACHED"):
        base_per_batch = cached
        log(f"cached torch baseline: {base_per_batch * 1e3:.2f} ms/batch")
    else:
        base_per_batch = measure_torch_baseline(features, nb_w, nb_n,
                                                positives)
        if cached is not None:
            log(f"baseline drift vs cached: {base_per_batch / cached:.3f}x "
                f"({base_per_batch * 1e3:.2f} vs {cached * 1e3:.2f} ms)")
            # vs_baseline uses the FASTEST torch measurement seen on this
            # host: co-tenant load on the small CPU host can slow the
            # baseline 2-3x between rounds, which would inflate the
            # speedup; giving the baseline its best-ever time keeps the
            # ratio conservative and round-over-round comparable.
            base_per_batch = min(base_per_batch, cached)
        with open(BASELINE_PATH, "w") as fh:
            json.dump({"torch_cpu_s_per_batch": base_per_batch,
                       "note": "fastest torch-CPU per-batch measured on "
                               "this host for this config (sticky min)",
                       "measured_unix": time.time(),
                       "loadavg_1m": os.getloadavg()[0],
                       "config": bench_config}, fh, indent=2)

    per_batch, compile_s = measure_tpu(features, nb_w, nb_n, positives)
    value = eps / per_batch
    vs = base_per_batch / per_batch
    print(json.dumps({"metric": "train_edges_per_s_chip",
                      "value": round(value, 1),
                      "unit": "edges/s",
                      "vs_baseline": round(vs, 3),
                      "compile_s": round(compile_s, 1),
                      "warm_step_ms": round(per_batch * 1e3, 4)}))


if __name__ == "__main__":
    main()
