"""A/B: concat-matmul vs split-matmul conv at the FLOP-bound shape.

conv_apply computes leaky_relu(concat([h_self, agg]) @ Ww.T + bw).  The
concatenate produces an [N, d_in + hidden] operand (123 MB at the FB
shape) that XLA may or may not materialize; the mathematically identical
split form h_self @ Ww[:, :d].T + agg @ Ww[:, d:].T never builds it.
This script times the full fullgraph forward+backward at the FB shape
(bench.py's L4-h1024-o256, N=20k, T=3) both ways with the standard
R-rep-difference method and prints one JSON line.  If the split form
wins materially it should become conv_apply's implementation (the
round-5 controls showed this shape is matmul/compute-bound, so any win
here moves the 41%-MFU needle).

Usage: python scripts/fb_conv_split_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N = 20000
T = 3
FEAT = 512
HID = 1024
OUT = 256
LAYERS = 4
REPS_SMALL = 20
REPS_LARGE = 100
MEDIANS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gcn_song_embeddings_tpu.models.pinsage import init_pinsage
    from gcn_song_embeddings_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log("devices:", jax.devices())

    rng = np.random.default_rng(0)
    features = jnp.asarray(rng.normal(size=(N, FEAT)).astype(np.float32))
    nb_n = jnp.asarray(rng.integers(0, N, size=(N, T)).astype(np.int32))
    nb_w = jnp.asarray(np.sort(rng.random((N, T)).astype(np.float32),
                               axis=1)[:, ::-1].copy())
    params = init_pinsage(jax.random.PRNGKey(0), LAYERS, FEAT, HID, OUT)

    def conv_concat(p, h_self, h_nb, w):
        """The PRE-adoption conv: W applied to the materialized concat.
        Kept inline as the A/B baseline — conv_apply itself now uses the
        split form, so importing it would compare split vs split."""
        q = jax.nn.leaky_relu(
            jnp.einsum("btd,hd->bth", h_nb, p.Wq,
                       preferred_element_type=jnp.float32) + p.bq)
        w_sum = w.sum(axis=1, keepdims=True)
        denom = jnp.where(w_sum == 0.0, 1.0, w_sum)
        agg = (w[:, :, None] * q).sum(axis=1) / denom
        concat = jnp.concatenate([h_self, agg], axis=1)
        new_h = jax.nn.leaky_relu(
            jnp.dot(concat, p.Ww.T,
                    preferred_element_type=jnp.float32) + p.bw)
        norm = jnp.linalg.norm(new_h, axis=1, keepdims=True)
        return new_h / jnp.where(norm == 0.0, 1.0, norm)

    def conv_split(p, h_self, h_nb, w):
        """conv_apply with the W matmul split over the concat boundary
        (identical math: [a, b] @ M.T == a @ M[:, :da].T + b @ M[:, da:].T)."""
        q = jax.nn.leaky_relu(
            jnp.einsum("btd,hd->bth", h_nb, p.Wq,
                       preferred_element_type=jnp.float32) + p.bq)
        w_sum = w.sum(axis=1, keepdims=True)
        denom = jnp.where(w_sum == 0.0, 1.0, w_sum)
        agg = (w[:, :, None] * q).sum(axis=1) / denom
        d = h_self.shape[1]
        new_h = jax.nn.leaky_relu(
            jnp.dot(h_self, p.Ww[:, :d].T,
                    preferred_element_type=jnp.float32)
            + jnp.dot(agg, p.Ww[:, d:].T,
                      preferred_element_type=jnp.float32) + p.bw)
        norm = jnp.linalg.norm(new_h, axis=1, keepdims=True)
        return new_h / jnp.where(norm == 0.0, 1.0, norm)

    def make_step(conv):
        def loss(p):
            h = features
            for l in range(LAYERS):
                h_nb = h[nb_n.reshape(-1)].reshape(N, T, h.shape[1])
                h = conv(p.layers[l], h, h_nb, nb_w)
            return jnp.sum(h * h)

        @partial(jax.jit, static_argnames=("reps",))
        def run(p, reps):
            def body(acc, i):
                l, g = jax.value_and_grad(loss)(
                    jax.tree.map(lambda x: x + 1e-30 * acc, p))
                return acc + l + sum(
                    jnp.sum(x) for x in jax.tree.leaves(g)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(reps, dtype=jnp.int32))
            return acc

        return run

    # numeric parity first (same params, fp-reassociation tolerance)
    h0 = features
    ha = hb = h0
    for l in range(LAYERS):
        nb = ha[nb_n.reshape(-1)].reshape(N, T, ha.shape[1])
        ha = conv_concat(params.layers[l], ha, nb, nb_w)
        nb2 = hb[nb_n.reshape(-1)].reshape(N, T, hb.shape[1])
        hb = conv_split(params.layers[l], hb, nb2, nb_w)
    err = float(jnp.max(jnp.abs(ha - hb)))
    log(f"max |concat - split| over {LAYERS} layers: {err:.2e}")
    # CPU f32: ~1e-7.  TPU default precision runs matmuls as one bf16
    # pass, so reassociating the concat boundary shifts rounded sums by
    # ~2e-4 on unit-norm rows — a wiring-bug guard, not a precision test
    # (tests/test_pinsage_model.py pins the math in f32).
    assert err < 1e-2, err

    out = {}
    for name, conv in (("concat", conv_concat), ("split", conv_split)):
        run = make_step(conv)
        float(run(params, REPS_SMALL))
        float(run(params, REPS_LARGE))
        diffs = []
        for _ in range(MEDIANS):
            t0 = time.time()
            float(run(params, REPS_SMALL))
            t_s = time.time() - t0
            t0 = time.time()
            float(run(params, REPS_LARGE))
            t_l = time.time() - t0
            diffs.append((t_l - t_s) / (REPS_LARGE - REPS_SMALL))
        ms = 1e3 * float(np.median(diffs))
        out[name] = round(ms, 3)
        log(f"{name}: {ms:.3f} ms / fwd+bwd sweep")

    out["split_speedup"] = round(out["concat"] / out["split"], 4)
    out["max_abs_err"] = err
    with open(os.path.join(REPO, "results/fb_conv_split.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
