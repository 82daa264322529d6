"""PinSage trainer: fused sampling + triple-forward + Adam, scanned per epoch.

The reference trainer (pinsage_training.py:108-295) runs, per batch: host-side
sampling, three separate forward passes, loss, Adam step, and a full
checkpoint write.  Here one `jax.jit`-compiled `lax.scan` executes an entire
chunk of batches on device — sampling (threefry), a single fused [3B]
forward, max-margin loss, Adam with per-epoch exponential LR decay — and only
metric scalars come back to the host.  Checkpoints are written per chunk
(cadence configurable; the reference wrote every batch, SURVEY §7b.11).

Logged fields per batch keep the reference's wandb names
(pinsage_training.py:241-246): "Train Loss", "Node Features Loss",
"Batch Variance", "Learning Rate" — written as JSON lines to
`<run_dir>/metrics.jsonl`, plus "Gradient Norm" (the global grad L2,
standing in for the reference's wandb.watch gradient monitoring,
pinsage_training.py:171-174).
"""

from __future__ import annotations

import functools
import json
import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gcn_song_embeddings_tpu.config import RunConfig
from gcn_song_embeddings_tpu.data.device import DeviceGraph
from gcn_song_embeddings_tpu.models.pinsage import (
    PinSageParams,
    embed_all,
    forward_with_gather,
    fullgraph_embeddings,
    fullgraph_wins,
    head_apply,
    init_pinsage,
    pack_nbhds,
    packed_nbhd_gather,
    pinsage_forward,
)
from gcn_song_embeddings_tpu.ops.ppr import precompute_neighborhoods
from gcn_song_embeddings_tpu.train.loss import (
    batch_variance,
    cosine_triplet_loss,
    max_margin_loss,
)
from gcn_song_embeddings_tpu.train.sampler import sample_batch
from gcn_song_embeddings_tpu.utils.checkpoint import load_pytree, save_pytree

BASE_RUN_DIR = "./runs"


def make_optimizer(cfg: RunConfig) -> optax.GradientTransformation:
    """Adam + per-epoch exponential LR decay (reference Adam + ExponentialLR,
    pinsage_training.py:147-148, stepped per epoch at :256)."""
    return _make_optimizer_cached(cfg.train.lr, cfg.train.decay,
                                  cfg.train.batches_per_epoch)


@functools.lru_cache(maxsize=64)
def _make_optimizer_cached(lr: float, decay: float, batches_per_epoch: int
                           ) -> optax.GradientTransformation:
    # Cached so identical configs share one GradientTransformation object:
    # the trainer passes `tx` as a static jit argument, and a fresh object
    # per trainer would defeat the jit cache (grid search would recompile
    # every run).
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=batches_per_epoch,
        decay_rate=decay,
        staircase=True,
    )
    return optax.adam(learning_rate=schedule)


@partial(jax.jit, static_argnames=("tcfg", "mcfg", "n_items", "n_chunk",
                                   "tx"))
def _train_chunk(params: PinSageParams, opt_state, features: jnp.ndarray,
                 nbhd_w: jnp.ndarray, nbhd_n: jnp.ndarray,
                 positives: jnp.ndarray, chunk_key: jax.Array,
                 tcfg, mcfg, n_items: int, n_chunk: int, tx):
    """Run `n_chunk` train batches under one lax.scan. Returns new state +
    per-batch metrics [n_chunk, 5] (loss, node_feat_loss, variance, lr,
    grad_norm).

    Static args are the train/model sub-configs (NOT the whole RunConfig,
    whose run_name would needlessly fragment the jit cache across runs).

    tcfg.dtype="bfloat16" enables mixed precision: master weights and the
    Adam state stay f32; the feature table, gathered activations, and
    matmul operands are bf16 with f32 accumulation (halves gather traffic
    and runs the MXU at its native width)."""
    compute_dtype = jnp.dtype(tcfg.dtype)
    features = features.astype(compute_dtype)
    # One packed [N, 2T] neighborhood table, built once per chunk dispatch:
    # each forward level then costs a single row gather (the B=128 step is
    # kernel-latency-bound; see models.pinsage.pack_nbhds).
    packed = pack_nbhds(nbhd_w, nbhd_n, mcfg.T)
    gather_nbhds = packed_nbhd_gather(packed, mcfg.T)
    # Large-batch strategy: computing the conv stack over the FULL catalog
    # touches N*T rows/layer, vs the frontier expansion's 3B*(T+1)^l —
    # cheaper once the triple batch's frontier exceeds the catalog
    # (models/pinsage.fullgraph_wins); identical math either way.
    use_fullgraph = (tcfg.fullgraph_forward == "on"
                     or (tcfg.fullgraph_forward == "auto"
                         and fullgraph_wins(3 * tcfg.batch_size, n_items,
                                            mcfg.n_layers, mcfg.T)))

    def batch_step(carry, key):
        params, opt_state = carry
        k_sample, _ = jax.random.split(key)
        # hn curriculum: gate hard negatives on the global step (the Adam
        # count = batches done), so a chunk can cross the easy->hard
        # boundary at hn_start_epoch without recompiling.
        hn_gate = None
        if tcfg.hard_negatives and tcfg.hn_start_epoch > 0:
            hn_gate = (_adam_count(opt_state)
                       >= tcfg.hn_start_epoch * tcfg.batches_per_epoch)
        batch = sample_batch(k_sample, positives, nbhd_n,
                             tcfg.batch_size, n_items,
                             hard_negatives=tcfg.hard_negatives,
                             hn_min=tcfg.hn_min, hn_max=tcfg.hn_max,
                             exact=tcfg.exact_batch_sampling,
                             hn_gate=hn_gate)

        def loss_fn(p):
            pc = jax.tree.map(lambda x: x.astype(compute_dtype), p)
            nodes = jnp.concatenate([batch[:, 0], batch[:, 1], batch[:, 2]])
            if use_fullgraph:
                h_all = fullgraph_embeddings(
                    pc, features, nbhd_w.astype(compute_dtype), nbhd_n,
                    mcfg.n_layers, mcfg.T)
                emb = head_apply(pc, h_all[nodes]).astype(jnp.float32)
            else:
                emb = forward_with_gather(
                    pc, lambda ids: features[ids], gather_nbhds, nodes,
                    mcfg.n_layers, mcfg.T).astype(jnp.float32)
            h_q, h_pos, h_neg = jnp.split(emb, 3, axis=0)
            loss = max_margin_loss(h_q, h_pos, h_neg, tcfg.margin)
            return loss, h_q

        (loss, h_q), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # global gradient L2 norm — the parity stand-in for the
        # reference's wandb.watch gradient monitoring
        # (pinsage_training.py:171-174); computed on device, one scalar
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # Diagnostics (reference pinsage_training.py:200-212): one fused
        # [B,3] gather + normalize instead of three.
        f_rows = features[batch.reshape(-1)].astype(jnp.float32)
        f_rows = f_rows.reshape(tcfg.batch_size, 3, -1)
        f_rows = f_rows / jnp.maximum(
            jnp.linalg.norm(f_rows, axis=-1, keepdims=True), 1e-12)
        node_feat_loss = cosine_triplet_loss(
            f_rows[:, 0], f_rows[:, 1], f_rows[:, 2])
        variance = batch_variance(h_q)
        step = _adam_count(opt_state)
        lr = tcfg.lr * tcfg.decay ** (step // tcfg.batches_per_epoch)
        metrics = jnp.stack([loss, node_feat_loss, variance, lr,
                             grad_norm])
        return (new_params, new_opt_state), metrics

    keys = jax.random.split(chunk_key, n_chunk)
    (params, opt_state), metrics = jax.lax.scan(
        batch_step, (params, opt_state), keys)
    return params, opt_state, metrics


def _adam_count(opt_state) -> jnp.ndarray:
    """Step counter from an optax adam state (scale_by_adam is first)."""
    return opt_state[0].count.astype(jnp.float32)


class PinSageTrainer:
    """Trainer facade mirroring the reference `PinSage` class surface
    (pinsage_training.py:108-295): construct with graph + features +
    positives, then `.train()`, `.embed()`, with resume-on-init."""

    def __init__(self, graph: DeviceGraph, n_items: int,
                 features: np.ndarray, positives: np.ndarray,
                 cfg: Optional[RunConfig] = None,
                 base_run_dir: str = BASE_RUN_DIR,
                 nbhds_path: Optional[str] = None,
                 nbhds: Optional[tuple[np.ndarray, np.ndarray]] = None,
                 log: bool = True, load_save: bool = True,
                 verbose: bool = True):
        from gcn_song_embeddings_tpu.utils.compile_cache import (
            enable_compile_cache,
        )

        enable_compile_cache()
        self.cfg = cfg if cfg is not None else RunConfig()
        # in_dim always tracks the feature matrix (pinsage_training.py:128)
        if self.cfg.model.in_dim != features.shape[1]:
            import dataclasses

            self.cfg = self.cfg.replace(model=dataclasses.replace(
                self.cfg.model, in_dim=features.shape[1]))
        self.graph = graph
        self.n = n_items
        self.verbose = verbose

        if (self.cfg.train.hard_negatives
                and self.cfg.train.hn_max > self.cfg.walk.t_precompute):
            raise ValueError(
                f"train.hn_max={self.cfg.train.hn_max} exceeds "
                f"walk.t_precompute={self.cfg.walk.t_precompute}: hard "
                f"negatives are drawn from the precomputed neighborhood "
                f"ranks (SURVEY 7b.6)")
        if self.cfg.walk.colisten_copies > 0:
            # give the walks the co-listen signal CF factorizes directly
            # (walk.colisten_copies) — shared helper so the CLI's sharded
            # branch and this path use one augmentation + cache-naming
            # scheme
            from gcn_song_embeddings_tpu.data.device import (
                apply_colisten_config,
            )

            graph, nbhds_path = apply_colisten_config(
                graph, positives, self.cfg.walk, nbhds_path)
            self.graph = graph
        if nbhds is None:
            nbhds = precompute_neighborhoods(
                graph, self.cfg.walk, nbhds_path, seed=self.cfg.train.seed,
                verbose=verbose)
        self.nbhd_w = jnp.asarray(nbhds[0], dtype=jnp.float32)
        self.nbhd_n = jnp.asarray(nbhds[1], dtype=jnp.int32)
        self.features = jnp.asarray(features, dtype=jnp.float32)
        self.positives = jnp.asarray(positives, dtype=jnp.int32)

        key = jax.random.PRNGKey(self.cfg.train.seed)
        self.params = init_pinsage(
            key, self.cfg.model.n_layers, features.shape[1],
            self.cfg.model.hidden_dim, self.cfg.model.out_dim,
            self.cfg.model.bias_init)
        self.tx = make_optimizer(self.cfg)
        self.opt_state = self.tx.init(self.params)

        self.e = 0          # epochs done
        self.b = 0          # batches done within current epoch
        self.run_dir = os.path.join(base_run_dir, self.cfg.run_name)
        os.makedirs(self.run_dir, exist_ok=True)
        with open(os.path.join(self.run_dir, "config.json"), "w") as f:
            f.write(self.cfg.to_json())

        self.log = log
        self._metrics_path = os.path.join(self.run_dir, "metrics.jsonl")
        self.load_save = load_save
        if load_save:
            self.load_model()

    # ------------------------------------------------------------------ api

    @property
    def state_path(self) -> str:
        return os.path.join(self.run_dir, "state.npz")

    def train(self) -> None:
        tcfg = self.cfg.train
        bpe = tcfg.batches_per_epoch
        total = tcfg.epochs * bpe
        # Chunks legally SPAN epoch boundaries: the optax LR schedule is
        # step-indexed (exponential_decay staircase on the Adam count), so
        # nothing in the math needs a host round-trip per epoch.  One
        # dispatch + one checkpoint per `checkpoint_every_batches` batches
        # cuts the full reference 30-epoch schedule from >=30 tunnel
        # round-trips to ~total/chunk (the per-epoch wall was dispatch-
        # bound ~25x over its own on-chip compute; VERDICT r3 item 3).
        chunk = min(tcfg.checkpoint_every_batches, total)
        base_key = jax.random.PRNGKey(tcfg.seed + 1)

        done = self.e * bpe + self.b
        while done < total:
            t0 = time.time()
            n_chunk = min(chunk, total - done)
            # key derived from the global batch index at chunk start:
            # checkpoints land on chunk boundaries, so a resumed run
            # replays the identical key sequence as a continuous one
            chunk_key = jax.random.fold_in(base_key, done)
            self.params, self.opt_state, metrics = _train_chunk(
                self.params, self.opt_state, self.features,
                self.nbhd_w, self.nbhd_n, self.positives, chunk_key,
                self.cfg.train, self.cfg.model, self.n, n_chunk,
                self.tx)
            if self.log:
                self._log_metrics(np.asarray(metrics), done)
            done += n_chunk
            self.e, self.b = divmod(done, bpe)
            if self.load_save:
                self.save_model()
            if self.verbose:
                loss = float(np.asarray(metrics)[-1, 0])
                print(f"epoch {self.e}/{tcfg.epochs} (batch {self.b}): "
                      f"{n_chunk} batches in {time.time() - t0:.2f}s, "
                      f"last loss={loss:.6f}")

    def embed(self, ids: Optional[np.ndarray] = None,
              bsize: int = 1024) -> np.ndarray:
        """Embed items (reference PinSage.embed, pinsage_training.py:258-275).
        With ids=None, embeds all items."""
        mcfg = self.cfg.model
        if ids is None:
            return np.asarray(embed_all(
                self.params, self.features, self.nbhd_w, self.nbhd_n,
                self.n, mcfg.n_layers, mcfg.T, batch_size=bsize))
        ids = np.asarray(ids, dtype=np.int32)
        out = pinsage_forward(self.params, self.features, self.nbhd_w,
                              self.nbhd_n, jnp.asarray(ids),
                              mcfg.n_layers, mcfg.T)
        return np.asarray(out)

    # ---------------------------------------------------------- persistence

    def save_model(self) -> None:
        save_pytree(self.state_path,
                    {"params": self.params, "opt_state": self.opt_state},
                    scalars={"epochs_done": self.e, "batches_done": self.b})

    def load_model(self) -> bool:
        if not os.path.isfile(self.state_path):
            return False
        tree, scalars = load_pytree(
            self.state_path,
            {"params": self.params, "opt_state": self.opt_state})
        self.params = tree["params"]
        self.opt_state = tree["opt_state"]
        self.e = int(scalars["epochs_done"])
        self.b = int(scalars["batches_done"])
        # a checkpoint written right at the end of the inner loop carries
        # b == batches_per_epoch with the epoch rollover not yet recorded
        if self.b >= self.cfg.train.batches_per_epoch:
            self.b = 0
            self.e += 1
        if self.verbose:
            print(f"resumed from {self.state_path} "
                  f"(epoch {self.e}, batch {self.b})")
        return True

    def save_embeddings(self, path: Optional[str] = None) -> str:
        """Embed all items and persist one [N, out_dim] array
        (replaces the reference's per-track .pt files,
        pinsage_training.py:297-327)."""
        path = path or os.path.join(self.run_dir, "emb.npy")
        np.save(path, self.embed())
        return path

    def save_embeddings_per_track(self, track_ids: list[str],
                                  emb_dir: Optional[str] = None,
                                  fmt: str = "npy") -> str:
        """Reference-layout export: one vector file per track id under
        `<run>/emb/` (pinsage_training.py:297-327), skipping existing
        files.  fmt='npy' (native) or 'pt' (torch interop, readable by
        the reference's loaders)."""
        emb_dir = emb_dir or os.path.join(self.run_dir, "emb")
        os.makedirs(emb_dir, exist_ok=True)
        emb = self.embed()
        for i, tid in enumerate(track_ids):
            out = os.path.join(emb_dir, f"{tid}.{fmt}")
            if os.path.isfile(out):
                continue
            if fmt == "pt":
                import torch  # interop only

                torch.save(torch.from_numpy(np.array(emb[i])), out)
            else:
                np.save(out, emb[i])
        return emb_dir

    def _log_metrics(self, metrics: np.ndarray, done_before: int) -> None:
        bpe = self.cfg.train.batches_per_epoch
        with open(self._metrics_path, "a") as f:
            for i, row in enumerate(metrics):
                f.write(json.dumps({
                    "Train Loss": float(row[0]),
                    "Node Features Loss": float(row[1]),
                    "Batch Variance": float(row[2]),
                    "Learning Rate": float(row[3]),
                    "Gradient Norm": float(row[4]),
                    "epoch": (done_before + i) // bpe,
                }) + "\n")
