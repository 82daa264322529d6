"""Multi-chip sharded training: dp x graph mesh under `shard_map`.

Parallelization plan (SURVEY §2.2; the reference is single-process with no
distributed layer at all):

  * ``dp`` axis: the triple batch is split across devices.
  * ``graph`` axis: node tables (features, PPR neighborhoods) are
    row-sharded; conv-layer frontier lookups become collective gathers
    (all_gather ids + psum_scatter rows — parallel/gather.py) riding ICI.
  * Parameters (~0.6M for the reference config) and Adam state are
    replicated; gradients are all-reduced (`psum`) over both axes.
  * Batches are ALSO split across ``graph`` (each device computes
    B/(dp*g) triples), so graph sharding adds compute parallelism, not
    just memory capacity.

The whole chunk of batches — device-side sampling, collective-gather
forward, loss, psum(grad), Adam — is one `lax.scan` inside one
`shard_map`-wrapped jit, so XLA can overlap the gather collectives of one
conv layer with the local matmuls of the previous one.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcn_song_embeddings_tpu.config import RunConfig
from gcn_song_embeddings_tpu.models.pinsage import (
    conv_apply,
    forward_with_gather,
    fullgraph_wins,
    head_apply,
    init_pinsage,
    pack_nbhds_np,
    unpack_nbhd_rows,
)
from gcn_song_embeddings_tpu.parallel.gather import (
    sharded_table_gather,
    sharded_table_gather_ring,
)
from gcn_song_embeddings_tpu.parallel.mesh import pad_to_multiple
from gcn_song_embeddings_tpu.train.loss import max_margin_loss
from gcn_song_embeddings_tpu.train.sampler import (
    sample_easy_negatives,
    sample_positive_rows,
)
from gcn_song_embeddings_tpu.train.trainer import make_optimizer


def _check_hard_negative_extent(n_pad: int, width: int) -> None:
    """The hard-negative gather flattens the neighborhood table and indexes
    it as node*width + rank in int32 (device_step); past 2^31 entries that
    index silently wraps and the negatives become garbage rows — same
    int32-extent class of guard as walks_sharded._check_int32_extent."""
    if n_pad * width >= np.iinfo(np.int32).max:
        raise ValueError(
            f"hard-negative table extent {n_pad} x {width} = "
            f"{n_pad * width} overflows the int32 flattened index; shrink "
            f"t_precompute or disable hard_negatives at this catalog size")


class ShardedTrainer:
    """PinSage training over a (dp, graph) device mesh."""

    def __init__(self, mesh: Mesh, cfg: RunConfig, n_items: int,
                 features: np.ndarray, nbhds: tuple[np.ndarray, np.ndarray],
                 positives: np.ndarray, gather_impl: str = "psum_scatter"):
        if gather_impl not in ("psum_scatter", "ring"):
            raise ValueError(
                f"gather_impl must be 'psum_scatter' or 'ring', "
                f"got {gather_impl!r}")
        self.gather_impl = gather_impl
        self.mesh = mesh
        self.cfg = cfg
        self.n_items = n_items
        g = mesh.shape["graph"]
        d = mesh.shape["dp"]
        self.n_shards = g
        if cfg.train.batch_size % (g * d):
            raise ValueError(
                f"batch_size {cfg.train.batch_size} must divide over "
                f"{d}x{g} devices")
        if cfg.train.hard_negatives and cfg.train.hn_max > nbhds[1].shape[1]:
            # same guard as the single-chip trainer: out-of-range ranks
            # would otherwise be silently clamped by take_along_axis
            raise ValueError(
                f"hn_max={cfg.train.hn_max} exceeds the stored "
                f"neighborhood width {nbhds[1].shape[1]} "
                f"(precompute with t_precompute >= hn_max)")

        # Row-shard node tables over the graph axis (pad rows to g).
        n_pad = pad_to_multiple(n_items, g)
        if cfg.train.hard_negatives:
            _check_hard_negative_extent(n_pad, nbhds[1].shape[1])
        feat = np.zeros((n_pad, features.shape[1]), dtype=np.float32)
        feat[:n_items] = features
        nb_w = np.zeros((n_pad, nbhds[0].shape[1]), dtype=np.float32)
        nb_w[:n_items] = nbhds[0]
        nb_n = np.zeros((n_pad, nbhds[1].shape[1]), dtype=np.int32)
        nb_n[:n_items] = nbhds[1]
        # Packed top-T (weights|nodes) table (models.pinsage.pack_nbhds
        # layout): the forward's neighborhood lookup becomes ONE collective
        # gather with a 2T-int32 payload instead of two full-row-width
        # gathers riding ICI.
        packed = pack_nbhds_np(nb_w, nb_n, cfg.model.T)

        shard_rows = NamedSharding(mesh, P("graph", None))
        replicate = NamedSharding(mesh, P())
        self.features = jax.device_put(feat, shard_rows)
        # Hard negatives need single node ids at ranks up to hn_max > T:
        # keep the table FLATTENED to [n_pad*width, 1] so the collective
        # gather ships one int32 per negative instead of a full
        # width-`t_precompute` row (a ~width-fold ICI payload cut on the
        # hot step).  n_pad divides g, so n_pad*width does too and the
        # row-shard boundaries stay aligned.  When hard negatives are off
        # the table is never read — upload a [g, 1] dummy instead of
        # width*n_pad int32s of dead HBM.
        self.hn_width = nb_n.shape[1]
        nb_n_dev = (nb_n.reshape(-1, 1) if cfg.train.hard_negatives
                    else np.zeros((g, 1), dtype=np.int32))
        self.nbhd_n = jax.device_put(nb_n_dev, shard_rows)
        self.nbhd_packed = jax.device_put(packed, shard_rows)
        self.positives = jax.device_put(
            np.asarray(positives, dtype=np.int32), replicate)

        key = jax.random.PRNGKey(cfg.train.seed)
        params = init_pinsage(key, cfg.model.n_layers, features.shape[1],
                              cfg.model.hidden_dim, cfg.model.out_dim,
                              cfg.model.bias_init)
        self.tx = make_optimizer(cfg)
        self.params = jax.device_put(params, replicate)
        self.opt_state = jax.device_put(self.tx.init(params), replicate)
        self.epoch = 0          # derived: batches_done // batches_per_epoch
        self.batches_done = 0   # exact progress (chunks may end mid-epoch)
        self._step_fn = self._build_step()
        self._embed_fn = self._build_embed()

    # ------------------------------------------------------------ builders

    def _gather_fn(self):
        """The collective row-gather schedule selected by `gather_impl`
        (single source of truth for every sharded table lookup)."""
        return (sharded_table_gather_ring if self.gather_impl == "ring"
                else sharded_table_gather)

    def _gathers(self):
        T = self.cfg.model.T
        gather = self._gather_fn()

        def gather_features(ids, feats):
            return gather(feats, ids, "graph")

        def gather_nbhds(ids, packed):
            rows = gather(packed, ids, "graph")
            return unpack_nbhd_rows(rows, T)

        return gather_features, gather_nbhds

    def _build_step(self):
        cfg, mesh = self.cfg, self.mesh
        tcfg, mcfg = cfg.train, cfg.model
        n_items = self.n_items
        n_dev = mesh.shape["dp"] * mesh.shape["graph"]
        b_local = tcfg.batch_size // n_dev
        tx = self.tx
        hn_width = self.hn_width
        gather_features, gather_nbhds = self._gathers()
        gather_rows = self._gather_fn()
        # per-device cost model (models/pinsage.fullgraph_wins): each
        # graph-shard sweeps n_pad/g catalog rows, each device's frontier
        # expands 3*b_local triple rows
        rows_local = self.features.shape[0] // mesh.shape["graph"]
        use_fullgraph = (tcfg.fullgraph_forward == "on"
                         or (tcfg.fullgraph_forward == "auto"
                             and fullgraph_wins(3 * b_local, rows_local,
                                                mcfg.n_layers, mcfg.T)))

        def device_step(carry, key, feats, packed, nb_n, positives):
            params, opt_state = carry
            dev = (lax.axis_index("dp") * lax.axis_size("graph")
                   + lax.axis_index("graph"))
            kshared, kdev = jax.random.split(key)
            kdev = jax.random.fold_in(kdev, dev)
            kp, kn, kr = jax.random.split(kdev, 3)

            # --- local triple sampling: the single-chip sampler functions
            # are reused so single- and multi-chip runs share semantics
            # (exact_batch_sampling, easy-negative batch-collision
            # rejection); only the hard-negative gather differs because
            # the neighborhood table is row-sharded here.
            if tcfg.exact_batch_sampling:
                # without-replacement must hold for the GLOBAL batch:
                # every device derives the SAME full permutation from the
                # shared (un-folded) key and slices its disjoint block —
                # per-device permutations would collide across devices.
                pos_all = sample_positive_rows(
                    kshared, positives, tcfg.batch_size, exact=True)
                pos_batch = lax.dynamic_slice_in_dim(
                    pos_all, dev * b_local, b_local)
            else:
                pos_batch = sample_positive_rows(
                    kp, positives, b_local, exact=False)
            if tcfg.hard_negatives:
                ranks = jax.random.randint(kr, (b_local,), tcfg.hn_min,
                                           tcfg.hn_max)
                # flattened [n_pad*width, 1] table: gather ONE int32 per
                # negative (node*width + rank) instead of a full row
                flat_idx = pos_batch[:, 0] * hn_width + ranks
                neg = gather_rows(nb_n, flat_idx, "graph")[:, 0].astype(
                    jnp.int32)
                if tcfg.hn_start_epoch > 0:
                    # hn curriculum (train.hn_start_epoch): easy warmup,
                    # hard band from that epoch on — gated on the global
                    # step so chunks cross the boundary without recompile
                    # (same semantics as the single-chip sampler's
                    # hn_gate).
                    easy = sample_easy_negatives(kn, pos_batch, n_items)
                    gate = (opt_state[0].count
                            >= tcfg.hn_start_epoch * tcfg.batches_per_epoch)
                    neg = jnp.where(gate, neg, easy)
            else:
                neg = sample_easy_negatives(kn, pos_batch, n_items)
            batch = jnp.concatenate([pos_batch, neg[:, None]], axis=1)

            def loss_fn(p):
                nodes = jnp.concatenate(
                    [batch[:, 0], batch[:, 1], batch[:, 2]])
                if use_fullgraph:
                    # full-catalog sweep, row-sharded: each graph-shard
                    # convolves ITS rows per layer, fetching neighbor
                    # activations with the same collective row-gather the
                    # frontier path uses (halo exchange); the batch then
                    # indexes the final sharded activations.  Collective
                    # volume is N*T rows/layer across the graph axis,
                    # independent of B (see train.fullgraph_forward).
                    local_w, local_n = unpack_nbhd_rows(packed, mcfg.T)
                    h = feats
                    for l in range(mcfg.n_layers):
                        h_nb = gather_rows(
                            h, local_n.reshape(-1), "graph").reshape(
                                local_n.shape[0], mcfg.T, h.shape[1])
                        h = conv_apply(p.layers[l], h, h_nb, local_w)
                    emb = head_apply(p, gather_rows(h, nodes, "graph"))
                else:
                    emb = forward_with_gather(
                        p, lambda ids: gather_features(ids, feats),
                        lambda ids: gather_nbhds(ids, packed),
                        nodes, mcfg.n_layers, mcfg.T)
                h_q, h_pos, h_neg = jnp.split(emb, 3, axis=0)
                # local mean scaled so the psum'd gradient equals the
                # global-batch gradient
                return max_margin_loss(h_q, h_pos, h_neg,
                                       tcfg.margin) / n_dev

            loss, grads = jax.value_and_grad(loss_fn)(params)
            loss = lax.psum(loss, ("dp", "graph"))
            grads = lax.psum(grads, ("dp", "graph"))
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), P(), P("graph", None), P("graph", None),
                           P("graph", None), P(), P()),
                 out_specs=(P(), P(), P()),
                 check_vma=False)
        def chunk_step(params, opt_state, feats, packed, nb_n, positives,
                       chunk_keys):
            def body(carry, key):
                return device_step(carry, key, feats, packed, nb_n,
                                   positives)

            (params, opt_state), losses = lax.scan(
                body, (params, opt_state), chunk_keys)
            return params, opt_state, losses

        return jax.jit(chunk_step)

    def _build_embed(self):
        cfg, mesh = self.cfg, self.mesh
        mcfg = cfg.model
        gather_features, gather_nbhds = self._gathers()

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), P("graph", None), P("graph", None),
                           P(("dp", "graph"))),
                 out_specs=P(("dp", "graph"), None),
                 check_vma=False)
        def embed_block(params, feats, packed, ids):
            return forward_with_gather(
                params, lambda i: gather_features(i, feats),
                lambda i: gather_nbhds(i, packed),
                ids, mcfg.n_layers, mcfg.T)

        return jax.jit(embed_block)

    # ----------------------------------------------------------------- api

    def train_chunk(self, n_batches: int,
                    chunk_index: int | None = None) -> np.ndarray:
        """Run `n_batches` sharded train steps; returns per-batch losses.

        `chunk_index` (the RNG key fold) defaults to the GLOBAL batch
        index at chunk start — `batches_done` is advanced here and
        persisted in checkpoints, so repeated calls draw fresh batches
        AND a resumed run continues the continuous run's key sequence
        instead of replaying batches it already consumed (same scheme as
        PinSageTrainer.train)."""
        if chunk_index is None:
            chunk_index = self.batches_done
        base = jax.random.PRNGKey(self.cfg.train.seed + 1)
        key = jax.random.fold_in(base, chunk_index)
        keys = jax.random.split(key, n_batches)
        self.params, self.opt_state, losses = self._step_fn(
            self.params, self.opt_state, self.features, self.nbhd_packed,
            self.nbhd_n, self.positives, keys)
        self.batches_done += n_batches
        self.epoch = self.batches_done // self.cfg.train.batches_per_epoch
        return np.asarray(losses)

    def train_epochs(self, epochs: Optional[int] = None,
                     verbose: bool = False,
                     save_path: str | None = None) -> None:
        """Multi-epoch dispatch fusion, mirroring PinSageTrainer.train:
        chunks of `checkpoint_every_batches` batches span epoch boundaries
        (the LR schedule is step-indexed), so the wall is ~total/chunk
        dispatches instead of one per epoch.  `save_path` checkpoints
        after every chunk (the knob's documented fault-tolerance cadence;
        without it the caller owns persistence)."""
        tcfg = self.cfg.train
        epochs = epochs if epochs is not None else tcfg.epochs
        bpe = tcfg.batches_per_epoch
        total = epochs * bpe
        chunk = min(tcfg.checkpoint_every_batches, total)
        import time

        while self.batches_done < total:
            t0 = time.time()
            n = min(chunk, total - self.batches_done)
            losses = self.train_chunk(n)
            if save_path is not None:
                self.save(save_path)
            if verbose:
                print(f"epoch {self.epoch}/{epochs}: "
                      f"loss={losses[-1]:.6f} ({time.time() - t0:.2f}s)")

    def save(self, path: str) -> None:
        """Checkpoint params + optimizer state + epoch (atomic npz,
        utils/checkpoint.py)."""
        from gcn_song_embeddings_tpu.utils.checkpoint import save_pytree

        save_pytree(path, {"params": jax.device_get(self.params),
                           "opt_state": jax.device_get(self.opt_state)},
                    scalars={"epoch": self.epoch,
                             "batches_done": self.batches_done})

    def load(self, path: str) -> bool:
        from gcn_song_embeddings_tpu.utils.checkpoint import load_pytree
        import os

        if not os.path.isfile(path):
            return False
        replicate = NamedSharding(self.mesh, P())
        tree, scalars = load_pytree(
            path, {"params": jax.device_get(self.params),
                   "opt_state": jax.device_get(self.opt_state)})
        self.params = jax.device_put(tree["params"], replicate)
        self.opt_state = jax.device_put(tree["opt_state"], replicate)
        self.epoch = int(scalars["epoch"])
        # legacy checkpoints carry only whole epochs; exact progress when
        # present (chunks may end mid-epoch since the fused train_epochs)
        self.batches_done = int(scalars.get(
            "batches_done",
            self.epoch * self.cfg.train.batches_per_epoch))
        return True

    def embed(self, batch_size: int = 4096) -> np.ndarray:
        """Sharded all-catalog embedding sweep -> [n_items, out_dim].

        The block output is row-sharded over every device; on a multi-host
        mesh that spans non-addressable devices, so it is gathered to every
        process (`process_allgather`) before the host copy."""
        n_dev = self.mesh.shape["dp"] * self.mesh.shape["graph"]
        bs = pad_to_multiple(batch_size, n_dev)
        multiproc = jax.process_count() > 1
        outs = []
        for start in range(0, self.n_items, bs):
            ids = (np.arange(start, start + bs, dtype=np.int32)
                   % self.n_items)
            out = self._embed_fn(self.params, self.features,
                                 self.nbhd_packed, jnp.asarray(ids))
            if multiproc:
                from jax.experimental import multihost_utils

                out = multihost_utils.process_allgather(out, tiled=True)
            outs.append(np.asarray(out)[: min(bs, self.n_items - start)])
        return np.concatenate(outs, axis=0)
