"""Typed configuration for the framework.

The reference has no config system: hyperparameters are hard-coded attributes
of the trainer (reference pinsage_training.py:119-152) overridden by attribute
pokes / `exec` (reference dashboard.py:68, grid_search.py:26-27).  Here every
knob is an explicit dataclass field with the reference default, serializable
to/from JSON for runs and grid searches.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class WalkConfig:
    """Random-walk / PPR neighborhood sampling knobs.

    Matches reference semantics (pinsage_model.py:16-18, 32-53):
      * one "hop" = item -> collection -> item (two graph steps),
      * `alpha` is the probability of restarting to the origin AFTER each hop
        (the reference's inverted-PPR convention, pinsage_model.py:50-51),
      * visit probabilities are normalized counts with the self column zeroed
        (pinsage_model.py:96-99).
    """

    n_hops: int = 500            # walks per node (trace length)
    alpha: float = 0.85          # restart probability applied after every hop
    t_precompute: int = 100      # neighborhood size stored in the cache
    batch_walkers: int = 4096    # walker rows per device sweep batch
    parallel_chains: int = 1     # split each origin's hop budget across this
    #                              many lockstep chains (ops/walks.py) — a
    #                              tuning knob for topologies where the hop
    #                              loop is under-batched; measured neutral on
    #                              v5e (gather pipelining already saturates
    #                              at 4k walkers — RESULTS.md); must divide
    #                              n_hops; 1 = reference-exact chain
    sweep_blocks: int = 32       # walker batches scanned per device dispatch
    #                              in the all-node sweep (amortizes dispatch
    #                              latency; host copy-out is pipelined
    #                              against the next dispatch)
    fused_tables: bool = True    # extent-joined edge tables: 2 dependent
    #                              gathers per hop instead of 4 — measured
    #                              2.2x walk throughput (100M hops/s on
    #                              v5e) for ~2.5x edge-array HBM (bit-
    #                              identical chain; ops/walks.py)
    colisten_copies: int = 0     # materialize each TRAIN-positive pair as
    #                              this many 2-member pseudo-collections
    #                              before the PPR sweep (data/device.py
    #                              augment_with_colisten).  0 = off
    #                              (reference behavior: walks see only
    #                              playlist edges).  Gives PinSage the
    #                              same co-listen signal the TrackTrackCF
    #                              baselines factorize directly
    #                              (reference baselines.py:458-487);
    #                              copies > 1 upweight the co-listen
    #                              channel vs playlist edges in the
    #                              uniform walk.


@dataclass(frozen=True)
class PinSageConfig:
    """PinSage model shape (reference pinsage_training.py:127-137)."""

    n_layers: int = 2
    in_dim: int = 512            # node feature dim (OpenL3 -> 512)
    hidden_dim: int = 512        # neighbor aggregate dim (Q output)
    out_dim: int = 128           # conv output + final embedding dim
    T: int = 3                   # neighbors aggregated per node
    bias_init: float = 0.3      # reference fills all biases with 0.3


@dataclass(frozen=True)
class TrainConfig:
    """Trainer knobs (reference pinsage_training.py:119-152)."""

    lr: float = 1e-4
    decay: float = 0.95          # ExponentialLR gamma, stepped per epoch
    margin: float = 1e-5
    epochs: int = 30
    batch_size: int = 128
    batches_per_epoch: int = 500
    hard_negatives: bool = False
    hn_min: int = 10             # hard negative PPR rank range [hn_min, hn_max)
    hn_max: int = 100
    hn_start_epoch: int = 0      # curriculum: with hard_negatives=True,
    # epochs before this use easy negatives (warmup), epochs from it on
    # use the hard band.  0 = hard from the start (reference's static
    # behavior, pinsage_training.py:135-137).  Motivation: hn helps short
    # schedules and hurts long ones on the hard benchmark (RESULTS.md).
    exact_batch_sampling: bool = False
    # True reproduces the reference's randperm[:B] (distinct positive rows
    # per batch, pinsage_training.py:53-62) at the cost of an O(n_pos) sort
    # per batch; False samples rows i.i.d. — statistically equivalent for
    # B << n_pos and ~30% faster per train step.
    seed: int = 0
    checkpoint_every_batches: int = 2500  # chunk size: batches per device
    # dispatch AND checkpoint cadence.  The reference wrote EVERY batch
    # (pinsage_training.py:248-249) — capability kept, cadence fixed.
    # Chunks span epoch boundaries (the LR schedule is step-indexed), so
    # the default = 5 reference epochs per dispatch; lower it for
    # tighter fault-tolerance granularity.
    dtype: str = "float32"       # compute dtype for the conv stack
    fullgraph_forward: str = "auto"
    # "auto" switches the train-step forward to a full-catalog conv sweep
    # (models/pinsage.fullgraph_embeddings) when the triple batch's
    # expanded frontier would gather more feature rows than the whole
    # catalog sweep costs (large B / small N); "on"/"off" force it.
    # Applies to BOTH trainers: the sharded trainer's full-graph form
    # sweeps each graph-shard's rows with collective neighbor gathers
    # (parallel/train_step.py).


@dataclass(frozen=True)
class RunConfig:
    """One full training run = model + trainer + sampling config."""

    run_name: str = "pinsage_tpu"
    walk: WalkConfig = field(default_factory=WalkConfig)
    model: PinSageConfig = field(default_factory=PinSageConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "RunConfig":
        raw = json.loads(text)
        return RunConfig(
            run_name=raw.get("run_name", "pinsage_tpu"),
            walk=WalkConfig(**raw.get("walk", {})),
            model=PinSageConfig(**raw.get("model", {})),
            train=TrainConfig(**raw.get("train", {})),
        )

    def replace(self, **kwargs: Any) -> "RunConfig":
        return dataclasses.replace(self, **kwargs)

    @staticmethod
    def recommended(run_name: str = "pinsage_tpu") -> "RunConfig":
        """Tuned defaults — the measured round-4 grid winner.

        vs the reference defaults (margin=1e-5, lr=1e-4, no co-listen):

        * margin=0.1, lr=1e-3: same accuracy as the tiny reference
          margin (hit@100 0.202 vs 0.196 on the 100k benchmark) but the
          embedding is geometrically separated (~1e-1-scale cosine gaps
          instead of a near-collapsed 0.9999 mean pairwise cosine), so
          ranking survives bf16/int8 scoring and quantized serving is
          lossless (RESULTS.md "Matmul precision", results/
          serve_int8.json); lr=1e-3 converges in fewer epochs
          (results/grid_search1.json).
        * walk.colisten_copies=1 + model.T=10: materialize each train
          positive as one 2-member pseudo-collection before the PPR
          sweep and widen the aggregated neighborhood.  The 16-config
          grid was perfectly bimodal on this knob — every colisten=1
          config beat every colisten=0 config (results/
          grid_search_colisten_hard.json) — and it is what takes
          PinSage past every CF baseline on the identical split
          (hit@100 0.618 vs ALS 0.476, results/colisten_ab.jsonl),
          replicated at 1M scale (results/hybrid_1m.json).  Requires
          train positives at construction (the trainer handles it);
          set colisten_copies=0 for positives-free graphs.
        * easy negatives (hard_negatives=False): the hn curriculum
          helped only short schedules and hurt 30-epoch runs on the
          hard benchmark (RESULTS.md round-4 partial-negative result).

        See README "Which model should I run?" for the model-level
        decision table (PageRankCo / PinSage+co / Hybrid)."""
        return RunConfig(
            run_name=run_name,
            walk=WalkConfig(colisten_copies=1),
            model=PinSageConfig(T=10),
            train=TrainConfig(lr=1e-3, margin=0.1),
        )


def config_with_overrides(base: RunConfig, overrides: dict[str, Any]) -> RunConfig:
    """Apply dotted-path overrides like {"train.lr": 1e-3, "model.T": 5}.

    This replaces the reference's `exec`-based hyperparameter poking
    (grid_search.py:26-27, baselines.py:347-348) with a safe, typed scheme.
    """
    sections: dict[str, dict[str, Any]] = {}
    top: dict[str, Any] = {}
    for key, value in overrides.items():
        if "." in key:
            section, name = key.split(".", 1)
            sections.setdefault(section, {})[name] = value
        else:
            top[key] = value
    new = base
    for section, vals in sections.items():
        cur = getattr(new, section)
        new = new.replace(**{section: dataclasses.replace(cur, **vals)})
    if top:
        new = new.replace(**top)
    return new
