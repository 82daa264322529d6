"""gcn_song_embeddings_tpu — a TPU-native PinSAGE song-embedding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
MatejBevec/gcn-song-embeddings (reference mounted read-only at
/root/reference): random-walk personalized-PageRank neighbor sampling over a
bipartite song-playlist graph, importance-weighted PinSage convolutions,
max-margin triplet training, and a next-song-prediction evaluation harness
with CF / graph / content baselines.

Design principles (TPU-first, not a port):
  * The graph lives in HBM as int32 CSR arrays (item->collection and
    collection->item); all sampling is vectorized `lax.scan` + gathers,
    never interpreted Python loops (reference hot loop:
    pinsage_model.py:32-53).
  * All model compute has static shapes: the L-layer "nodeflow" is a
    dedup-free recursive frontier expansion of size B*(T+1)^l, so a
    single `jax.jit` traces the whole forward (reference:
    pinsage_model.py:142-168 uses dynamic `torch.unique`).
  * Training steps (sampling + 3-way forward + loss + Adam update) are
    fused into one compiled `lax.scan` per epoch.
  * Multi-chip scaling uses `jax.sharding.Mesh` + `shard_map` with XLA
    collectives (data-parallel triples, node-sharded feature tables with
    collective gathers) — see `gcn_song_embeddings_tpu.parallel`.
"""

__version__ = "0.1.0"

import os as _os

# Matmul precision policy (measured on v5e — RESULTS.md "Matmul precision"):
# on TPU, JAX's default runs f32 matmuls as ONE bf16 MXU pass.  Training and
# the model forward are insensitive to that rounding (hit@100 identical to
# f32-accurate passes), but similarity RANKING is not — embeddings trained at
# the reference's tiny margin (1e-5, pinsage_training.py:140) separate by
# ~1e-4 cosine, inside bf16 rounding error, and hit@100 collapses
# 0.995 -> 0.13.  The framework therefore pins precision=HIGHEST at the
# op level exactly where ranking/conditioning demands it (ops/knn.py,
# evals/device_eval.py, serve.py, the ALS normal equations in
# models/baselines/mf.py) and leaves the gather-bound train step at the fast
# default.  GCN_TPU_MATMUL_PRECISION=<default|high|highest> force-overrides
# the global default for everything else (diagnostic escape hatch).
_pref = _os.environ.get("GCN_TPU_MATMUL_PRECISION")
if _pref:
    import jax as _jax

    if _jax.config.jax_default_matmul_precision is None:
        _jax.config.update("jax_default_matmul_precision", _pref)
    del _jax
del _os, _pref

from gcn_song_embeddings_tpu.config import (  # noqa: F401
    PinSageConfig,
    TrainConfig,
    WalkConfig,
)
