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

from gcn_song_embeddings_tpu.config import (  # noqa: F401
    PinSageConfig,
    TrainConfig,
    WalkConfig,
)
