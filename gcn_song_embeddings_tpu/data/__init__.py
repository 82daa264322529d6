from gcn_song_embeddings_tpu.data.graph import SongGraph  # noqa: F401
from gcn_song_embeddings_tpu.data.synth import (  # noqa: F401
    make_hard_dataset,
    make_synthetic_dataset,
)
