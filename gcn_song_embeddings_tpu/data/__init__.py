from gcn_song_embeddings_tpu.data.graph import SongGraph  # noqa: F401
from gcn_song_embeddings_tpu.data.synth import make_synthetic_dataset  # noqa: F401
