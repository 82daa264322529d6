from gcn_song_embeddings_tpu.utils.checkpoint import (  # noqa: F401
    save_pytree,
    load_pytree,
)
