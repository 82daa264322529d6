from gcn_song_embeddings_tpu.models.pinsage import (  # noqa: F401
    PinSageParams,
    init_pinsage,
    pinsage_forward,
)
