from gcn_song_embeddings_tpu.train.loss import (  # noqa: F401
    max_margin_loss,
    cosine_triplet_loss,
    batch_variance,
)
from gcn_song_embeddings_tpu.train.trainer import PinSageTrainer  # noqa: F401
