from gcn_song_embeddings_tpu.ops.walks import random_walks  # noqa: F401
from gcn_song_embeddings_tpu.ops.ppr import (  # noqa: F401
    visit_counts_topt,
    sample_neighborhood_topt,
    precompute_neighborhoods,
)
