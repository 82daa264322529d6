from gcn_song_embeddings_tpu.ops.walks import (  # noqa: F401
    random_walks,
    random_walks_fused,
)
from gcn_song_embeddings_tpu.ops.ppr import (  # noqa: F401
    visit_counts_topt,
    sample_neighborhood_topt,
    precompute_neighborhoods,
)
