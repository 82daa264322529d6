from gcn_song_embeddings_tpu.ops.walks import (  # noqa: F401
    random_walks,
    random_walks_fused,
)
from gcn_song_embeddings_tpu.ops.ppr import (  # noqa: F401
    affected_origins,
    precompute_neighborhoods,
    refresh_neighborhoods,
    sample_neighborhood_topt,
    visit_counts_topt,
)
