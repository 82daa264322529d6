from gcn_song_embeddings_tpu.evals.metrics import (  # noqa: F401
    hit_rate,
    mrr,
    intra_diversity,
    inter_diversity,
    coverage,
    average_degree,
    low_degree_accuracy,
    low_co_accuracy,
)
