from gcn_song_embeddings_tpu.models.baselines.base import (  # noqa: F401
    PredictionModel,
    EmbeddingModel,
)
from gcn_song_embeddings_tpu.models.baselines.simple import (  # noqa: F401
    Random,
    EmbLoader,
    PersPageRank,
    JaccardFast,
    WalkEmbedHybrid,
)
from gcn_song_embeddings_tpu.models.baselines.mf import (  # noqa: F401
    TrackTrackCF,
    ColTrackCF,
)
from gcn_song_embeddings_tpu.models.baselines.pinsage_wrapper import (  # noqa: F401
    PinSageWrapper,
)
from gcn_song_embeddings_tpu.models.baselines.similarity import (  # noqa: F401
    JaccardIndex,
    AdamicAdar,
    Preferential,
)
from gcn_song_embeddings_tpu.models.baselines.node2vec import (  # noqa: F401
    FastNode2Vec,
)
from gcn_song_embeddings_tpu.models.baselines.graphsage import (  # noqa: F401
    GraphSAGE,
)
