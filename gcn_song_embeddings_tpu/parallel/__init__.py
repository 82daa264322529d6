from gcn_song_embeddings_tpu.parallel.mesh import make_mesh  # noqa: F401
from gcn_song_embeddings_tpu.parallel.serve_sharded import (  # noqa: F401
    ShardedServeIndex,
    ShardedServingFrontend,
)
from gcn_song_embeddings_tpu.parallel.train_step import (  # noqa: F401
    ShardedTrainer,
)
