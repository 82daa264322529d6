from gcn_song_embeddings_tpu.parallel.mesh import make_mesh  # noqa: F401
from gcn_song_embeddings_tpu.parallel.train_step import (  # noqa: F401
    ShardedTrainer,
)

# serve_sharded pulls in the serving stack (ops.quantize -> pallas);
# training-side `parallel` imports shouldn't pay for or depend on it
_LAZY = ("ShardedServeIndex", "ShardedServingFrontend")


def __getattr__(name):
    if name in _LAZY:
        from gcn_song_embeddings_tpu.parallel import serve_sharded

        return getattr(serve_sharded, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
