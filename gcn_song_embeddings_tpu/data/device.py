"""Device-resident graph: the bipartite CSR arrays as a JAX pytree.

This is what the walk / aggregation kernels consume.  All arrays are int32
and live in HBM; every kernel indexes them with vectorized gathers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gcn_song_embeddings_tpu.data.graph import SongGraph


class DeviceGraph(NamedTuple):
    """Bipartite song-playlist graph in HBM.

    i2c_*: item -> collection adjacency (local collection ids)
    c2i_*: collection -> item adjacency (local item ids)
    """

    i2c_indptr: jnp.ndarray   # [n_items + 1] int32
    i2c_indices: jnp.ndarray  # [nnz] int32
    c2i_indptr: jnp.ndarray   # [n_cols + 1] int32
    c2i_indices: jnp.ndarray  # [nnz] int32

    @property
    def n_items(self) -> int:
        return self.i2c_indptr.shape[0] - 1

    @property
    def n_cols(self) -> int:
        return self.c2i_indptr.shape[0] - 1

    @property
    def n_edges(self) -> int:
        """Directed edge count (both directions), like the reference graph."""
        return self.i2c_indices.shape[0] + self.c2i_indices.shape[0]

    @staticmethod
    def from_graph(graph: SongGraph) -> "DeviceGraph":
        return DeviceGraph(
            i2c_indptr=jnp.asarray(graph.i2c.indptr, dtype=jnp.int32),
            i2c_indices=jnp.asarray(graph.i2c.indices, dtype=jnp.int32),
            c2i_indptr=jnp.asarray(graph.c2i.indptr, dtype=jnp.int32),
            c2i_indices=jnp.asarray(graph.c2i.indices, dtype=jnp.int32),
        )

    @staticmethod
    def from_arrays(i2c_indptr: np.ndarray, i2c_indices: np.ndarray,
                    c2i_indptr: np.ndarray, c2i_indices: np.ndarray
                    ) -> "DeviceGraph":
        return DeviceGraph(
            i2c_indptr=jnp.asarray(i2c_indptr, dtype=jnp.int32),
            i2c_indices=jnp.asarray(i2c_indices, dtype=jnp.int32),
            c2i_indptr=jnp.asarray(c2i_indptr, dtype=jnp.int32),
            c2i_indices=jnp.asarray(c2i_indices, dtype=jnp.int32),
        )
