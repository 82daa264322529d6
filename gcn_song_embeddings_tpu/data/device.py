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


def augment_with_colisten(graph: DeviceGraph, pairs: np.ndarray,
                          copies: int = 1) -> DeviceGraph:
    """Materialize co-listen pairs as 2-member pseudo-collections.

    The TrackTrackCF baselines factorize the train-positive co-occurrence
    matrix directly (reference baselines.py:458-487, to_track_track_matrix
    :415-426) while PinSage's walks see only playlist edges — a signal
    asymmetry.  This closes it WITHOUT touching the kernels: each train
    positive (a, b) becomes one new collection {a, b} appended after the
    real ones, so the strict item->collection->item two-step walk
    (SURVEY §7 bipartiteness) now crosses co-listen links too, and the
    conv aggregates over whatever the PPR top-T selects.  Duplicate pairs
    (and `copies` > 1) add edge multiplicity, which the uniform
    neighbor-choice walker converts into proportional transition mass.
    Self-pairs are dropped (a walk a->{a,a}->a is a no-op).
    """
    assert copies >= 1
    i2c_indptr = np.asarray(graph.i2c_indptr, dtype=np.int64)
    i2c_indices = np.asarray(graph.i2c_indices, dtype=np.int64)
    c2i_indptr = np.asarray(graph.c2i_indptr, dtype=np.int64)
    c2i_indices = np.asarray(graph.c2i_indices, dtype=np.int32)

    pairs = np.asarray(pairs, dtype=np.int64)[:, :2]
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    if copies > 1:
        pairs = np.repeat(pairs, copies, axis=0)
    m = pairs.shape[0]
    n_items, n_cols = graph.n_items, graph.n_cols

    # collection side: one fresh 2-member row per pair (appended, so real
    # collection ids are unchanged)
    new_c2i_indptr = np.concatenate([
        c2i_indptr,
        c2i_indptr[-1] + 2 * np.arange(1, m + 1, dtype=np.int64)])
    new_c2i_indices = np.concatenate([c2i_indices,
                                      pairs.reshape(-1).astype(np.int32)])

    # item side: rebuild the CSR with the pair edges merged in
    # (pairs.reshape(-1) pairs with repeat(cols, 2): a_j, b_j -> col_j)
    from gcn_song_embeddings_tpu.data.graph import _build_csr

    old_src = np.repeat(np.arange(n_items, dtype=np.int64),
                        np.diff(i2c_indptr))
    new_cols = n_cols + np.arange(m, dtype=np.int64)
    src = np.concatenate([old_src, pairs.reshape(-1)])
    dst = np.concatenate([i2c_indices, np.repeat(new_cols, 2)])
    i2c = _build_csr(src, dst, n_items)
    return DeviceGraph.from_arrays(i2c.indptr, i2c.indices,
                                   new_c2i_indptr.astype(np.int32),
                                   new_c2i_indices)


def apply_colisten_config(graph: DeviceGraph, positives: np.ndarray,
                          walk_cfg, nbhds_path: str | None
                          ) -> tuple[DeviceGraph, str | None]:
    """Honor `walk.colisten_copies` in ONE place: returns the (possibly
    augmented) graph and the (possibly '.colistenN'-suffixed) nbhds cache
    path.  Both trainer entry points (PinSageTrainer.__init__ and the
    CLI's ShardedTrainer branch) call this, so the augmentation and the
    cache-naming scheme cannot diverge — the n_edges cache meta is the
    backstop, not the mechanism."""
    import os

    if walk_cfg.colisten_copies <= 0:
        return graph, nbhds_path
    graph = augment_with_colisten(graph, positives,
                                  walk_cfg.colisten_copies)
    if nbhds_path is not None:
        from gcn_song_embeddings_tpu.config import WalkConfig

        root, ext = os.path.splitext(nbhds_path)
        # encode walk params that vary between arms sharing a dataset in
        # the filename (advisor round 4: alternating-T A/B arms otherwise
        # thrash one cache file — the meta check forces the recompute but
        # each arm overwrites the other's artifact).  Default-param runs
        # keep the short stable name.
        d = WalkConfig()
        extra = ""
        if (walk_cfg.t_precompute, walk_cfg.n_hops) != (d.t_precompute,
                                                        d.n_hops):
            extra += f".T{walk_cfg.t_precompute}.h{walk_cfg.n_hops}"
        if walk_cfg.alpha != d.alpha:
            extra += f".a{walk_cfg.alpha:g}"
        if walk_cfg.parallel_chains != d.parallel_chains:
            extra += f".c{walk_cfg.parallel_chains}"
        nbhds_path = (f"{root}.colisten{walk_cfg.colisten_copies}"
                      f"{extra}{ext}")
    return graph, nbhds_path
