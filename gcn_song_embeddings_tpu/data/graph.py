"""Graph data layer: JSON dataset -> HBM-resident CSR arrays.

Replaces the reference's DGL-based `SpotifyGraph` (spotify_graph.py:15-125)
with a TPU-native representation: the bipartite song-playlist graph is stored
as two int32 CSR adjacency structures

    item -> collections   (``i2c_indptr``/``i2c_indices``, local item ids)
    collection -> items   (``c2i_indptr``/``c2i_indices``, local collection ids)

which is exactly what the 2-step random walk (item -> collection -> item,
reference pinsage_model.py:41-46) consumes on device.  Node-id semantics match
the reference: integer ids are positions in ``list(tracks) ++ list(collections)``
with tracks occupying ``[0, n_items)`` (spotify_graph.py:43-58), so artifacts
are index-compatible.

Dataset file formats (reference SURVEY §7 / get_data.py:472-529):
  * ``tracks.json``:      {track_id: {name, artist, ...}}
  * ``collections.json``: {col_id: {type, name, ...}}
  * ``graph.json``:       {tracks: [...], collections: [...],
                           edges: [{from, to}, ...]} (both directions present)
  * ``positives*.json``:  [{a: track_id, b: track_id}, ...]
  * features: either a single ``features.npy`` (N x d, row order =
    ``list(tracks)``) written by this framework, per-id ``<id>.npy`` files, or
    the reference's per-id ``<id>.pt`` torch files (interop).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from gcn_song_embeddings_tpu.native import jsongraph as _native_json


@dataclass
class CSR:
    """A compressed-sparse-row adjacency: ``indices[indptr[v]:indptr[v+1]]``."""

    indptr: np.ndarray   # int32 [n + 1]
    indices: np.ndarray  # int32 [nnz]

    @property
    def n(self) -> int:
        return int(self.indptr.shape[0] - 1)

    @property
    def nnz(self) -> int:
        return int(self.indices.shape[0])

    def degrees(self) -> np.ndarray:
        return (self.indptr[1:] - self.indptr[:-1]).astype(np.int32)


def _build_csr(src: np.ndarray, dst: np.ndarray, n_src: int) -> CSR:
    """Deterministic CSR from an edge list.

    Neighbor lists are sorted by (src, dst) so double instantiation is
    bit-identical — an explicit expectation of the reference
    (pinsage_training.py:398-413).
    """
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=n_src).astype(np.int64)
    indptr = np.zeros(n_src + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return CSR(indptr=indptr.astype(np.int32), indices=dst.astype(np.int32))


class SongGraph:
    """Bipartite song-playlist graph + per-track features + positive pairs.

    The public surface mirrors what reference code does with ``SpotifyGraph``:
    construction from a dataset dir, feature loading with per-dim
    z-normalization (spotify_graph.py:66-79), positives loading and the
    70/30 seeded split (spotify_graph.py:88-110), and basic stats
    (spotify_graph.py:174-194).
    """

    def __init__(self, base_dir: str, features_dir: Optional[str] = None,
                 features_file: Optional[str] = None):
        self.base_dir = base_dir
        self.nbhds_path = os.path.join(base_dir, "neighborhoods.npz")

        with open(os.path.join(base_dir, "tracks.json"), encoding="utf-8") as f:
            self.tracks: dict = json.load(f)
        with open(os.path.join(base_dir, "collections.json"), encoding="utf-8") as f:
            self.collections: dict = json.load(f)

        self.track_ids: list[str] = list(self.tracks)
        self.col_ids: list[str] = list(self.collections)
        self.n_items = len(self.track_ids)
        self.n_cols = len(self.col_ids)
        self.n_nodes = self.n_items + self.n_cols
        self.index_map = {nid: i for i, nid in
                          enumerate(self.track_ids + self.col_ids)}

        graph_path = os.path.join(base_dir, "graph.json")
        edges = _native_json.load_edges(graph_path, self.index_map)
        self._edges_from, self._edges_to = edges

        self.i2c, self.c2i = self._build_bipartite_csr()

        self.features: Optional[np.ndarray] = None
        if features_file is not None and os.path.isfile(features_file):
            self.features = z_normalize(np.load(features_file).astype(np.float32))
        elif features_dir is not None and os.path.isdir(features_dir):
            self.features = z_normalize(
                load_feature_dir(features_dir, self.track_ids))

    # ------------------------------------------------------------------ graph

    def _build_bipartite_csr(self) -> tuple[CSR, CSR]:
        src, dst = self._edges_from, self._edges_to
        n_items = self.n_items
        # item -> collection edges (local collection ids)
        sel = src < n_items
        if not np.all(dst[sel] >= n_items):
            raise ValueError("graph is not bipartite: item->item edge found")
        i2c = _build_csr(src[sel], dst[sel] - n_items, n_items)
        # collection -> item edges
        selc = src >= n_items
        if not np.all(dst[selc] < n_items):
            raise ValueError("graph is not bipartite: col->col edge found")
        c2i = _build_csr(src[selc] - n_items, dst[selc], self.n_cols)
        return i2c, c2i

    def in_degrees(self, nodes: Optional[np.ndarray] = None) -> np.ndarray:
        """In-degree per node (== out-degree: both edge directions are
        materialized in graph.json, get_data.py:211-214)."""
        deg = np.concatenate([self.i2c.degrees(), self.c2i.degrees()])
        if nodes is None:
            return deg
        return deg[np.asarray(nodes)]

    # -------------------------------------------------------------- positives

    def load_positives(self, pos_path: str) -> np.ndarray:
        """[(a, b)] as an int32 [n, 2] array of track indices
        (spotify_graph.py:88-100)."""
        with open(pos_path, encoding="utf-8") as f:
            positives = json.load(f)
        track_map = {nid: i for i, nid in enumerate(self.track_ids)}
        out = np.empty((len(positives), 2), dtype=np.int32)
        for i, pair in enumerate(positives):
            out[i, 0] = track_map[pair["a"]]
            out[i, 1] = track_map[pair["b"]]
        return out

    def load_positives_split(self, pos_path: str, split: float = 0.7,
                             shuffle: bool = True, random_seed: int = 42
                             ) -> tuple[np.ndarray, np.ndarray]:
        """70/30 split shuffled with a fixed seed (spotify_graph.py:102-110)."""
        pos = self.load_positives(pos_path)
        n = pos.shape[0]
        if shuffle:
            index = np.random.RandomState(random_seed).permutation(n)
            pos = pos[index, :]
        cut = int(split * n)
        return pos[:cut], pos[cut:]

    # ------------------------------------------------------------------ info

    def song_info(self, index_id: int) -> str:
        info = self.tracks[self.track_ids[index_id]]
        return f"{info['name']} - {info['artist']}"

    def stats(self, positives: Optional[np.ndarray] = None) -> dict:
        """Dataset stats matching `print_dataset_stats` semantics
        (spotify_graph.py:174-194)."""
        deg = self.i2c.degrees()
        out = {
            "n_nodes": self.n_nodes,
            "n_songs": self.n_items,
            "n_playlists": self.n_cols,
            "mean_song_degree": float(deg.mean()) if self.n_items else 0.0,
            "median_song_degree": float(np.median(deg)) if self.n_items else 0.0,
        }
        if positives is not None:
            co = co_occurrence_counts(self.n_items, positives)
            uniq = np.unique(positives)
            out.update({
                "n_positives": int(positives.shape[0]),
                "unique_songs_in_positives": int(uniq.shape[0]),
                "mean_co_occurrence": float(co.mean()),
                "median_co_occurrence": float(np.median(co)),
            })
        return out


# ---------------------------------------------------------------------- utils


def z_normalize(features: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """Per-dim z-norm with unbiased std + eps (spotify_graph.py:77-79)."""
    mean = features.mean(axis=0)
    std = features.std(axis=0, ddof=1) + eps
    return ((features - mean) / std).astype(np.float32)


def load_feature_dir(features_dir: str, track_ids: Sequence[str]) -> np.ndarray:
    """Stack per-id feature vectors (``.npy`` preferred, ``.pt`` interop).

    Rides the native threaded reader (native/featload.cc) when built — the
    reference's equivalent is a serial per-file torch.load loop
    (spotify_graph.py:66-79)."""
    from gcn_song_embeddings_tpu.native import featload

    if featload.native_available():
        return featload.load_feature_rows(features_dir, track_ids)
    rows = []
    for tid in track_ids:
        npy = os.path.join(features_dir, tid + ".npy")
        if os.path.isfile(npy):
            # flatten like the native reader: [1, d] row matrices are a
            # valid reference layout (native/featload.cc)
            rows.append(np.load(npy).reshape(-1))
            continue
        pt = os.path.join(features_dir, tid + ".pt")
        if os.path.isfile(pt):
            import torch  # interop only; never used in the compute path

            rows.append(torch.load(pt, weights_only=True)
                        .numpy().reshape(-1))
            continue
        raise FileNotFoundError(f"no feature file for track {tid!r} "
                                f"in {features_dir}")
    return np.stack(rows, axis=0).astype(np.float32)


def co_occurrence_counts(n_items: int, positives: np.ndarray) -> np.ndarray:
    """Row sums of the track-track co-occurrence matrix
    (spotify_graph.py:131-142, 164-167): counts of (a, b) pairs per `a`."""
    return np.bincount(positives[:, 0], minlength=n_items).astype(np.int64)


def track_track_matrix(n_items: int, positives: np.ndarray):
    """Sparse track-track co-occurrence CSR (baselines.py:415-426):
    mat[a, b] = number of (a, b) positive pairs."""
    from scipy.sparse import coo_matrix

    data = np.ones(positives.shape[0], dtype=np.int32)
    mat = coo_matrix((data, (positives[:, 0], positives[:, 1])),
                     shape=(n_items, n_items))
    return mat.tocsr()


def col_track_matrix(graph: "SongGraph"):
    """Sparse collection x track membership CSR (baselines.py:402-413)."""
    from scipy.sparse import csr_matrix

    c2i = graph.c2i
    data = np.ones(c2i.nnz, dtype=np.int32)
    return csr_matrix((data, c2i.indices, c2i.indptr),
                      shape=(graph.n_cols, graph.n_items))
