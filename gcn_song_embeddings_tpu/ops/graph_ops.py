"""Host/device graph algebra: bipartite projection + link-prediction scores.

Replaces the reference's networkx dependency (baselines.py:153-192, 439-454):

  * `project_bipartite` — weighted track-track projection of the
    playlist-song graph (edge weight = number of shared playlists), the
    exact semantics of networkx `bipartite.weighted_projected_graph` used
    at baselines.py:451.  Computed as one SpGEMM (C^T C, diagonal dropped).
  * Link-prediction similarity scores (SimpleSimilarity family,
    baselines.py:153-192): preferential attachment, Adamic-Adar, Jaccard —
    each as a batched sparse matmul + degree algebra on device rather than
    per-pair networkx calls.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def project_bipartite(graph) -> sp.csr_matrix:
    """Weighted track-track projection: W[a, b] = #playlists containing both
    a and b (a != b).  `graph` is a SongGraph."""
    from gcn_song_embeddings_tpu.data.graph import col_track_matrix

    ct = col_track_matrix(graph).astype(np.float32)  # [C, N]
    w = (ct.T @ ct).tocsr()
    w.setdiag(0)
    w.eliminate_zeros()
    return w


def adjacency_tracks(graph, projected: bool = True) -> sp.csr_matrix:
    """Track-side adjacency: the weighted projection, or the raw bipartite
    adjacency restricted to track rows (reference `projected` flag,
    baselines.py:160-166)."""
    if projected:
        return project_bipartite(graph)
    from gcn_song_embeddings_tpu.data.graph import col_track_matrix

    ct = col_track_matrix(graph).astype(np.float32)
    # track x (all nodes) adjacency rows; score functions only need
    # neighbor sets, so track x collection suffices
    return ct.T.tocsr()


def preferential_scores(adj: sp.csr_matrix, queries: np.ndarray
                        ) -> np.ndarray:
    """Preferential attachment: deg(q) * deg(v) (nx.preferential_attachment
    semantics on the unweighted graph)."""
    deg = np.asarray((adj > 0).sum(axis=1)).ravel().astype(np.float32)
    return deg[queries][:, None] * deg[None, :]


def common_neighbor_matrix(adj: sp.csr_matrix, queries: np.ndarray,
                           weights: np.ndarray | None = None) -> np.ndarray:
    """[q, N] matrix of (optionally weighted) common-neighbor counts."""
    a = (adj > 0).astype(np.float32)
    rows = a[queries]
    if weights is not None:
        rows = rows.multiply(weights[None, :]).tocsr()
    return np.asarray((rows @ a.T).todense(), dtype=np.float32)


def adamic_adar_scores(adj: sp.csr_matrix, queries: np.ndarray) -> np.ndarray:
    """Adamic-Adar: sum over common neighbors z of 1/log(deg(z))
    (nx.adamic_adar_index semantics).

    Common neighbors z range over adj's COLUMNS (for the unprojected
    bipartite adjacency those are collections), so deg(z) is a column sum.
    """
    col_deg = np.asarray((adj > 0).sum(axis=0)).ravel().astype(np.float32)
    inv_log = np.zeros_like(col_deg)
    ok = col_deg > 1
    inv_log[ok] = 1.0 / np.log(col_deg[ok])
    return common_neighbor_matrix(adj, queries, weights=inv_log)


def jaccard_scores(adj: sp.csr_matrix, queries: np.ndarray) -> np.ndarray:
    """Jaccard index: |N(q) ∩ N(v)| / |N(q) ∪ N(v)|."""
    deg = np.asarray((adj > 0).sum(axis=1)).ravel().astype(np.float32)
    inter = common_neighbor_matrix(adj, queries)
    union = deg[queries][:, None] + deg[None, :] - inter
    return inter / np.maximum(union, 1e-10)
