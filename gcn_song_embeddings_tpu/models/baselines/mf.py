"""Implicit-feedback matrix factorization on TPU: ALS / BPR / LMF.

Replaces the reference's dependency on the `implicit` C++/OpenMP library
(baselines.py:458-514: TrackTrackCF / ColTrackCF with
implicit.cpu.{als,bpr,lmf}, factors=128).  The TPU-native re-design:

  * ALS (Hu-Koren-Volinsky implicit ALS, the algorithm implicit.als
    implements): each half-iteration solves one [F, F] normal-equation
    system PER ROW.  Rows are padded to a static max-nnz and the Gram
    corrections are batched einsums — [B, F, F] Cholesky solves ride the
    MXU, replacing implicit's per-thread conjugate-gradient loops.
  * BPR (Rendle et al.): scanned minibatch SGD with device-side triple
    sampling, matching implicit.bpr's update rule (sigmoid on the score
    difference, L2 regularization, user/pos/neg factor updates).
  * LMF (Johnson, logistic MF): scanned AdaGrad on the logistic likelihood
    with sampled negatives, matching implicit.lmf's loss family.

`similar_items` parity: implicit's ALS `similar_items` ranks by cosine
similarity of item factors; the wrappers therefore reuse the tiled
cosine-topk kernel and drop column 0 (baselines.py:482-487).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from gcn_song_embeddings_tpu.models.baselines.base import PredictionModel
from gcn_song_embeddings_tpu.ops.knn import knn_from_emb


# ----------------------------------------------------------------- ALS core


def _pad_rows(mat: sp.csr_matrix, max_nnz: int | None = None,
              cap_percentile: float = 99.5
              ) -> tuple[np.ndarray, np.ndarray]:
    """CSR rows -> (indices [R, M], values [R, M]) padded with zeros.

    M defaults to the `cap_percentile` of row nnz rather than the max: a
    single hub row would otherwise blow the padded block up quadratically
    (one 50k-nnz row in a 10^6-row matrix = a [10^6, 50k] pad).  Rows
    longer than M keep their HIGHEST-confidence entries.  The fill itself
    is vectorized (one fancy-index assignment), not a per-row Python loop.
    """
    nnz = np.diff(mat.indptr)
    rows = mat.shape[0]
    if max_nnz is not None:
        m = int(max_nnz)
    elif nnz.size == 0:
        m = 1
    else:
        m = int(max(min(int(nnz.max()),
                        int(np.percentile(nnz, cap_percentile))), 1))
    idx = np.zeros((rows, m), dtype=np.int32)
    val = np.zeros((rows, m), dtype=np.float32)
    take = np.minimum(nnz, m)

    # truncated (hub) rows keep their top-confidence entries — reorder
    # those few rows' slices in place before the vectorized fill
    indices = mat.indices
    data = mat.data
    over = np.nonzero(nnz > m)[0]
    if over.size:
        indices = indices.copy()
        data = data.copy()
        for r in over:
            s, e = mat.indptr[r], mat.indptr[r + 1]
            top = np.argpartition(-data[s:e], m - 1)[:m]
            indices[s:s + m] = indices[s:e][top]
            data[s:s + m] = data[s:e][top]

    row_ids = np.repeat(np.arange(rows), take)
    col_pos = (np.arange(take.sum(), dtype=np.int64)
               - np.repeat(np.cumsum(take) - take, take))
    src = np.repeat(mat.indptr[:-1], take) + col_pos
    idx[row_ids, col_pos] = indices[src]
    val[row_ids, col_pos] = data[src]
    return idx, val


@partial(jax.jit, static_argnames=())
def _als_solve_block(Y: jnp.ndarray, YtY: jnp.ndarray, idx: jnp.ndarray,
                     conf: jnp.ndarray, reg: float) -> jnp.ndarray:
    """Solve (YtY + Y_u^T (C_u - I) Y_u + reg I) x = Y_u^T C_u p_u for a
    block of rows.  idx/conf: [B, M] padded item ids / confidences
    (conf = 1 + alpha * r; padding has conf 0 which contributes c' = -1 on a
    duplicate of item 0 — avoided by masking)."""
    B, M = idx.shape
    F = Y.shape[1]
    Yu = Y[idx]                                   # [B, M, F]
    mask = (conf > 0).astype(jnp.float32)         # padding mask
    cprime = (conf - 1.0) * mask                  # (c - 1), 0 on padding
    # Normal equations need f32-accurate products: Cholesky amplifies
    # bf16 rounding of A (cond(A) grows with confidence alpha) — see the
    # precision note in ops/knn.py.
    A = YtY[None] + jnp.einsum("bmf,bmg,bm->bfg", Yu, Yu, cprime,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    A = A + reg * jnp.eye(F, dtype=jnp.float32)[None]
    b = jnp.einsum("bmf,bm->bf", Yu, conf * mask,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    cho = jax.scipy.linalg.cho_factor(A)
    return jax.scipy.linalg.cho_solve(cho, b)


def _als_half_step(X: np.ndarray, Y: np.ndarray, idx: np.ndarray,
                   conf: np.ndarray, reg: float, block: int = 2048
                   ) -> np.ndarray:
    """Update all X rows given fixed Y."""
    Yj = jnp.asarray(Y)
    YtY = jnp.dot(Yj.T, Yj, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out = np.empty_like(X)
    n = X.shape[0]
    for s in range(0, n, block):
        e = min(s + block, n)
        pad = block - (e - s)
        bi = np.pad(idx[s:e], ((0, pad), (0, 0)))
        bc = np.pad(conf[s:e], ((0, pad), (0, 0)))
        sol = _als_solve_block(Yj, YtY, jnp.asarray(bi), jnp.asarray(bc), reg)
        out[s:e] = np.asarray(sol)[: e - s]
    return out


class ALS:
    """Implicit-feedback ALS (implicit.cpu.als equivalent).

    Defaults follow implicit 0.6: factors=128 comes from the reference
    (baselines.py:461), regularization=0.01, iterations=15, alpha=1.
    """

    def __init__(self, factors: int = 128, regularization: float = 0.01,
                 iterations: int = 15, alpha: float = 1.0, seed: int = 0):
        self.factors = factors
        self.reg = regularization
        self.iterations = iterations
        self.alpha = alpha
        self.seed = seed

    def fit(self, mat: sp.csr_matrix) -> None:
        """mat: [users, items] implicit ratings."""
        users, items = mat.shape
        rng = np.random.default_rng(self.seed)
        # implicit's init: rand * 0.01
        X = (rng.random((users, self.factors)) * 0.01).astype(np.float32)
        Y = (rng.random((items, self.factors)) * 0.01).astype(np.float32)

        cu = mat.tocsr()
        ci = mat.T.tocsr()
        u_idx, u_val = _pad_rows(cu)
        i_idx, i_val = _pad_rows(ci)
        u_conf = np.where(u_val > 0, 1.0 + self.alpha * u_val, 0.0)
        i_conf = np.where(i_val > 0, 1.0 + self.alpha * i_val, 0.0)

        for _ in range(self.iterations):
            X = _als_half_step(X, Y, u_idx, u_conf, self.reg)
            Y = _als_half_step(Y, X, i_idx, i_conf, self.reg)
        self.user_factors, self.item_factors = X, Y


# ----------------------------------------------------------------- BPR core


class BPR:
    """Bayesian Personalized Ranking (implicit.cpu.bpr equivalent):
    SGD on -log sigmoid(x_u . (y_i - y_j)) with L2 regularization.
    Defaults follow implicit 0.6: lr=0.01, reg=0.01, 100 iterations,
    |R| samples per iteration."""

    def __init__(self, factors: int = 128, learning_rate: float = 0.01,
                 regularization: float = 0.01, iterations: int = 100,
                 seed: int = 0, batch: int = 4096):
        self.factors = factors
        self.lr = learning_rate
        self.reg = regularization
        self.iterations = iterations
        self.seed = seed
        self.batch = batch

    def fit(self, mat: sp.csr_matrix) -> None:
        users, items = mat.shape
        coo = mat.tocoo()
        pos_u = jnp.asarray(coo.row.astype(np.int32))
        pos_i = jnp.asarray(coo.col.astype(np.int32))
        n_pos = pos_u.shape[0]
        key = jax.random.PRNGKey(self.seed)
        k_init, key = jax.random.split(key)
        # implicit's init: normal / factors
        X = jax.random.normal(k_init, (users, self.factors)) / self.factors
        k_init2, key = jax.random.split(key)
        Y = jax.random.normal(k_init2, (items, self.factors)) / self.factors

        lr, reg, batch = self.lr, self.reg, self.batch

        @jax.jit
        def epoch(X, Y, ekey):
            steps = max(n_pos // batch, 1)

            def step(carry, skey):
                X, Y = carry
                ks, kn = jax.random.split(skey)
                rows = jax.random.randint(ks, (batch,), 0, n_pos)
                u, i = pos_u[rows], pos_i[rows]
                j = jax.random.randint(kn, (batch,), 0, items)
                xu, yi, yj = X[u], Y[i], Y[j]
                score = jnp.sum(xu * (yi - yj), axis=1)
                z = 1.0 / (1.0 + jnp.exp(score))       # dL/dscore
                gu = z[:, None] * (yi - yj) - reg * xu
                gi = z[:, None] * xu - reg * yi
                gj = -z[:, None] * xu - reg * yj
                X = X.at[u].add(lr * gu)
                Y = Y.at[i].add(lr * gi)
                Y = Y.at[j].add(lr * gj)
                return (X, Y), None

            (X, Y), _ = jax.lax.scan(step, (X, Y),
                                     jax.random.split(ekey, steps))
            return X, Y

        for it in range(self.iterations):
            key, ekey = jax.random.split(key)
            X, Y = epoch(X, Y, ekey)
        self.user_factors = np.asarray(X)
        self.item_factors = np.asarray(Y)


# ----------------------------------------------------------------- LMF core


class LMF:
    """Logistic matrix factorization (implicit.cpu.lmf equivalent):
    AdaGrad ascent on the logistic likelihood with sampled negatives.
    Defaults tuned on the synthetic benchmark (grid over lr/reg/iters/
    neg_prop; implicit 0.6's defaults of lr=1.0, reg=0.6, 30 iters rank
    barely above random on small implicit matrices here)."""

    def __init__(self, factors: int = 128, learning_rate: float = 0.3,
                 regularization: float = 0.05, iterations: int = 100,
                 neg_prop: int = 5, seed: int = 0, batch: int = 4096):
        self.factors = factors
        self.lr = learning_rate
        self.reg = regularization
        self.iterations = iterations
        self.neg_prop = neg_prop
        self.seed = seed
        self.batch = batch

    def fit(self, mat: sp.csr_matrix) -> None:
        users, items = mat.shape
        coo = mat.tocoo()
        pos_u = jnp.asarray(coo.row.astype(np.int32))
        pos_i = jnp.asarray(coo.col.astype(np.int32))
        vals = jnp.asarray(coo.data.astype(np.float32))
        n_pos = pos_u.shape[0]
        key = jax.random.PRNGKey(self.seed)
        kx, ky, key = jax.random.split(key, 3)
        X = jax.random.normal(kx, (users, self.factors)) * 0.01
        Y = jax.random.normal(ky, (items, self.factors)) * 0.01
        GX = jnp.ones_like(X)  # AdaGrad accumulators
        GY = jnp.ones_like(Y)

        lr, reg, batch, neg_prop = (self.lr, self.reg, self.batch,
                                    self.neg_prop)

        @jax.jit
        def epoch(state, ekey):
            X, Y, GX, GY = state
            steps = max(n_pos // batch, 1)

            def step(carry, skey):
                X, Y, GX, GY = carry
                ks, kn = jax.random.split(skey)
                rows = jax.random.randint(ks, (batch,), 0, n_pos)
                u, i, r = pos_u[rows], pos_i[rows], vals[rows]
                # positive part: gradient of  r*s - (1+r)*log(1+e^s)
                s = jnp.sum(X[u] * Y[i], axis=1)
                sig = jax.nn.sigmoid(s)
                gpos = (r - (1.0 + r) * sig)[:, None]
                gu = gpos * Y[i] - reg * X[u]
                gi = gpos * X[u] - reg * Y[i]
                # sampled negatives: r = 0 -> gradient -sigmoid(s)
                jneg = jax.random.randint(kn, (batch * 2,), 0, items)
                un = jnp.tile(u, 2)
                sn = jnp.sum(X[un] * Y[jneg], axis=1)
                gneg = (-jax.nn.sigmoid(sn))[:, None] / neg_prop
                gun = gneg * Y[jneg]
                gjn = gneg * X[un]

                def adagrad(P, G, ids, g):
                    G = G.at[ids].add(g * g)
                    P = P.at[ids].add(lr * g / jnp.sqrt(G[ids]))
                    return P, G

                X, GX = adagrad(X, GX, u, gu)
                Y, GY = adagrad(Y, GY, i, gi)
                X, GX = adagrad(X, GX, un, gun)
                Y, GY = adagrad(Y, GY, jneg, gjn)
                return (X, Y, GX, GY), None

            state, _ = jax.lax.scan(step, (X, Y, GX, GY),
                                    jax.random.split(ekey, steps))
            return state

        state = (X, Y, GX, GY)
        for it in range(self.iterations):
            key, ekey = jax.random.split(key)
            state = epoch(state, ekey)
        self.user_factors = np.asarray(state[0])
        self.item_factors = np.asarray(state[1])


# ------------------------------------------------------------- recommenders


def _make_model(algo: str, factors: int):
    if algo == "als":
        return ALS(factors=factors)
    if algo == "lmf":
        return LMF(factors=factors)
    return BPR(factors=factors)


class TrackTrackCF(PredictionModel):
    """MF of the track-track co-occurrence matrix (reference TrackTrackCF,
    baselines.py:458-487)."""

    def __init__(self, algo: str = "als", factors: int = 128):
        self.algo = algo
        self.factors = factors

    def train(self, graph, ids, train_set, test_set, features) -> None:
        from gcn_song_embeddings_tpu.data.graph import track_track_matrix

        ttmat = track_track_matrix(len(ids), np.asarray(train_set))
        self.model = _make_model(self.algo, self.factors)
        self.model.fit(ttmat.astype(np.float32))

    def knn(self, nodeset, k):
        return knn_from_emb(self.model.item_factors, np.asarray(nodeset), k)


class ColTrackCF(PredictionModel):
    """MF of the playlist-track membership matrix (reference ColTrackCF,
    baselines.py:489-514)."""

    def __init__(self, algo: str = "als", factors: int = 128):
        self.algo = algo
        self.factors = factors

    def train(self, graph, ids, train_set, test_set, features) -> None:
        from gcn_song_embeddings_tpu.data.graph import col_track_matrix

        ctmat = col_track_matrix(graph)
        self.model = _make_model(self.algo, self.factors)
        self.model.fit(ctmat.astype(np.float32))

    def knn(self, nodeset, k):
        return knn_from_emb(self.model.item_factors, np.asarray(nodeset), k)
