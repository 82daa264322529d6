"""f64 dense oracles for the ALS solver (VERDICT r3 item 7).

Roster-level evidence shows ALS *quality* is fine (top model on the hard
benchmark), but that cannot separate "implementation correct" from
"quality happens to be fine on synth".  These property tests pin the math:
`_als_solve_block` (the batched-Cholesky MXU path) against a dense NumPy
f64 solve of the same Hu-Koren-Volinsky normal equations

    (Y^T C_u Y + reg I) x_u = Y^T C_u p_u,   C_u = I + alpha * diag(r_u)

(the system implicit's CG/Cholesky ALS solves — reference capability
/root/reference/baselines.py:458-514 via implicit.cpu.als), and
`_als_half_step` end-to-end through `_pad_rows` including hub-truncated
rows.  Bar: <= 1e-4 relative factor error per half-step.
"""

import numpy as np
import scipy.sparse as sp

from gcn_song_embeddings_tpu.models.baselines.mf import (
    _als_half_step,
    _als_solve_block,
    _pad_rows,
)

import jax.numpy as jnp


def _dense_oracle_row(Y64, item_ids, ratings, reg, alpha=1.0):
    """One user's exact f64 normal-equation solve over the FULL item set:
    C_u = I + alpha*diag(r), p_u = 1 on observed items."""
    n_items, F = Y64.shape
    c = np.ones(n_items)
    p = np.zeros(n_items)
    c[item_ids] = 1.0 + alpha * ratings
    p[item_ids] = 1.0
    A = Y64.T @ (c[:, None] * Y64) + reg * np.eye(F)
    b = Y64.T @ (c * p)
    return np.linalg.solve(A, b)


def _rel_err(a, b):
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)


def test_als_solve_block_matches_f64_oracle():
    rng = np.random.default_rng(0)
    n_items, F, B, M, reg, alpha = 60, 16, 8, 12, 0.01, 1.0
    Y = rng.normal(0, 0.3, (n_items, F)).astype(np.float32)
    Y64 = Y.astype(np.float64)

    idx = np.zeros((B, M), np.int32)
    conf = np.zeros((B, M), np.float32)
    expected = np.zeros((B, F))
    for u in range(B):
        nnz = int(rng.integers(1, M + 1))          # exercises padding
        items = rng.choice(n_items, nnz, replace=False)
        r = rng.uniform(0.5, 5.0, nnz)
        idx[u, :nnz] = items
        conf[u, :nnz] = 1.0 + alpha * r
        expected[u] = _dense_oracle_row(Y64, items, r, reg, alpha)

    YtY = np.asarray(jnp.dot(jnp.asarray(Y).T, jnp.asarray(Y),
                             precision="highest"))
    got = np.asarray(_als_solve_block(jnp.asarray(Y), jnp.asarray(YtY),
                                      jnp.asarray(idx), jnp.asarray(conf),
                                      reg))
    assert _rel_err(got, expected) <= 1e-4


def test_als_half_step_matches_f64_oracle_through_pad_rows():
    """Full half-step via the public path (CSR -> _pad_rows -> blocked
    Cholesky solves) against the dense f64 oracle on every row."""
    rng = np.random.default_rng(1)
    users, items, F, reg, alpha = 50, 40, 8, 0.05, 1.0
    dense = (rng.random((users, items)) < 0.15) * rng.uniform(
        0.5, 4.0, (users, items))
    mat = sp.csr_matrix(dense.astype(np.float32))
    Y = rng.normal(0, 0.3, (items, F)).astype(np.float32)
    Y64 = Y.astype(np.float64)

    # pin M to the true max nnz: the percentile cap (hub behavior, covered
    # below) would otherwise truncate the longest row vs the full oracle
    idx, val = _pad_rows(mat, max_nnz=int(np.diff(mat.indptr).max()))
    conf = np.where(val > 0, 1.0 + alpha * val, 0.0).astype(np.float32)
    X = np.zeros((users, F), np.float32)
    got = _als_half_step(X, Y, idx, conf, reg, block=16)

    expected = np.stack([
        _dense_oracle_row(Y64, mat[u].indices, mat[u].data, reg, alpha)
        for u in range(users)])
    assert _rel_err(got, expected) <= 1e-4


def test_pad_rows_hub_truncation_keeps_top_confidence():
    """A hub row longer than the percentile cap keeps its HIGHEST-value
    entries; normal rows survive exactly."""
    rng = np.random.default_rng(2)
    rows, cols = 40, 200
    lil = sp.lil_matrix((rows, cols), dtype=np.float32)
    for r in range(rows - 1):
        for c in rng.choice(cols, 5, replace=False):
            lil[r, c] = rng.uniform(0.5, 2.0)
    hub_vals = rng.permutation(np.arange(1.0, 101.0))   # distinct values
    lil[rows - 1, :100] = hub_vals
    mat = lil.tocsr()

    idx, val = _pad_rows(mat)                            # percentile cap
    m = idx.shape[1]
    assert m < 100, "hub row must be truncated by the 99.5th percentile cap"
    # normal rows: exact contents
    for r in range(rows - 1):
        got = dict(zip(idx[r][val[r] > 0], val[r][val[r] > 0]))
        want = dict(zip(mat[r].indices, mat[r].data))
        assert got == want
    # hub row: the m largest values survive
    hub = val[rows - 1][val[rows - 1] > 0]
    assert len(hub) == m
    assert set(np.round(hub).astype(int)) == set(
        np.round(np.sort(hub_vals)[-m:]).astype(int))


def test_als_fit_reduces_hkv_objective():
    """End-to-end `ALS.fit` decreases the Hu-Koren-Volinsky objective
    sum_ui c_ui (p_ui - x_u.y_i)^2 + reg(|X|^2+|Y|^2) monotonically-ish
    (first vs last iteration) on a small dense-checkable problem."""
    from gcn_song_embeddings_tpu.models.baselines.mf import ALS

    rng = np.random.default_rng(3)
    users, items = 30, 25
    dense = (rng.random((users, items)) < 0.2) * rng.uniform(
        0.5, 3.0, (users, items))
    mat = sp.csr_matrix(dense.astype(np.float32))

    def objective(X, Y):
        P = (dense > 0).astype(np.float64)
        C = 1.0 + 1.0 * dense
        S = X.astype(np.float64) @ Y.astype(np.float64).T
        return float((C * (P - S) ** 2).sum()
                     + 0.01 * ((X ** 2).sum() + (Y ** 2).sum()))

    als1 = ALS(factors=8, iterations=1, seed=0)
    als1.fit(mat)
    als15 = ALS(factors=8, iterations=15, seed=0)
    als15.fit(mat)
    o1 = objective(als1.user_factors, als1.item_factors)
    o15 = objective(als15.user_factors, als15.item_factors)
    assert o15 < o1
