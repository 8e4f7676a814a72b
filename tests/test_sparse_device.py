"""Device sparse LDL^T (level-scheduled batched multifrontal) vs dense
f64 reference solves."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from cuclarabel_tpu.kkt.sparse_device import SparseDeviceLDL


def _upper_csc(M):
    U = sp.triu(sp.csc_matrix(M)).tocsc()
    U.sort_indices()
    return (U.indptr.astype(np.int64), U.indices.astype(np.int64),
            np.asarray(U.data, dtype=np.float64))


def _kkt_sparse(rng, n, m, density=0.1):
    """Sparse quasidefinite [P A'; A -H] with H diagonal positive."""
    A = sp.random(m, n, density=density,
                  random_state=np.random.RandomState(1), format="csc")
    A = A + 0.01 * sp.eye(m, n)  # structural full rank help
    G = sp.random(n, n, density=density,
                  random_state=np.random.RandomState(2), format="csc")
    P = G @ G.T + sp.eye(n)
    H = sp.diags(10.0 ** rng.uniform(-2, 2, m))
    K = sp.bmat([[P, A.T], [A, -H]], format="csc")
    dsigns = np.concatenate([np.ones(n), -np.ones(m)])
    return K, dsigns


@pytest.mark.parametrize("n,m,mw", [(15, 20, 4), (40, 55, 8), (25, 25, 32)])
def test_sparse_device_matches_dense(n, m, mw):
    rng = np.random.default_rng(0)
    K, dsigns = _kkt_sparse(rng, n, m)
    N = n + m
    Ap, Ai, Ax = _upper_csc(K)
    fac = SparseDeviceLDL(N, Ap, Ai, dsigns, reg_enable=False,
                          max_width=mw)
    assert fac.refactor(Ax)
    b = rng.standard_normal(N)
    x = fac.solve(b)
    x_ref = np.linalg.solve(np.asarray(K.todense()), b)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-8)


def test_refactor_reuses_symbolic():
    rng = np.random.default_rng(3)
    K, dsigns = _kkt_sparse(rng, 20, 25)
    N = 45
    Ap, Ai, Ax = _upper_csc(K)
    fac = SparseDeviceLDL(N, Ap, Ai, dsigns, reg_enable=False)
    assert fac.refactor(Ax)
    # change values, same pattern
    Ax2 = Ax * rng.uniform(0.5, 2.0, Ax.shape[0])
    # keep quasidefiniteness: rebuild with scaled diagonal blocks
    K2 = sp.csc_matrix((np.zeros_like(Ax2), Ai, Ap), shape=(N, N))
    K2.data[:] = Ax2
    Kfull = K2 + sp.triu(K2, 1).T
    assert fac.refactor(Ax2)
    b = rng.standard_normal(N)
    x = fac.solve(b)
    x_ref = np.linalg.solve(np.asarray(Kfull.todense()), b)
    np.testing.assert_allclose(x, x_ref, rtol=1e-7, atol=1e-7)


def test_dynamic_regularization_zero_pivot():
    """A structurally singular diagonal gets bumped to dsign*delta
    (directldl_qdldl.jl:18-25 semantics)."""
    N = 3
    # K = [[1, 1, 0], [1, 0(!), 0], [0, 0, -1]] upper
    Ap = np.array([0, 1, 3, 4])
    Ai = np.array([0, 0, 1, 2])
    Ax = np.array([1.0, 1.0, 1.0, -1.0])  # K[1,1] = 1 -> pivot -? fine
    dsigns = np.array([1.0, -1.0, -1.0])
    fac = SparseDeviceLDL(N, Ap, Ai, dsigns, reg_enable=True,
                          eps=1e-13, delta=2e-7)
    assert fac.refactor(Ax)
    x = fac.solve(np.array([1.0, 2.0, 3.0]))
    K = np.array([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0], [0.0, 0.0, -1.0]])
    # K is singular; the regularized solve must still be finite
    assert np.all(np.isfinite(x))


def test_larger_grid_structure():
    """2D-grid-structured KKT (the Maros-Meszaros-like regime): bigger
    N with real fill-reducing gains."""
    rng = np.random.default_rng(4)
    k = 10
    lap = sp.kron(sp.eye(k), sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (k, k))) \
        + sp.kron(sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (k, k)), sp.eye(k))
    n = k * k
    P = (lap + sp.eye(n)).tocsc()
    m = n
    A = sp.eye(m, n, format="csc") + sp.diags(
        np.ones(n - 1), 1, (m, n)
    )
    H = sp.diags(10.0 ** rng.uniform(-1, 1, m))
    K = sp.bmat([[P, A.T], [A, -H]], format="csc")
    N = n + m
    dsigns = np.concatenate([np.ones(n), -np.ones(m)])
    Ap, Ai, Ax = _upper_csc(K)
    fac = SparseDeviceLDL(N, Ap, Ai, dsigns, reg_enable=False)
    assert fac.refactor(Ax)
    b = rng.standard_normal(N)
    x = fac.solve(b)
    res = np.abs(K @ x - b).max()
    assert res < 1e-8, res
