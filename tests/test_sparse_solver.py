"""SparseSolver end-to-end: sparse LP/QP through the device
multifrontal KKT backend, against the dense Solver."""

import numpy as np
import pytest
import scipy.sparse as sp

from cuclarabel_tpu.cones import api
from cuclarabel_tpu.solver import Solver
from cuclarabel_tpu.sparse_solver import SparseSolver
from cuclarabel_tpu.statuscodes import SolverStatus


def _grid_qp(k, seed=0):
    """Grid-Laplacian QP: min 0.5 x'Px + q'x s.t. sum x = 1, x >= lb."""
    rng = np.random.default_rng(seed)
    n = k * k
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (k, k))
    P = (sp.kron(sp.eye(k), T) + sp.kron(T, sp.eye(k))
         + sp.eye(n)).tocsc()
    q = rng.standard_normal(n)
    A = sp.vstack([
        sp.csr_matrix(np.ones((1, n))),
        -sp.eye(n),
    ]).tocsc()
    lb = -1.0 - rng.random(n)
    b = np.concatenate([[1.0], -lb])
    cones = [api.ZeroConeT(1), api.NonnegativeConeT(n)]
    return P, q, A, b, cones


def test_sparse_qp_matches_dense():
    P, q, A, b, cones = _grid_qp(5)
    s_sp = SparseSolver(P, q, A, b, cones).solve()
    s_dn = Solver(P.toarray(), q, A.toarray(), b, cones,
                  presolve_enable=False).solve()
    assert s_sp.status == SolverStatus.SOLVED
    np.testing.assert_allclose(s_sp.x, s_dn.x, atol=1e-6)
    assert np.isclose(s_sp.obj_val, s_dn.obj_val, atol=1e-7)
    assert s_sp.r_prim < 1e-8 and s_sp.r_dual < 1e-8


def test_sparse_lp():
    rng = np.random.default_rng(1)
    n = 60
    A0 = sp.random(25, n, density=0.2,
                   random_state=np.random.RandomState(2), format="csc")
    x0 = np.abs(rng.standard_normal(n)) + 0.1
    brow = np.asarray(A0 @ x0).ravel() + 1.0
    A = sp.vstack([A0, -sp.eye(n)]).tocsc()
    b = np.concatenate([brow, np.zeros(n)])
    q = rng.random(n)
    cones = [api.NonnegativeConeT(25), api.NonnegativeConeT(n)]
    s_sp = SparseSolver(None, q, A, b, cones).solve()
    s_dn = Solver(None, q, A.toarray(), b, cones,
                  presolve_enable=False).solve()
    assert s_sp.status == SolverStatus.SOLVED
    assert np.isclose(s_sp.obj_val, s_dn.obj_val, atol=1e-7)


def test_sparse_infeasible():
    n = 10
    A = sp.vstack([sp.eye(n), -sp.eye(n)]).tocsc()
    b = np.concatenate([-np.ones(n), -np.ones(n)])  # x <= -1, x >= 1
    q = np.zeros(n)
    cones = [api.NonnegativeConeT(2 * n)]
    s = SparseSolver(None, q, A, b, cones).solve()
    assert s.status in (SolverStatus.PRIMAL_INFEASIBLE,
                        SolverStatus.ALMOST_PRIMAL_INFEASIBLE)


def test_sparse_rejects_soc():
    A = sp.eye(3).tocsc()
    with pytest.raises(ValueError, match="Zero/Nonnegative"):
        SparseSolver(None, np.zeros(3), A, np.ones(3),
                     [api.SecondOrderConeT(3)])


def test_sparse_medium_scale():
    """Larger instance (N ~ 1.3k) solves and stays accurate."""
    P, q, A, b, cones = _grid_qp(18, seed=3)
    s_sp = SparseSolver(P, q, A, b, cones).solve()
    assert s_sp.status == SolverStatus.SOLVED
    assert s_sp.r_prim < 1e-8 and s_sp.r_dual < 1e-8
