"""Warm starting (capability beyond the reference: its iterates always
restart — data_updating.jl).  solve(warm_start=(x, s, z)) seeds the
IPM from a previous solution; with update_data this is the MPC /
scenario re-solve path."""

import numpy as np
import pytest

import cuclarabel_tpu as cc
from cuclarabel_tpu.statuscodes import SolverStatus


def _qp(n=40, seed=0):
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((n, 8))
    P = 2 * (F @ F.T + 0.1 * np.eye(n))
    q = -rng.standard_normal(n)
    A = np.vstack([np.ones((1, n)), -np.eye(n), np.eye(n)])
    b = np.concatenate([[1.0], np.zeros(n), np.ones(n) * 0.5])
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(2 * n)]
    return P, q, A, b, cones


def test_warm_start_fewer_iterations():
    P, q, A, b, cones = _qp()
    s = cc.Solver(P, q, A, b, cones, presolve_enable=False)
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED

    rng = np.random.default_rng(1)
    s.update_q(q + 0.01 * rng.standard_normal(len(q)))
    warm = s.solve(warm_start=(sol.x, sol.s, sol.z))
    cold = s.solve()
    assert warm.status == SolverStatus.SOLVED
    assert abs(warm.obj_val - cold.obj_val) < 1e-7 * max(1, abs(cold.obj_val))
    np.testing.assert_allclose(warm.x, cold.x, atol=1e-6)
    # the point of warm starting: a small data change re-solves in
    # strictly fewer iterations than the cold start
    assert warm.iterations < cold.iterations


def test_warm_start_socp():
    # min -mu'w s.t. sum w = 1, w >= 0, ||G w|| <= gamma
    rng = np.random.default_rng(2)
    n = 8
    G = rng.standard_normal((5, n)) / 4.0
    mu = rng.random(n)
    q = -mu
    A = np.vstack([np.ones((1, n)), -np.eye(n), np.zeros((1, n)), -G])
    b = np.concatenate([[1.0], np.zeros(n), [0.3], np.zeros(5)])
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(n),
             cc.SecondOrderConeT(6)]
    s = cc.Solver(None, q, A, b, cones, presolve_enable=False)
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED
    s.update_q(q * 1.01)
    warm = s.solve(warm_start=(sol.x, sol.s, sol.z))
    cold = s.solve()
    assert warm.status == SolverStatus.SOLVED
    assert abs(warm.obj_val - cold.obj_val) < 1e-6
    assert warm.iterations <= cold.iterations


def test_warm_start_guards():
    P, q, A, b, cones = _qp(n=6)
    s = cc.Solver(P, q, A, b, cones, presolve_enable=False)
    sol = s.solve()
    with pytest.raises(ValueError):
        s.solve(warm_start=(sol.x[:-1], sol.s, sol.z))  # bad shape

    # nonsymmetric problems are rejected
    m2 = cc.Solver(
        None, np.array([1.0, 0.0, 0.0]),
        -np.eye(3), np.zeros(3), [cc.ExponentialConeT()],
    )
    with pytest.raises(ValueError):
        m2.solve(warm_start=(np.zeros(3), np.ones(3), np.ones(3)))


def test_batch_warm_start():
    """BatchSolver.solve(warm_start=...) seeds every problem; a small
    perturbation re-solves in fewer total iterations, sharded or not."""
    from cuclarabel_tpu.parallel import BatchSolver

    P, q, A, b, cones = _qp(n=20, seed=3)
    B = 8
    rng = np.random.default_rng(4)
    qb = np.broadcast_to(q, (B, len(q))) + 0.05 * rng.standard_normal(
        (B, len(q)))
    bb = np.broadcast_to(b, (B, len(b))).copy()
    bs = BatchSolver(P, qb, A, bb, cones, n_devices=2)
    sols = bs.solve()
    assert all(s.status == SolverStatus.SOLVED for s in sols)

    bs.update_data(q=qb * 1.01)
    warm = bs.solve(warm_start=(
        np.stack([s.x for s in sols]),
        np.stack([s.s for s in sols]),
        np.stack([s.z for s in sols]),
    ))
    cold = bs.solve()
    assert all(s.status == SolverStatus.SOLVED for s in warm)
    for wsol, csol in zip(warm, cold):
        assert abs(wsol.obj_val - csol.obj_val) < 1e-6
    assert sum(s.iterations for s in warm) < sum(s.iterations for s in cold)


def test_sparse_warm_start():
    """SparseSolver.solve(warm_start=...) through the device
    multifrontal path."""
    import scipy.sparse as sp
    from cuclarabel_tpu.sparse_solver import SparseSolver

    P, q, A, b, cones = _qp(n=24, seed=5)
    s = SparseSolver(sp.csc_matrix(np.triu(P)), q, sp.csc_matrix(A), b,
                     cones, presolve_enable=False)
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED
    s.update_q(q * 1.01)
    warm = s.solve(warm_start=(sol.x, sol.s, sol.z))
    cold = s.solve()
    assert warm.status == SolverStatus.SOLVED
    assert abs(warm.obj_val - cold.obj_val) < 1e-6 * max(1, abs(cold.obj_val))
    assert warm.iterations <= cold.iterations


def test_batch_sparse_warm_start():
    """BatchSparseSolver.solve(warm_start=...) through the vmapped
    multifrontal."""
    import scipy.sparse as sp
    from cuclarabel_tpu.parallel import BatchSparseSolver

    P, q, A, b, cones = _qp(n=16, seed=6)
    B = 4
    rng = np.random.default_rng(7)
    qb = np.broadcast_to(q, (B, len(q))) + 0.05 * rng.standard_normal(
        (B, len(q)))
    bb = np.broadcast_to(b, (B, len(b))).copy()
    bs = BatchSparseSolver(sp.csc_matrix(np.triu(P)), qb,
                           sp.csc_matrix(A), bb, cones)
    sols = bs.solve()
    assert all(s.status == SolverStatus.SOLVED for s in sols)
    bs.update_data(q=qb * 1.01)
    warm = bs.solve(warm_start=(
        np.stack([s.x for s in sols]),
        np.stack([s.s for s in sols]),
        np.stack([s.z for s in sols]),
    ))
    cold = bs.solve()
    assert all(s.status == SolverStatus.SOLVED for s in warm)
    for wsol, csol in zip(warm, cold):
        assert abs(wsol.obj_val - csol.obj_val) < 1e-6
    assert sum(s.iterations for s in warm) <= sum(s.iterations for s in cold)


def test_sharded_warm_start():
    """ShardedSolver.solve(warm_start=...) through the block-arrow TP
    backend on an 8-device mesh."""
    from cuclarabel_tpu.parallel import ShardedSolver

    P, q, A, b, cones = _qp(n=16, seed=8)
    s = ShardedSolver(P, q, A, b, cones, n_devices=8)
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED
    s.update_data(q=q * 1.01)
    warm = s.solve(warm_start=(sol.x, sol.s, sol.z))
    cold = s.solve()
    assert warm.status == SolverStatus.SOLVED
    assert abs(warm.obj_val - cold.obj_val) < 1e-6 * max(1, abs(cold.obj_val))
    assert warm.iterations <= cold.iterations


def test_warm_start_sdp():
    """Warm starting a problem with a PSD cone (svec margins/shift
    path).  min tr(CX)-style SDP in svec form."""
    rng = np.random.default_rng(9)
    d = 4
    sv = d * (d + 1) // 2
    rt2 = np.sqrt(2.0)

    def svec(M):
        out = []
        for j in range(d):
            for i in range(j + 1):
                out.append(M[i, j] * (1.0 if i == j else rt2))
        return np.array(out)

    # min <C, X> s.t. tr(X) = 1, X PSD   (x = svec(X))
    G = rng.standard_normal((d, d))
    C = (G + G.T) / 2
    q = svec(C)
    tr_row = svec(np.eye(d))
    A = np.vstack([tr_row[None, :], -np.eye(sv)])
    b = np.concatenate([[1.0], np.zeros(sv)])
    cones = [cc.ZeroConeT(1), cc.PSDTriangleConeT(d)]
    s = cc.Solver(None, q, A, b, cones, presolve_enable=False)
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED
    # optimum = min eigenvalue of C
    assert abs(sol.obj_val - np.linalg.eigvalsh(C).min()) < 1e-6

    s.update_q(q * 1.01)
    warm = s.solve(warm_start=(sol.x, sol.s, sol.z))
    cold = s.solve()
    assert warm.status == SolverStatus.SOLVED
    assert abs(warm.obj_val - cold.obj_val) < 1e-6
    assert warm.iterations <= cold.iterations
