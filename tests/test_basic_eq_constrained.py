"""Golden equality-constrained tests (parity with reference
test/OptTests/basic_eq_constrained.jl)."""

import numpy as np

import cuclarabel_tpu as cc


def test_equality_constrained():
    P = np.eye(3)
    q = np.zeros(3)
    A = np.array([[0.0, 1.0, 1.0], [0.0, 1.0, -1.0]])
    b = np.array([2.0, 0.0])
    sol = cc.Solver(P, q, A, b, [cc.ZeroConeT(2)]).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - np.array([0.0, 1.0, 1.0])) < 1e-3


def test_equality_constrained_2():
    P = np.eye(3)
    q = np.array([1.0, 2.0, 3.0])
    A = np.array([[1.0, 1.0, 1.0], [0.0, 1.0, -1.0]])
    b = np.array([2.0, 0.0])
    sol = cc.Solver(P, q, A, b, [cc.ZeroConeT(2)]).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - np.array([10.0, 1.0, 1.0]) / 6.0) < 1e-3


def test_redundant_rows():
    P = np.eye(3)
    q = np.zeros(3)
    A0 = np.array([[0.0, 1.0, 1.0], [0.0, 1.0, -1.0]])
    b0 = np.array([2.0, 0.0])
    A = np.vstack([A0, A0])
    b = np.concatenate([b0, b0])
    sol = cc.Solver(P, q, A, b, [cc.ZeroConeT(2), cc.ZeroConeT(2)]).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - np.array([0.0, 1.0, 1.0])) < 1e-3


def test_primal_infeasible():
    P = np.eye(3)
    q = np.zeros(3)
    A = np.array(
        [
            [0.0, 1.0, 1.0],
            [0.0, 1.0, -1.0],
            [1.0, 2.0, -1.0],
            [2.0, -1.0, 3.0],
        ]
    )
    b = np.ones(4)
    sol = cc.Solver(P, q, A, b, [cc.ZeroConeT(4)]).solve()
    assert sol.status == cc.SolverStatus.PRIMAL_INFEASIBLE


def test_dual_infeasible():
    P = np.eye(3)
    P[0, 0] = 0.0
    q = np.ones(3)
    A = np.array([[0.0, 1.0, 1.0], [0.0, 1.0, -1.0]])
    b = np.array([2.0, 0.0])
    sol = cc.Solver(P, q, A, b, [cc.ZeroConeT(2)]).solve()
    assert sol.status == cc.SolverStatus.DUAL_INFEASIBLE
