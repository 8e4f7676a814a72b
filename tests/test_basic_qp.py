"""Golden QP tests (parity with reference test/OptTests/basic_qp.jl)."""

import numpy as np
import pytest

import cuclarabel_tpu as cc


def basic_qp_data():
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A0 = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([1.0, 0.0, 0.0])
    u = np.array([1.0, 0.7, 0.7])
    A = np.vstack([-A0, A0])
    b = np.concatenate([-l, u])
    cones = [cc.NonnegativeConeT(3), cc.NonnegativeConeT(3)]
    return P, q, A, b, cones


def basic_qp_data_dualinf():
    P = np.array([[1.0, 1.0], [1.0, 1.0]])
    q = np.array([1.0, -1.0])
    A = np.array([[1.0, 1.0], [1.0, 0.0]])
    b = np.array([1.0, 1.0])
    cones = [cc.NonnegativeConeT(2)]
    return P, q, A, b, cones


def test_univariate():
    sol = cc.Solver(
        np.eye(1), np.zeros(1), np.eye(1), np.ones(1), [cc.NonnegativeConeT(1)]
    ).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert abs(sol.x[0]) < 1e-3
    assert abs(sol.obj_val) < 1e-3
    assert abs(sol.obj_val_dual) < 1e-3


def test_feasible():
    P, q, A, b, cones = basic_qp_data()
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - np.array([0.3, 0.7])) < 1e-3
    assert abs(sol.obj_val - 1.8800000298331538) < 1e-3
    assert abs(sol.obj_val_dual - 1.8800000298331538) < 1e-3


def test_high_accuracy():
    """The default tolerances are 1e-8; check we actually hit them."""
    P, q, A, b, cones = basic_qp_data()
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - np.array([0.3, 0.7])) < 1e-6
    assert sol.r_prim < 1e-8
    assert sol.r_dual < 1e-8


def test_primal_infeasible():
    P, q, A, b, cones = basic_qp_data()
    b[0] = -1.0
    b[3] = -1.0
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.PRIMAL_INFEASIBLE
    assert np.isnan(sol.obj_val)


def test_dual_infeasible():
    P, q, A, b, cones = basic_qp_data_dualinf()
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.DUAL_INFEASIBLE
    assert np.isnan(sol.obj_val)


def test_dual_infeasible_non_qsd_kkt():
    P, q, A, b, cones = basic_qp_data_dualinf()
    A = A[:1, :]
    b = b[:1]
    cones = [cc.NonnegativeConeT(1)]
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.DUAL_INFEASIBLE
    assert np.isnan(sol.obj_val)
