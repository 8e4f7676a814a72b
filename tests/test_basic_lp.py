"""Golden LP tests (parity with reference test/OptTests/basic_lp.jl)."""

import numpy as np
import pytest

import cuclarabel_tpu as cc


def basic_lp_data():
    P = np.zeros((3, 3))
    A = np.eye(3)
    A = np.vstack([A, -A]) * 2.0
    q = np.array([3.0, -2.0, 1.0])
    b = np.ones(6)
    cones = [cc.NonnegativeConeT(3), cc.NonnegativeConeT(3)]
    return P, q, A, b, cones


def test_feasible():
    P, q, A, b, cones = basic_lp_data()
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - np.array([-0.5, 0.5, -0.5])) < 1e-3
    assert abs(sol.obj_val - (-3.0)) < 1e-3
    assert abs(sol.obj_val_dual - (-3.0)) < 1e-3


def test_primal_infeasible():
    P, q, A, b, cones = basic_lp_data()
    b[0] = -1.0
    b[3] = -1.0
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.PRIMAL_INFEASIBLE
    assert np.isnan(sol.obj_val)
    assert np.isnan(sol.obj_val_dual)


def test_dual_infeasible():
    P, q, A, b, cones = basic_lp_data()
    A[3, 0] = 1.0  # swap lower bound to redundant upper bound
    q = np.array([1.0, 0.0, 0.0])
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.DUAL_INFEASIBLE
    assert np.isnan(sol.obj_val)


def test_dual_infeasible_ill_conditioned():
    P, q, A, b, cones = basic_lp_data()
    A[0, 0] = np.finfo(np.float64).eps
    A[3, 0] = 0.0
    q = np.array([1.0, 0.0, 0.0])
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.DUAL_INFEASIBLE
    assert np.isnan(sol.obj_val)
