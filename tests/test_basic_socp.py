"""Golden SOCP tests (parity with reference test/OptTests/basic_socp.jl)."""

import numpy as np

import cuclarabel_tpu as cc


def basic_socp_data():
    P = np.array(
        [
            [1.4652521089139698, 0.6137176286085666, -1.1527861771130112],
            [0.6137176286085666, 2.219109946678485, -1.4400420548730628],
            [-1.1527861771130112, -1.4400420548730628, 1.6014483534926371],
        ]
    )
    A1 = np.vstack([np.eye(3), -np.eye(3)]) * 2.0
    q = np.array([0.1, -2.0, 1.0])
    b1 = np.ones(6)
    A2 = np.eye(3)
    b2 = np.zeros(3)
    A = np.vstack([A1, A2])
    b = np.concatenate([b1, b2])
    cones = [
        cc.NonnegativeConeT(3),
        cc.NonnegativeConeT(3),
        cc.SecondOrderConeT(3),
    ]
    return P, q, A, b, cones


def test_feasible():
    P, q, A, b, cones = basic_socp_data()
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - np.array([-0.5, 0.435603, -0.245459])) < 1e-3
    assert abs(sol.obj_val - (-0.84590)) < 1e-3
    assert abs(sol.obj_val_dual - (-0.84590)) < 1e-3


def test_infeasible():
    P, q, A, b, cones = basic_socp_data()
    b[6] = -10.0
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.PRIMAL_INFEASIBLE
    assert np.isnan(sol.obj_val)
