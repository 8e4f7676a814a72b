"""Golden exponential-cone tests (parity with reference
test/OptTests/basic_exp.jl)."""

import numpy as np

import cuclarabel_tpu as cc


def basic_exp_data():
    n = 7
    A1 = np.hstack([np.ones((1, 3)), np.zeros((1, 4))])  # zero cone
    b1 = np.array([10.0])
    A2 = np.hstack([np.zeros((3, 2)), -np.eye(3), np.zeros((3, 2))])  # NN cone
    b2 = np.zeros(3)
    A3 = np.zeros((3, 7))  # exp cone
    A3[0, 0] = -1.0
    A3[1, 2] = -1.0
    A3[2, 4] = -1.0
    b3 = np.zeros(3)

    q = np.array([1.0, 0.5, -2.0, -0.1, 1.0, 3.0, 0.0])
    P = np.eye(n) * 1e-1
    A = np.vstack([A1, A2, A3])
    b = np.concatenate([b1, b2, b3])
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(3), cc.ExponentialConeT()]
    return P, q, A, b, cones


def test_feasible():
    P, q, A, b, cones = basic_exp_data()
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    x_ref = np.array(
        [
            -9.425995201329599,
            4.828561507482018,
            14.59743362204262,
            1.0000012112102774,
            7.65314081561849,
            -29.99999978458479,
            -0.0,
        ]
    )
    assert np.linalg.norm(sol.x - x_ref) < 1e-3
    assert abs(sol.obj_val - (-54.41243965302268)) < 1e-3
