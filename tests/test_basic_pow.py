"""Golden power-cone and genpower-cone tests (parity with reference
test/OptTests/basic_pow.jl and basic_genpow.jl).

Both model  max z1 + z2  s.t. the two 3-d power-cone memberships,
x1 + 2y + 3x2 == 3, y2 == 1; optimum -1.8458.
"""

import numpy as np

import cuclarabel_tpu as cc


def basic_pow_data():
    n = 6
    P = np.zeros((n, n))
    q = np.zeros(n)
    q[2] = q[5] = -1.0

    A1 = np.eye(6)
    b1 = np.zeros(6)
    A2 = np.array([[1.0, 2.0, 0.0, 3.0, 0.0, 0.0]])
    b2 = np.array([-3.0])
    A3 = np.array([[0.0, 0.0, 0.0, 0.0, 1.0, 0.0]])
    b3 = np.array([-1.0])

    A = -np.vstack([A1, A2, A3])
    b = np.concatenate([b1, b2, b3])
    cones = [
        cc.PowerConeT(0.6),
        cc.PowerConeT(0.1),
        cc.ZeroConeT(1),
        cc.ZeroConeT(1),
    ]
    return P, q, A, b, cones


def basic_genpow_data():
    n = 6
    P = np.zeros((n, n))
    q = np.zeros(n)
    q[2] = q[5] = -1.0
    A = np.array(
        [
            [-1.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            [0.0, -1.0, 0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, -1.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, -1.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0, -1.0, 0.0],
            [0.0, 0.0, 0.0, 0.0, 0.0, -1.0],
            [1.0, 2.0, 0.0, 3.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0, 1.0, 0.0],
        ]
    )
    b = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 3.0, 1.0])
    cones = [
        cc.GenPowerConeT([0.6, 0.4], 1),
        cc.GenPowerConeT([0.1, 0.9], 1),
        cc.ZeroConeT(2),
    ]
    return P, q, A, b, cones


def test_pow_feasible():
    P, q, A, b, cones = basic_pow_data()
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert abs(sol.obj_val - (-1.8458)) < 1e-3


def test_genpow_feasible():
    P, q, A, b, cones = basic_genpow_data()
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert abs(sol.obj_val - (-1.8458)) < 1e-3
