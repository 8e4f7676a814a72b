"""Golden SDP tests (parity with reference test/OptTests/basic_sdp.jl
and the SDP fixture of test/OptTests/linear_solvers.jl)."""

import numpy as np

import cuclarabel_tpu as cc


def basic_sdp_data():
    # 3x3 PSD cone: 6 svec entries
    P = np.eye(6)
    q = np.zeros(6)
    A = np.eye(6)
    b = np.array([-3.0, 1.0, 4.0, 1.0, 2.0, 5.0])  # triu of indefinite matrix
    cones = [cc.PSDTriangleConeT(3)]
    return P, q, A, b, cones


X_REF = np.array(
    [
        -3.0729833267361095,
        0.3696004167288786,
        -0.022226685581313674,
        0.31441213129613066,
        -0.026739700851545107,
        -0.016084530571308823,
    ]
)


def test_feasible():
    P, q, A, b, cones = basic_sdp_data()
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - X_REF) < 1e-3
    assert abs(sol.obj_val - 4.840076866013861) < 1e-3


def test_empty_psd_cone():
    P, q, A, b, cones = basic_sdp_data()
    cones = cones + [cc.PSDTriangleConeT(0)]
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - X_REF) < 1e-3


def test_mixed_sdp_socp():
    """One problem containing NN + SOC + PSD blocks exercises the
    cross-type composite dispatch."""
    rng = np.random.default_rng(42)
    n = 6
    F = rng.standard_normal((n, n))
    P = F @ F.T + 0.1 * np.eye(n)
    q = rng.standard_normal(n)

    # s1 = b1 - I x >= 0; s2 = (1; x[0:2]) in SOC; s3 = svec-diag embedding
    A_nn = np.eye(n)
    b_nn = np.full(n, 2.0)
    A_soc = np.zeros((3, n))
    A_soc[1, 0] = -1.0
    A_soc[2, 1] = -1.0
    b_soc = np.array([1.5, 0.0, 0.0])
    # 2x2 PSD: [x0 x2; x2 x1] + tI >= 0  (svec rows)
    A_psd = np.zeros((3, n))
    A_psd[0, 0] = -1.0
    A_psd[1, 2] = -np.sqrt(2.0)
    A_psd[2, 1] = -1.0
    b_psd = np.array([1.0, 0.0, 1.0])

    A = np.vstack([A_nn, A_soc, A_psd])
    b = np.concatenate([b_nn, b_soc, b_psd])
    cones = [
        cc.NonnegativeConeT(n),
        cc.SecondOrderConeT(3),
        cc.PSDTriangleConeT(2),
    ]
    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert sol.r_prim < 1e-7 and sol.r_dual < 1e-7
    # KKT check: slack s must satisfy A x + s = b
    assert np.linalg.norm(A @ sol.x + sol.s - b) < 1e-6
