"""KKT backend sweep: the same problem fixtures solved per backend
(parity with the reference's per-LDL-backend sweep,
test/OptTests/linear_solvers.jl): dense-lu, dense-inverse, and the
native sparse qdldl CPU backend must agree."""

import numpy as np
import pytest

import cuclarabel_tpu as cc
from cuclarabel_tpu.native import get_lib

BACKENDS = [
    dict(direct_solve_method="dense", kkt_solve_method="lu"),
    dict(direct_solve_method="dense", kkt_solve_method="inverse"),
]
if get_lib() is not None:
    BACKENDS.append(dict(direct_solve_method="qdldl"))


def qp_data():
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.vstack([np.array([[1.0, 1.0]]), np.eye(2), -np.eye(2)])
    b = np.array([1.0, 0.7, 0.7, 0.0, 0.0])
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(2), cc.NonnegativeConeT(2)]
    return P, q, A, b, cones, 1.8800000298


def socp_data():
    P = np.array(
        [
            [1.4652521089139698, 0.6137176286085666, -1.1527861771130112],
            [0.6137176286085666, 2.219109946678485, -1.4400420548730628],
            [-1.1527861771130112, -1.4400420548730628, 1.6014483534926371],
        ]
    )
    q = np.array([0.1, -2.0, 1.0])
    A = np.vstack([np.vstack([np.eye(3), -np.eye(3)]) * 2.0, np.eye(3)])
    b = np.concatenate([np.ones(6), np.zeros(3)])
    cones = [
        cc.NonnegativeConeT(3),
        cc.NonnegativeConeT(3),
        cc.SecondOrderConeT(3),
    ]
    return P, q, A, b, cones, -0.84590


def sdp_data():
    P = np.eye(6)
    q = np.zeros(6)
    A = np.eye(6)
    b = np.array([-3.0, 1.0, 4.0, 1.0, 2.0, 5.0])
    return P, q, A, b, [cc.PSDTriangleConeT(3)], 4.840076866013861


@pytest.mark.parametrize("backend", BACKENDS, ids=lambda d: "-".join(d.values()))
@pytest.mark.parametrize("data", [qp_data, socp_data, sdp_data],
                         ids=["qp", "socp", "sdp"])
def test_backend_sweep(backend, data):
    P, q, A, b, cones, obj = data()
    sol = cc.Solver(P, q, A, b, cones, **backend).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert abs(sol.obj_val - obj) < 1e-3
    assert sol.r_prim < 1e-8 and sol.r_dual < 1e-8
