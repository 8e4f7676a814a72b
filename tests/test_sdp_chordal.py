"""Chordal SDP decomposition tests (parity with reference
test/OptTests/sdp_chordal.jl): one chordally-sparse SDP solved under
the full cartesian product {compact} x {complete_dual} x {merge
method} — 12 configurations, all must solve."""

import numpy as np
import pytest

import cuclarabel_tpu as cc

SQ2 = np.sqrt(2.0)


def sdp_chordal_data():
    m, n = 28, 8
    P = np.zeros((n, n))
    q = np.array([-1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    colptr = [0, 1, 4, 5, 8, 9, 10, 13, 16]
    rowval = [24, 7, 10, 22, 8, 12, 15, 25, 9, 13, 18, 21, 26, 0, 23, 27]
    nzval = [
        -1.0, -SQ2, -1.0, -1.0, -SQ2, -SQ2, -1.0, -1.0,
        -SQ2, -SQ2, -SQ2, -1.0, -1.0, -1.0, -1.0, -1.0,
    ]
    A = np.zeros((m, n))
    for j in range(n):
        for k in range(colptr[j], colptr[j + 1]):
            A[rowval[k], j] = nzval[k]
    b = np.zeros(m)
    b[1] = 3.0
    b[2] = 2.0 * SQ2
    b[3] = 2.0
    b[4] = SQ2
    b[5] = SQ2
    b[6] = 3.0
    cones = [
        cc.NonnegativeConeT(1),
        cc.PSDTriangleConeT(6),
        cc.PowerConeT(1.0 / 3.0),
        cc.PowerConeT(0.5),
    ]
    return P, q, A, b, cones


@pytest.mark.parametrize("compact", [False, True])
@pytest.mark.parametrize("complete_dual", [False, True])
@pytest.mark.parametrize(
    "merge_method", ["clique_graph", "parent_child", "none"]
)
def test_chordal_sweep(compact, complete_dual, merge_method):
    P, q, A, b, cones = sdp_chordal_data()
    solver = cc.Solver(
        P, q, A, b, cones,
        chordal_decomposition_enable=True,
        chordal_decomposition_compact=compact,
        chordal_decomposition_complete_dual=complete_dual,
        chordal_decomposition_merge_method=merge_method,
    )
    # with no merging, decomposition must actually fire on this sparse
    # PSD block (aggressive merge heuristics may legitimately re-merge
    # everything into one clique on a problem this small)
    if merge_method == "none":
        assert solver.chordal_info is not None
    sol = solver.solve()
    assert sol.status == cc.SolverStatus.SOLVED
    # full-length (original-problem) solution vectors
    assert len(sol.s) == 28 and len(sol.z) == 28 and len(sol.x) == 8
    # primal feasibility in the ORIGINAL problem: A x + s == b
    assert np.linalg.norm(A @ sol.x + sol.s - b) < 1e-6
    # the reconstructed primal PSD slack must be PSD
    def tomat(v, r=6):
        M = np.zeros((r, r))
        a = 0
        for j in range(r):
            for i in range(j + 1):
                M[i, j] = M[j, i] = v[a] if i == j else v[a] / SQ2
                a += 1
        return M

    S = tomat(sol.s[1:22])
    assert np.linalg.eigvalsh(S)[0] > -1e-7
    if complete_dual:
        Z = tomat(sol.z[1:22])
        assert np.linalg.eigvalsh(Z)[0] > -1e-7


def test_chordal_objective_matches_undecomposed():
    P, q, A, b, cones = sdp_chordal_data()
    ref = cc.Solver(
        P, q, A, b, cones, chordal_decomposition_enable=False
    ).solve()
    sol = cc.Solver(
        P, q, A, b, cones, chordal_decomposition_enable=True
    ).solve()
    assert ref.status == cc.SolverStatus.SOLVED
    assert sol.status == cc.SolverStatus.SOLVED
    assert abs(sol.obj_val - ref.obj_val) < 1e-6
