"""Termination-classification and reporting tests: the "almost solved"
reduced-tolerance fallback (info_post_process!, info.jl:198-214), the
max-iterations exit, and the verbose console report."""

import numpy as np

import cuclarabel_tpu as cc


def qp():
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.vstack([np.array([[1.0, 1.0]]), np.eye(2), -np.eye(2)])
    b = np.array([1.0, 0.7, 0.7, 0.0, 0.0])
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(2), cc.NonnegativeConeT(2)]
    return P, q, A, b, cones


def test_almost_solved_on_unreachable_tolerance():
    """Tolerances below machine precision cannot be met; the solver
    must stop with the reduced-tolerance classification rather than a
    bare failure, and the answer must still be accurate."""
    P, q, A, b, cones = qp()
    sol = cc.Solver(
        P, q, A, b, cones,
        tol_gap_abs=1e-300, tol_gap_rel=1e-300, tol_feas=1e-300,
    ).solve()
    assert sol.status == cc.SolverStatus.ALMOST_SOLVED
    assert abs(sol.obj_val - 1.88) < 1e-2


def test_max_iterations_exit():
    P, q, A, b, cones = qp()
    sol = cc.Solver(
        P, q, A, b, cones,
        max_iter=1,
        # forbid the reduced-tolerance rescue so MAX_ITERATIONS survives
        reduced_tol_gap_abs=1e-300, reduced_tol_gap_rel=1e-300,
        reduced_tol_feas=1e-300,
    ).solve()
    assert sol.status == cc.SolverStatus.MAX_ITERATIONS
    assert sol.iterations == 1


def test_verbose_report(capsys):
    P, q, A, b, cones = qp()
    sol = cc.Solver(P, q, A, b, cones, verbose=True).solve()
    out = capsys.readouterr().out
    assert "cuclarabel_tpu" in out          # banner
    assert "variables     = 2" in out        # configuration
    assert "pcost" in out and "dcost" in out  # iteration table header
    assert "Terminated with status = solved" in out
    # one table row per iteration plus the initial point
    assert out.count("+1.") + out.count("-1.") >= sol.iterations
