"""Named Maros-Meszaros corpus members solve to their published optima.

These are real MM test-set members (small Hock-Schittkowski QPs with
exact published optimal values; see benchmarks/maros.py), solved
through the native API the way the reference's OptTests solve golden
problems (test/OptTests/basic_qp.jl:64-75 asserts status + objective).
Both the dense path and the device sparse multifrontal are exercised.
"""

import sys

import numpy as np
import pytest
import scipy.sparse as sp

sys.path.insert(0, ".")

import cuclarabel_tpu as cc
from benchmarks.maros import PROBLEMS


from benchmarks.maros import obj_tol as _obj_tol


@pytest.mark.parametrize("make", PROBLEMS, ids=lambda f: f.__name__)
def test_maros_dense(make):
    p = make()
    sol = cc.Solver(p.P, p.q, p.A, p.b, p.cones).solve()
    assert sol.status == cc.SolverStatus.SOLVED, p.name
    obj = sol.obj_val + p.obj_const
    assert obj == pytest.approx(p.obj_golden, abs=_obj_tol(p),
                                rel=1e-8), p.name


@pytest.mark.parametrize("make", PROBLEMS, ids=lambda f: f.__name__)
def test_maros_sparse(make):
    from cuclarabel_tpu.sparse_solver import SparseSolver

    p = make()
    sol = SparseSolver(
        sp.csc_matrix(np.triu(p.P)), p.q, sp.csc_matrix(p.A), p.b, p.cones
    ).solve()
    assert sol.status == cc.SolverStatus.SOLVED, p.name
    obj = sol.obj_val + p.obj_const
    assert obj == pytest.approx(p.obj_golden, abs=_obj_tol(p),
                                rel=1e-8), p.name

def test_hs268_transcription_self_consistency():
    """The HS268 data are internally verifiable: at the published
    x* = (1, 2, -1, 3, -4), D x* == d exactly (so the quadratic's
    unconstrained minimum 0 is attained) and every constraint holds."""
    from benchmarks.maros import _HS268_D, _HS268_d, hs268

    xstar = np.array([1.0, 2.0, -1.0, 3.0, -4.0])
    assert np.array_equal(_HS268_D @ xstar, _HS268_d)
    p = hs268()
    slack = p.b - p.A @ xstar
    assert np.all(slack >= -1e-12), slack
    obj = 0.5 * xstar @ p.P @ xstar + p.q @ xstar + p.obj_const
    assert obj == pytest.approx(0.0, abs=1e-9)


@pytest.mark.parametrize(
    "make", PROBLEMS, ids=lambda f: f.__name__
)
def test_maros_scipy_crosscheck(make):
    """Independent transcription check: scipy SLSQP on the same
    (P, q, A, b) data reaches the published optimum (mirrors the
    offline verification claimed in benchmarks/maros.py)."""
    from scipy.optimize import minimize

    import cuclarabel_tpu as cc_mod
    p = make()
    meq = sum(c.dim for c in p.cones if isinstance(c, cc_mod.ZeroConeT))
    cons = []
    if meq:
        cons.append({"type": "eq",
                     "fun": lambda x, A=p.A[:meq], b=p.b[:meq]: b - A @ x})
    if p.A.shape[0] > meq:
        cons.append({"type": "ineq",
                     "fun": lambda x, A=p.A[meq:], b=p.b[meq:]: b - A @ x})
    n = p.q.shape[0]
    # SLSQP is start-sensitive (HS118 fails from the origin); accept
    # the first converged run over a few deterministic starts
    starts = [np.zeros(n), np.full(n, 10.0),
              np.linalg.lstsq(p.A, p.b, rcond=None)[0]]
    best = np.inf
    for x0 in starts:
        r = minimize(lambda x: 0.5 * x @ p.P @ x + p.q @ x, x0,
                     jac=lambda x: p.P @ x + p.q,
                     constraints=cons, method="SLSQP",
                     options={"maxiter": 600, "ftol": 1e-14})
        # status 8 ("positive directional derivative") is a linesearch
        # stall AT the optimum under the tight ftol — keep the value if
        # the iterate is feasible (SLSQP's fun is still the objective)
        feasible = all(np.all(c["fun"](r.x) >= -1e-7) for c in cons
                       if c["type"] == "ineq") and all(
                           np.all(np.abs(c["fun"](r.x)) <= 1e-7)
                           for c in cons if c["type"] == "eq")
        if feasible:
            best = min(best, r.fun)
        # only stop early on a run that both converged AND passed the
        # feasibility filter; otherwise keep trying later starts
        if r.success and feasible:
            break
    assert best + p.obj_const == pytest.approx(
        p.obj_golden, abs=max(5e-5, 1e-7 * (1 + abs(p.obj_golden))),
        rel=1e-6), p.name
