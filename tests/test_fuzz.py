"""Randomized correctness sweep: seeded random conic programs whose
returned solutions are validated against first principles (feasibility,
conic membership, duality gap) and — for QPs — against scipy.

The reference's OptTests use hand-written fixtures only; this sweep
adds distributional coverage at the same tolerances.
"""

import numpy as np
import pytest

import cuclarabel_tpu as cc
from cuclarabel_tpu.statuscodes import SolverStatus

TOL = 5e-6


def _kkt_check(P, q, A, b, sol):
    """Primal feasibility, complementarity, and gap of a returned
    solution (the solver's own termination criteria re-derived from
    scratch in numpy)."""
    x, s, z = sol.x, sol.s, sol.z
    r_prim = np.linalg.norm(A @ x + s - b, np.inf) / max(
        1.0, np.linalg.norm(b, np.inf))
    Px = P @ x if P is not None else 0.0
    r_dual = np.linalg.norm(Px + q + A.T @ z, np.inf) / max(
        1.0, np.linalg.norm(q, np.inf))
    gap = abs(s @ z) / max(1.0, abs(sol.obj_val))
    assert r_prim < TOL, r_prim
    assert r_dual < TOL, r_dual
    assert gap < 1e-4, gap


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_qp_vs_scipy(seed):
    from scipy.optimize import LinearConstraint, minimize

    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 12))
    meq = int(rng.integers(0, 3))
    F = rng.standard_normal((n, max(2, n // 2)))
    P = F @ F.T + 0.1 * np.eye(n)
    q = rng.standard_normal(n)
    Aeq = rng.standard_normal((meq, n))
    beq = rng.standard_normal(meq) * 0.3
    # box -2 <= x <= 2 keeps everything bounded/feasible
    A = np.vstack([Aeq, np.eye(n), -np.eye(n)])
    b = np.concatenate([beq, np.full(n, 2.0), np.full(n, 2.0)])
    cones = ([cc.ZeroConeT(meq)] if meq else []) + [
        cc.NonnegativeConeT(2 * n)]

    sol = cc.Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED
    _kkt_check(P, q, A, b, sol)

    cons = [LinearConstraint(np.eye(n), -2.0, 2.0)]
    if meq:
        cons.append(LinearConstraint(Aeq, beq, beq))
    best = None
    for s0 in range(3):
        r = minimize(lambda x: 0.5 * x @ P @ x + q @ x,
                     np.random.default_rng(s0).standard_normal(n) * 0.1,
                     constraints=cons, method="SLSQP",
                     options={"maxiter": 500, "ftol": 1e-14})
        if r.success and (best is None or r.fun < best):
            best = r.fun
    assert best is not None
    assert sol.obj_val <= best + 1e-6 * max(1, abs(best))


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_mixed_cones_kkt(seed):
    """LP + SOC (+ exp for odd seeds) mixed problems validated by KKT
    conditions only (no external solver for conic classes)."""
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(5, 10))
    soc_dim = int(rng.integers(3, 6))
    G = rng.standard_normal((soc_dim - 1, n)) / np.sqrt(n)
    gamma = 1.0 + rng.random()

    rows = [np.ones((1, n)), -np.eye(n), np.zeros((1, n)), -G]
    b = np.concatenate([[1.0], np.zeros(n), [gamma], np.zeros(soc_dim - 1)])
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(n),
             cc.SecondOrderConeT(soc_dim)]
    if seed % 2:
        # s_exp = (x_0, 1, 1.5) in ExpCone  <=>  exp(x_0) <= 1.5, an
        # active cap on x_0 (~0.405) the objective pushes against
        Ae = np.zeros((3, n))
        Ae[0, 0] = -1.0
        rows.append(Ae)
        b = np.concatenate([b, [0.0, 1.0, 1.5]])
        cones.append(cc.ExponentialConeT())
    A = np.vstack(rows)
    q = -rng.random(n)

    sol = cc.Solver(None, q, A, b, cones).solve()
    assert sol.status in (SolverStatus.SOLVED, SolverStatus.ALMOST_SOLVED)
    if sol.status == SolverStatus.SOLVED:
        _kkt_check(None, q, A, b, sol)
        # conic membership of s: SOC block
        lo = 1 + n
        t, v = sol.s[lo], sol.s[lo + 1:lo + soc_dim]
        assert t >= np.linalg.norm(v) - 1e-7
