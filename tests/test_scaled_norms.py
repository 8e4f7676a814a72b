"""Overflow-safe scaled norms (mathutils.jl:58-108 parity): residual
norms must stay finite/correct when products reach 1e±150 territory,
which squares past f64 range in a naive 2-norm."""

import jax.numpy as jnp
import numpy as np

from cuclarabel_tpu.cones import api
from cuclarabel_tpu.ipm.loop import _norm_scaled
from cuclarabel_tpu.solver import Solver
from cuclarabel_tpu.statuscodes import SolverStatus


def test_norm_scaled_overflow():
    w = jnp.asarray([1e160, 1e159, 0.0])
    v = jnp.asarray([1.0, 2.0, 3.0])
    expect = 1e160 * np.sqrt(1.0 + 0.04)
    got = float(_norm_scaled(w, v))
    assert np.isfinite(got)
    assert np.isclose(got, expect, rtol=1e-12)


def test_norm_scaled_underflow():
    w = jnp.asarray([3e-170, 4e-170])
    v = jnp.asarray([1.0, 1.0])
    got = float(_norm_scaled(w, v))
    assert np.isclose(got, 5e-170, rtol=1e-12)


def test_norm_scaled_zero():
    assert float(_norm_scaled(jnp.zeros(3), jnp.ones(3))) == 0.0


def test_infeasible_certificate_extreme_scaling():
    """Primal-infeasible LP with data at the INFINITY-scale boundary:
    x >= 1e20 and x <= -1e20 simultaneously.  The certificate norms run
    on ~1e20-magnitude products.

    Detection verified to work up to ~1e24 data; beyond that the
    dtau-recombination Dz = z1 + dtau*z2 (kktsystem.jl:192-208 — the
    reference uses the identical f64 recombination) cancels two ~|b|-
    scale terms down to O(1), leaving eps*|b| rounding noise that
    swamps the true step.  Data past the 1e20 INFINITY convention is
    outside both solvers' well-posed range; the norm helpers themselves
    are exercised to 1e±160 in the unit tests above."""
    q = np.array([0.0])
    A = np.array([[1.0], [-1.0]])
    b = np.array([-1e20, -1e20])
    sol = Solver(None, q, A, b, [api.NonnegativeConeT(2)],
                 presolve_enable=False).solve()
    assert sol.status in (
        SolverStatus.PRIMAL_INFEASIBLE,
        SolverStatus.ALMOST_PRIMAL_INFEASIBLE,
    )


def test_solved_extreme_scaling():
    """A solvable LP with 1e18-magnitude coefficients still reports
    finite residuals and solves."""
    q = np.array([1e18])
    A = np.array([[-1.0]])
    b = np.array([1e18])  # x >= -1e18
    sol = Solver(None, q, A, b, [api.NonnegativeConeT(1)]).solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.isfinite(sol.obj_val)
    assert np.isclose(sol.x[0], -1e18, rtol=1e-6)


def test_fully_presolved_empty_m():
    """Every row at infinite bound: presolve drops all constraints and
    the m=0 problem still solves (unbounded objective -> DUAL_INFEASIBLE,
    dropped slacks restored by reverse_presolve)."""
    q = np.array([1.0])
    A = np.array([[-1.0]])
    b = np.array([1e30])
    sol = Solver(None, q, A, b, [api.NonnegativeConeT(1)]).solve()
    assert sol.status == SolverStatus.DUAL_INFEASIBLE
    assert sol.s.shape == (1,)
