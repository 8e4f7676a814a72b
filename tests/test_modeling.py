"""Modeling-layer (L8) tests: the reference's MOI fixture problems
(QP/SOCP/exp/pow/PSD — test/Interfaces/MOI_wrapper_tests.jl tolerances)
expressed through the Python builder, plus the lasso from
test_misc_opt.py rewritten without hand assembly."""

import numpy as np
import pytest

from cuclarabel_tpu import modeling as md
from cuclarabel_tpu.cones import api
from cuclarabel_tpu.statuscodes import SolverStatus

TOL = 1e-4  # MOI_wrapper_tests.jl:25-40 atol/rtol


def test_basic_qp():
    """basic_qp fixture: golden x*=[0.3,0.7], obj=1.88 (basic_qp.jl:64-75)."""
    m = md.Model()
    x = m.add_variables(2)
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    m.minimize(0.5 * md.quad_form(x, P) + np.array([1.0, 1.0]) @ x)
    m.add_constraint(md.sum_entries(x) == 1.0)
    m.add_constraint(x >= 0.0)
    m.add_constraint(x <= np.array([0.7, 0.7]))
    sol = m.solve()
    assert sol.status == SolverStatus.SOLVED
    assert m.termination_status == "OPTIMAL"
    np.testing.assert_allclose(x.value, [0.3, 0.7], atol=1e-3)
    assert np.isclose(m.objective_value, 1.8800000298, atol=1e-3)


def test_qp_epigraph_bridge():
    """use_quad_obj=False routes the quadratic through an SOC epigraph
    (use_quad_obj attribute, MOI_wrapper.jl:236-257)."""
    m = md.Model()
    x = m.add_variables(2)
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    m.minimize(0.5 * md.quad_form(x, P) + np.array([1.0, 1.0]) @ x)
    m.add_constraint(md.sum_entries(x) == 1.0)
    m.add_constraint(x >= 0.0)
    m.add_constraint(x <= np.array([0.7, 0.7]))
    sol = m.solve(use_quad_obj=False)
    assert sol.status == SolverStatus.SOLVED
    np.testing.assert_allclose(x.value, [0.3, 0.7], atol=1e-3)
    assert np.isclose(m.objective_value, 1.8800000298, atol=1e-3)
    # the epigraph variable exists and an SOC constraint was added
    assert any(
        isinstance(c.cone, api.SecondOrderConeT) for c in m.constraints
    ) or len(m.constraints) == 3  # bridge constraint appended at assembly


def test_maximize_sense_flip():
    """max -x'x + q'x == -(min x'x - q'x); objective sign restored
    (process_objective sense flip, MOI_wrapper.jl:688-770)."""
    m = md.Model()
    x = m.add_variables(2)
    m.maximize(-md.sumsq(x) + np.array([2.0, 4.0]) @ x)
    m.add_constraint(x <= np.array([10.0, 10.0]))
    sol = m.solve()
    assert sol.status == SolverStatus.SOLVED
    np.testing.assert_allclose(x.value, [1.0, 2.0], atol=1e-4)
    assert np.isclose(m.objective_value, 5.0, atol=1e-4)


def test_socp():
    """min x2 s.t. ||[x1; x2-1]|| <= 1: optimum x2 = 0."""
    m = md.Model()
    x = m.add_variables(2)
    m.minimize(x @ np.array([0.0, 1.0]))
    m.add_constraint(md.norm2(md.vstack([x[0:1], x[1:2] - 1.0])) <= 1.0)
    sol = m.solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.isclose(m.objective_value, 0.0, atol=TOL)
    np.testing.assert_allclose(x.value, [0.0, 0.0], atol=1e-3)


def test_exp_cone():
    """basic_exp fixture (test/OptTests/basic_exp.jl): max x s.t.
    (x, 1, e) in ExpCone -> x = 1 at the boundary y*exp(x/y) = z."""
    m = md.Model()
    x = m.add_variables(3)
    # x[0] <= x[1]*log(x[2]/x[1]); fix x[1]=1, x[2]=e
    m.add_constraint(x, api.ExponentialConeT())
    m.add_constraint(x[1:2] == 1.0)
    m.add_constraint(x[2:3] == float(np.e))
    m.maximize(x @ np.array([1.0, 0.0, 0.0]))
    sol = m.solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.isclose(x.value[0], 1.0, atol=TOL)


def test_pow_cone():
    """max z s.t. (x,y,z) in Pow(0.6), x=2, y=1 -> z = 2^0.6."""
    m = md.Model()
    v = m.add_variables(3)
    m.add_constraint(v, api.PowerConeT(0.6))
    m.add_constraint(v[0:1] == 2.0)
    m.add_constraint(v[1:2] == 1.0)
    m.maximize(v @ np.array([0.0, 0.0, 1.0]))
    sol = m.solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.isclose(v.value[2], 2.0**0.6, atol=TOL)


def test_psd_cone():
    """min tr(X) s.t. X - I  PSD (svec form): optimum tr = 2."""
    m = md.Model()
    # svec of a 2x2 symmetric X: [X11, sqrt(2) X12, X22]
    xs = m.add_variables(3)
    rt2 = np.sqrt(2.0)
    eye_svec = np.array([1.0, 0.0, 1.0])
    m.add_constraint(xs - eye_svec, api.PSDTriangleConeT(2))
    m.minimize(xs @ np.array([1.0, 0.0, 1.0]))
    sol = m.solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.isclose(m.objective_value, 2.0, atol=TOL)
    np.testing.assert_allclose(xs.value, eye_svec, atol=1e-3)


def test_infeasible_status_mapping():
    m = md.Model()
    x = m.add_variables(1)
    m.add_constraint(x >= 1.0)
    m.add_constraint(x <= 0.0)
    m.minimize(x @ np.array([1.0]))
    sol = m.solve()
    assert sol.status in (
        SolverStatus.PRIMAL_INFEASIBLE,
        SolverStatus.ALMOST_PRIMAL_INFEASIBLE,
    )
    assert m.termination_status in ("INFEASIBLE", "ALMOST_INFEASIBLE")
    assert m.dual_status in (
        "INFEASIBILITY_CERTIFICATE",
        "NEARLY_INFEASIBILITY_CERTIFICATE",
    )


def test_duals_and_slacks():
    """Constraint handles expose dual/slack rows of the solution."""
    m = md.Model()
    x = m.add_variables(2)
    c1 = m.add_constraint(md.sum_entries(x) == 1.0)
    c2 = m.add_constraint(x >= 0.0)
    m.minimize(0.5 * md.sumsq(x))
    sol = m.solve()
    assert sol.status == SolverStatus.SOLVED
    assert c1.dual.shape == (1,)
    assert c2.slack.shape == (2,)
    # x = [0.5, 0.5]; equality dual = -0.5 (sign: Ax+s=b convention)
    np.testing.assert_allclose(x.value, [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.abs(c1.dual), [0.5], atol=1e-6)
    np.testing.assert_allclose(c2.slack, [0.5, 0.5], atol=1e-6)


def test_lasso_via_builder():
    """The socp-lasso of test_misc_opt.py (socp-lasso.jl) written
    naturally:  min ||Fv - b||^2 + mu*||v||_1."""
    rng = np.random.default_rng(12345)
    n, mrows = 8, 400
    F = rng.random((mrows, n))
    vtrue = np.zeros(n)
    vtrue[rng.random(n) < 0.2] = rng.random()
    bvec = F @ vtrue + 0.1 * rng.random(mrows)
    mu = 0.1 * np.abs(F.T @ bvec).max()

    m = md.Model()
    v = m.add_variables(n)
    u = m.add_variables(n)  # |v| epigraph
    m.add_constraint(v <= u)
    m.add_constraint(-1.0 * u <= v)
    m.minimize(md.sumsq(F @ v - bvec) + mu * md.sum_entries(u))
    sol = m.solve()
    assert sol.status == SolverStatus.SOLVED

    # KKT-free sanity: objective at the reported point matches, and is
    # no worse than at the true generator
    obj_at = lambda w: float(np.sum((F @ w - bvec) ** 2) + mu * np.abs(w).sum())
    assert np.isclose(m.objective_value, obj_at(v.value), rtol=1e-6)
    assert m.objective_value <= obj_at(vtrue) + 1e-6


def test_expression_algebra():
    m = md.Model()
    x = m.add_variables(3)
    e = 2.0 * x - np.array([1.0, 2.0, 3.0])
    M = np.arange(6.0).reshape(2, 3)
    f = M @ e + 1.0
    assert f.k == 2
    # evaluate at a point by faking the solution
    m._x = np.array([1.0, 1.0, 1.0])
    np.testing.assert_allclose(e.value, [1.0, 0.0, -1.0])
    np.testing.assert_allclose(f.value, M @ np.array([1.0, 0.0, -1.0]) + 1.0)
    q = md.quad_form(e, np.eye(3))
    assert np.isclose(q.value, 2.0)
    s = md.sumsq(x)
    assert np.isclose(s.value, 3.0)


def test_mixed_model_rejected():
    m1, m2 = md.Model(), md.Model()
    x1, x2 = m1.add_variables(2), m2.add_variables(2)
    with pytest.raises(ValueError):
        x1 + x2


def test_psd_constraint_sugar():
    """min t s.t. [[t, 1], [1, t]] PSD  ->  t = 1."""
    m = md.Model()
    t = m.add_variables(1)
    m.add_psd_constraint([[t, 1.0], [1.0, t]])
    m.minimize(t @ np.array([1.0]))
    sol = m.solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.isclose(t.value, 1.0, atol=1e-5)


def test_psd_constraint_matrix_completion():
    """min x s.t. [[1, x, 0], [x, 1, x], [0, x, 1]] PSD and x >= -2:
    the matrix is PSD iff |x| <= 1/sqrt(2); minimizing x gives
    x = -1/sqrt(2)."""
    m = md.Model()
    x = m.add_variables(1)
    m.add_psd_constraint([
        [1.0, x, 0.0],
        [x, 1.0, x],
        [0.0, x, 1.0],
    ])
    m.minimize(x @ np.array([1.0]))
    sol = m.solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.isclose(x.value, -1.0 / np.sqrt(2.0), atol=1e-5)


def test_sparse_backend():
    """backend='sparse' routes the assembled model through
    SparseSolver (triplets stay sparse end-to-end)."""
    from cuclarabel_tpu.sparse_solver import SparseSolver

    m = md.Model()
    x = m.add_variables(2)
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    m.minimize(0.5 * md.quad_form(x, P) + np.array([1.0, 1.0]) @ x)
    m.add_constraint(md.sum_entries(x) == 1.0)
    m.add_constraint(x >= 0.0)
    m.add_constraint(x <= np.array([0.7, 0.7]))
    sol = m.solve(backend="sparse")
    assert isinstance(m.solver, SparseSolver)
    assert sol.status == SolverStatus.SOLVED
    np.testing.assert_allclose(x.value, [0.3, 0.7], atol=1e-3)
    assert np.isclose(m.objective_value, 1.8800000298, atol=1e-3)

    # pure-LP objective (P = None inside SparseSolver)
    m2 = md.Model()
    y = m2.add_variables(3)
    m2.minimize(np.array([1.0, 2.0, 3.0]) @ y)
    m2.add_constraint(md.sum_entries(y) == 1.0)
    m2.add_constraint(y >= 0.0)
    s2 = m2.solve(backend="sparse")
    assert s2.status == SolverStatus.SOLVED
    assert np.isclose(m2.objective_value, 1.0, atol=1e-6)


def test_genpow_cone():
    """max w s.t. (x, y, w) in GenPow([0.4, 0.6], 1), x = 2, y = 3
    -> w = 2^0.4 * 3^0.6 (MOI GenPowerCone extension analog,
    MOI_extensions.jl:12-26)."""
    m = md.Model()
    v = m.add_variables(3)
    m.add_constraint(v, api.GenPowerConeT((0.4, 0.6), 1))
    m.add_constraint(v[0:1] == 2.0)
    m.add_constraint(v[1:2] == 3.0)
    m.maximize(v @ np.array([0.0, 0.0, 1.0]))
    sol = m.solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.isclose(v.value[2], 2.0**0.4 * 3.0**0.6, atol=TOL)
