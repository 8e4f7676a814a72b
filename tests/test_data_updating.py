"""Parametric data-updating tests (parity with reference
test/OptTests/data_updating.jl semantics): all update input forms,
equilibration re-application, guard errors."""

import numpy as np
import pytest

import cuclarabel_tpu as cc


def updating_qp():
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.vstack([np.array([[1.0, 1.0]]), np.eye(2), -np.eye(2)])
    b = np.array([1.0, 0.7, 0.7, 0.0, 0.0])
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(2), cc.NonnegativeConeT(2)]
    return P, q, A, b, cones


def _fresh(P, q, A, b, cones):
    return cc.Solver(P, q, A, b, cones, presolve_enable=False).solve()


def test_update_matches_fresh_solve():
    P, q, A, b, cones = updating_qp()
    solver = cc.Solver(P, q, A, b, cones, presolve_enable=False)
    solver.solve()

    P2 = P * 1.5
    q2 = q + np.array([0.3, -0.2])
    b2 = b + 0.1
    solver.update_data(P=P2, q=q2, b=b2)
    sol = solver.solve()
    ref = _fresh(P2, q2, A, b2, cones)
    assert sol.status == cc.SolverStatus.SOLVED
    assert abs(sol.obj_val - ref.obj_val) < 1e-8
    assert np.linalg.norm(sol.x - ref.x) < 1e-7


def test_update_A_full_and_flat():
    P, q, A, b, cones = updating_qp()
    solver = cc.Solver(P, q, A, b, cones, presolve_enable=False)
    A2 = A.copy()
    A2[0, 1] = 2.0
    solver.update_A(A2)
    sol = solver.solve()
    ref = _fresh(P, q, A2, b, cones)
    assert abs(sol.obj_val - ref.obj_val) < 1e-8

    # flat row-major values form
    solver2 = cc.Solver(P, q, A, b, cones, presolve_enable=False)
    solver2.update_A(A2.ravel())
    sol2 = solver2.solve()
    assert abs(sol2.obj_val - ref.obj_val) < 1e-8


def test_update_indexed():
    P, q, A, b, cones = updating_qp()
    solver = cc.Solver(P, q, A, b, cones, presolve_enable=False)
    # P[0,0] <- 6.0 via (flat-index, value) pairs
    solver.update_P(([0], [6.0]))
    P2 = P.copy()
    P2[0, 0] = 6.0
    sol = solver.solve()
    ref = _fresh(P2, q, A, b, cones)
    assert abs(sol.obj_val - ref.obj_val) < 1e-8


def test_update_guard_with_presolve():
    P, q, A, b, cones = updating_qp()
    b = b.copy()
    b[3] = 1e21  # triggers presolve row elimination
    solver = cc.Solver(P, q, A, b, cones)
    assert not solver.is_data_update_allowed()
    with pytest.raises(ValueError):
        solver.update_q(q)


def test_update_dimension_errors():
    P, q, A, b, cones = updating_qp()
    solver = cc.Solver(P, q, A, b, cones, presolve_enable=False)
    with pytest.raises(ValueError):
        solver.update_q(np.ones(3))
    with pytest.raises(ValueError):
        solver.update_b(np.ones(4))
    with pytest.raises(ValueError):
        solver.update_A(np.ones((2, 2)))


def test_json_roundtrip(tmp_path):
    P, q, A, b, cones = updating_qp()
    solver = cc.Solver(P, q, A, b, cones, presolve_enable=False)
    ref = solver.solve()
    path = str(tmp_path / "problem.json")
    solver.save_to_file(path)

    solver2 = cc.Solver.load_from_file(path)
    sol = solver2.solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert abs(sol.obj_val - ref.obj_val) < 1e-8
    assert np.linalg.norm(sol.x - ref.x) < 1e-7


def test_json_roundtrip_all_cone_types(tmp_path):
    """Cone serialization covers every cone family."""
    from cuclarabel_tpu import json_io

    cones = [
        cc.ZeroConeT(2),
        cc.NonnegativeConeT(3),
        cc.SecondOrderConeT(4),
        cc.ExponentialConeT(),
        cc.PowerConeT(0.3),
        cc.GenPowerConeT([0.25, 0.75], 2),
        cc.PSDTriangleConeT(3),
    ]
    m = sum(cc.cones.api.nvars(c) for c in cones) if hasattr(cc, "cones") else 24
    lowered = [json_io._lower_cone(c) for c in cones]
    parsed = [json_io._parse_cone(d) for d in lowered]
    assert parsed == cones
