"""JSON I/O round-trip + reference-schema cross-compat tests
(test/UnitTests/test_json.jl parity).

The fixture `fixtures/ref_qp.json` is written in the exact schema the
reference's `save_to_file` emits (src/json.jl:116-154): 0-based CSC
matrices, single-key cone dicts, settings with the reference's own field
names (including Julia-only fields such as `pardiso_iparm`, which the
loader must ignore) and Inf sanitized to floatmax.
"""

import os

import numpy as np
import pytest

from cuclarabel_tpu import json_io
from cuclarabel_tpu.cones import api
from cuclarabel_tpu.settings import Settings
from cuclarabel_tpu.solver import Solver
from cuclarabel_tpu.statuscodes import SolverStatus

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _json_qp():
    """The reference's json-test problem (test_json.jl:4-12)."""
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    b = np.array([1.0, 1.0, 1.0])
    cones = [
        api.NonnegativeConeT(1),
        api.ZeroConeT(1),
        api.NonnegativeConeT(1),
    ]
    return P, q, A, b, cones


def test_round_trip_resolve(tmp_path):
    """save -> load -> re-solve gives the identical solution
    (test_json.jl:16-25)."""
    P, q, A, b, cones = _json_qp()
    solver = Solver(P, q, A, b, cones)
    path = str(tmp_path / "problem.json")
    solver.save_to_file(path)

    solver2 = Solver.load_from_file(path)
    s1 = solver.solve()
    s2 = solver2.solve()
    assert s1.status == SolverStatus.SOLVED
    assert s2.status == s1.status
    np.testing.assert_allclose(s2.x, s1.x, atol=1e-10)
    assert np.isclose(s2.obj_val, s1.obj_val, atol=1e-10)


def test_load_with_custom_settings(tmp_path):
    """Loading with explicit settings overrides the stored ones
    (test_json.jl:28-33)."""
    P, q, A, b, cones = _json_qp()
    Solver(P, q, A, b, cones).save_to_file(str(tmp_path / "p.json"))
    s = Settings(max_iter=1)
    solver3 = Solver.load_from_file(str(tmp_path / "p.json"), settings=s)
    sol = solver3.solve()
    assert sol.status == SolverStatus.MAX_ITERATIONS
    assert sol.iterations == 1


def test_reference_fixture_loads_and_solves():
    """A file in the reference's exact schema loads and solves; the
    result matches solving the same arrays passed directly."""
    path = os.path.join(FIXTURES, "ref_qp.json")
    solver = Solver.load_from_file(path)
    sol = solver.solve()
    assert sol.status == SolverStatus.SOLVED

    P, q, A, b, cones = _json_qp()
    ref = Solver(P, q, A, b, cones).solve()
    np.testing.assert_allclose(sol.x, ref.x, atol=1e-9)
    assert np.isclose(sol.obj_val, ref.obj_val, atol=1e-9)


def test_reference_fixture_settings_parsed():
    """Shared fields load; the sanitized floatmax comes back as inf
    (json.jl:92-110 semantics); reference-only Pardiso fields are
    retained as compat fields (hashable tuple) rather than dropped."""
    path = os.path.join(FIXTURES, "ref_qp.json")
    _, _, _, _, _, settings = json_io.load_problem(path)
    assert settings.max_iter == 200
    assert settings.iterative_refinement_stop_ratio == 5.0
    assert settings.time_limit == float("inf")
    assert isinstance(settings.pardiso_iparm, (tuple, type(None)))
    hash(settings)


def test_settings_inf_sanitize_round_trip(tmp_path):
    """inf -> floatmax on save, floatmax -> inf on load."""
    P, q, A, b, cones = _json_qp()
    s = Settings(time_limit=float("inf"))
    solver = Solver(P, q, A, b, cones, settings=s)
    path = str(tmp_path / "p.json")
    solver.save_to_file(path)
    import json as _json

    with open(path) as f:
        doc = _json.load(f)
    assert doc["settings"]["time_limit"] == float(np.finfo(np.float64).max)
    _, _, _, _, _, s2 = json_io.load_problem(path)
    assert s2.time_limit == float("inf")


def test_all_cone_types_round_trip():
    """Every SupportedCone serializes to the reference's single-key dict
    form and parses back (json.jl:140-154, 187-209)."""
    cones = [
        api.ZeroConeT(2),
        api.NonnegativeConeT(3),
        api.SecondOrderConeT(4),
        api.PSDTriangleConeT(3),
        api.ExponentialConeT(),
        api.PowerConeT(0.6),
        api.GenPowerConeT([0.3, 0.7], 2),
    ]
    lowered = [json_io._lower_cone(c) for c in cones]
    assert lowered[0] == {"ZeroConeT": 2}
    assert lowered[4] == {"ExponentialConeT": []}
    assert lowered[5] == {"PowerConeT": 0.6}
    assert lowered[6] == {"GenPowerConeT": [[0.3, 0.7], 2]}
    parsed = [json_io._parse_cone(d) for d in lowered]
    for c, p in zip(cones, parsed):
        assert type(c) is type(p)
        assert api.nvars(c) == api.nvars(p)


def test_csc_zero_row_matrix(tmp_path):
    """A problem with an all-zero P still round-trips (structural empty
    CSC columns)."""
    q = np.array([1.0, 2.0])
    A = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    b = np.ones(4)
    cones = [api.NonnegativeConeT(4)]
    solver = Solver(None, q, A, b, cones)
    path = str(tmp_path / "lp.json")
    solver.save_to_file(path)
    solver2 = Solver.load_from_file(path)
    s1, s2 = solver.solve(), solver2.solve()
    assert s1.status == s2.status == SolverStatus.SOLVED
    np.testing.assert_allclose(s2.x, s1.x, atol=1e-10)
