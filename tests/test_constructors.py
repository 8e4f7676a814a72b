"""Solver construction and input-validation tests (parity with
reference test/UnitTests/test_constructors.jl)."""

import numpy as np
import pytest

import cuclarabel_tpu as cc


def _base():
    P = np.eye(2)
    q = np.zeros(2)
    A = -np.eye(2)
    b = np.zeros(2)
    return P, q, A, b, [cc.NonnegativeConeT(2)]


def test_dimension_mismatches():
    P, q, A, b, cones = _base()
    with pytest.raises(ValueError):
        cc.Solver(P, np.zeros(3), A, b, cones)  # q wrong length
    with pytest.raises(ValueError):
        cc.Solver(P, q, A, np.zeros(3), cones)  # b/A mismatch
    with pytest.raises(ValueError):
        cc.Solver(P, q, A, b, [cc.NonnegativeConeT(3)])  # cone dim != m
    with pytest.raises(ValueError):
        cc.Solver(np.eye(3), q, A, b, cones)  # P wrong shape


def test_bad_cone_parameters():
    with pytest.raises(ValueError):
        cc.PowerConeT(0.0)
    with pytest.raises(ValueError):
        cc.PowerConeT(1.0)
    with pytest.raises(ValueError):
        cc.GenPowerConeT([0.5, 0.6], 1)  # alpha doesn't sum to 1
    with pytest.raises(ValueError):
        cc.GenPowerConeT([-0.5, 1.5], 1)  # negative entry


def test_bad_settings():
    P, q, A, b, cones = _base()
    with pytest.raises(ValueError):
        cc.Solver(P, q, A, b, cones, max_iter=-1)
    with pytest.raises(ValueError):
        cc.Solver(P, q, A, b, cones, kkt_factor_precision="float16")
    with pytest.raises(ValueError):
        cc.Solver(P, q, A, b, cones, direct_solve_method="nope")
    with pytest.raises(ValueError):
        cc.Settings.from_dict({"not_a_setting": 1})


def test_reference_settings_names_all_accepted():
    """Every field of the reference Settings{T} kwdef struct
    (src/settings.jl:70-148) is an accepted key here, so settings
    dicts/JSON written against the reference load unchanged.  The
    Pardiso fields and direct_kkt_solver are compat-only (see
    settings.py); nothing is silently dropped by from_dict."""
    ref_names = [
        "max_iter", "time_limit", "verbose", "max_step_fraction",
        "tol_gap_abs", "tol_gap_rel", "tol_feas",
        "tol_infeas_abs", "tol_infeas_rel", "tol_ktratio",
        "reduced_tol_gap_abs", "reduced_tol_gap_rel", "reduced_tol_feas",
        "reduced_tol_infeas_abs", "reduced_tol_infeas_rel",
        "reduced_tol_ktratio",
        "equilibrate_enable", "equilibrate_max_iter",
        "equilibrate_min_scaling", "equilibrate_max_scaling",
        "linesearch_backtrack_step", "min_switch_step_length",
        "min_terminate_step_length",
        "direct_kkt_solver", "direct_solve_method", "max_threads",
        "static_regularization_enable", "static_regularization_constant",
        "static_regularization_proportional",
        "dynamic_regularization_enable", "dynamic_regularization_eps",
        "dynamic_regularization_delta",
        "iterative_refinement_enable", "iterative_refinement_reltol",
        "iterative_refinement_abstol", "iterative_refinement_max_iter",
        "iterative_refinement_stop_ratio",
        "presolve_enable", "input_sparse_dropzeros",
        "chordal_decomposition_enable",
        "chordal_decomposition_merge_method",
        "chordal_decomposition_compact",
        "chordal_decomposition_complete_dual",
        "pardiso_iparm", "pardiso_verbose",
    ]
    defaults = cc.Settings()
    d = {n: getattr(defaults, n) for n in ref_names}  # KeyError if missing
    s = cc.Settings.from_dict(d)
    assert s == defaults
    # pardiso fields accepted (list coerced to hashable tuple) but warn
    s2 = cc.Settings.from_dict({"pardiso_iparm": [0] * 64})
    with pytest.warns(UserWarning, match="Pardiso"):
        s2.validate()
    hash(s2)
    # the reference itself rejects indirect solvers (settings.jl:113)
    with pytest.raises(ValueError):
        cc.Settings(direct_kkt_solver=False).validate()


def test_scipy_sparse_inputs():
    import scipy.sparse as sp

    P, q, A, b, cones = _base()
    sol = cc.Solver(
        sp.csc_matrix(P + np.eye(2)), q + 1.0, sp.csr_matrix(A), b, cones
    ).solve()
    assert sol.status == cc.SolverStatus.SOLVED


def test_none_P_and_empty_cones():
    q = np.array([1.0, 1.0])
    A = np.zeros((0, 2))
    b = np.zeros(0)
    # unconstrained with no P is dual infeasible
    sol = cc.Solver(None, q, A, b, []).solve()
    assert sol.status == cc.SolverStatus.DUAL_INFEASIBLE
