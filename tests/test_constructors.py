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
