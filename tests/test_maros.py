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


@pytest.mark.parametrize("make", PROBLEMS, ids=lambda f: f.__name__)
def test_maros_dense(make):
    p = make()
    sol = cc.Solver(p.P, p.q, p.A, p.b, p.cones).solve()
    assert sol.status == cc.SolverStatus.SOLVED, p.name
    obj = sol.obj_val + p.obj_const
    assert obj == pytest.approx(p.obj_golden, abs=2e-6, rel=1e-8), p.name


@pytest.mark.parametrize("make", PROBLEMS, ids=lambda f: f.__name__)
def test_maros_sparse(make):
    from cuclarabel_tpu.sparse_solver import SparseSolver

    p = make()
    sol = SparseSolver(
        sp.csc_matrix(np.triu(p.P)), p.q, sp.csc_matrix(p.A), p.b, p.cones
    ).solve()
    assert sol.status == cc.SolverStatus.SOLVED, p.name
    obj = sol.obj_val + p.obj_const
    assert obj == pytest.approx(p.obj_golden, abs=2e-6, rel=1e-8), p.name
