"""time_limit -> MAX_TIME enforcement inside the fused loop
(settings.jl:73, info.jl:110-115 semantics)."""

import numpy as np
import pytest

from cuclarabel_tpu.cones import api
from cuclarabel_tpu.parallel import BatchSolver
from cuclarabel_tpu.settings import Settings
from cuclarabel_tpu.solver import Solver
from cuclarabel_tpu.statuscodes import SolverStatus


def _qp():
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    b = np.array([1.0, 1.0, 1.0])
    cones = [api.NonnegativeConeT(1), api.ZeroConeT(1), api.NonnegativeConeT(1)]
    return P, q, A, b, cones


def test_max_time_single():
    P, q, A, b, cones = _qp()
    sol = Solver(P, q, A, b, cones, time_limit=1e-9).solve()
    assert sol.status == SolverStatus.MAX_TIME
    assert sol.iterations == 0


def test_infinite_limit_unaffected():
    P, q, A, b, cones = _qp()
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED


def test_generous_limit_solves():
    P, q, A, b, cones = _qp()
    sol = Solver(P, q, A, b, cones, time_limit=300.0).solve()
    assert sol.status == SolverStatus.SOLVED


def test_max_time_batched():
    P, q, A, b, cones = _qp()
    B = 4
    qb = np.broadcast_to(q, (B, 2)).copy()
    bb = np.broadcast_to(b, (B, 3)).copy()
    sols = BatchSolver(P, qb, A, bb, cones, time_limit=1e-9).solve()
    assert all(s.status == SolverStatus.MAX_TIME for s in sols)


def test_max_time_sparse():
    import scipy.sparse as sp

    P, q, A, b, cones = _qp()
    from cuclarabel_tpu.sparse_solver import SparseSolver

    sol = SparseSolver(sp.csc_matrix(P), q, sp.csc_matrix(A), b, cones,
                       time_limit=1e-9).solve()
    assert sol.status == SolverStatus.MAX_TIME
    assert sol.iterations == 0


def test_max_time_batch_sparse():
    # the t_start wiring through BatchSparseSolver (info.jl:110-115
    # semantics through the vmapped sparse path) — VERDICT r3 #9
    import scipy.sparse as sp

    from cuclarabel_tpu.parallel import BatchSparseSolver

    P, q, A, b, cones = _qp()
    B = 3
    qb = np.broadcast_to(q, (B, 2)).copy()
    bb = np.broadcast_to(b, (B, 3)).copy()
    sols = BatchSparseSolver(sp.csc_matrix(P), qb, sp.csc_matrix(A), bb,
                             cones, time_limit=1e-9).solve()
    assert all(s.status == SolverStatus.MAX_TIME for s in sols)


def test_max_time_generous_batch_sparse_solves():
    import scipy.sparse as sp

    from cuclarabel_tpu.parallel import BatchSparseSolver

    P, q, A, b, cones = _qp()
    B = 3
    qb = np.broadcast_to(q, (B, 2)).copy()
    bb = np.broadcast_to(b, (B, 3)).copy()
    sols = BatchSparseSolver(sp.csc_matrix(P), qb, sp.csc_matrix(A), bb,
                             cones, time_limit=300.0).solve()
    assert all(s.status == SolverStatus.SOLVED for s in sols)


def test_max_threads_accepted_silently():
    # max_threads is honored (level-parallel native LDL refactorization,
    # native/ldl.cpp) — the old "accepted for compat, no effect" warning
    # must be gone and the setting must propagate
    import warnings

    P, q, A, b, cones = _qp()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        s = Solver(P, q, A, b, cones, max_threads=4)
    assert s.settings.max_threads == 4
