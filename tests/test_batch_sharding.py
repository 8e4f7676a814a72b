"""Batched + sharded solve tests on the 8-virtual-device CPU mesh
(conftest.py sets xla_force_host_platform_device_count=8)."""

import numpy as np
import jax

import cuclarabel_tpu as cc
from cuclarabel_tpu.parallel import BatchSolver


def portfolio_batch(B=16, nass=8, seed=0):
    rng = np.random.default_rng(seed)
    n = nass + 1
    nfac = 3
    F = rng.standard_normal((nass, nfac))
    A_eq = np.zeros((1, n))
    A_eq[0, :nass] = 1.0
    A_nn = np.zeros((nass + 1, n))
    A_nn[:nass, :nass] = -np.eye(nass)
    A_nn[nass, nass] = -1.0
    A_soc = np.zeros((nfac + 1, n))
    A_soc[0, nass] = -1.0
    A_soc[1:, :nass] = -F.T
    A = np.vstack([A_eq, A_nn, A_soc])
    qs = np.zeros((B, n))
    bs = np.zeros((B, A.shape[0]))
    for i in range(B):
        qs[i] = np.concatenate([-rng.standard_normal(nass) * 0.1, [1.0]])
        bs[i, 0] = 1.0
    cones = [
        cc.ZeroConeT(1),
        cc.NonnegativeConeT(nass + 1),
        cc.SecondOrderConeT(nfac + 1),
    ]
    return A, qs, bs, cones


def test_batch_matches_single():
    A, qs, bs, cones = portfolio_batch(B=4)
    sols = BatchSolver(None, qs, A, bs, cones).solve()
    assert all(s.status == cc.SolverStatus.SOLVED for s in sols)
    for i in (0, 3):
        ref = cc.Solver(
            None, qs[i], A, bs[i], cones, presolve_enable=False
        ).solve()
        assert abs(ref.obj_val - sols[i].obj_val) < 1e-8
        assert np.linalg.norm(ref.x - sols[i].x) < 1e-6


def test_batch_sharded_8dev():
    assert len(jax.devices()) >= 8
    A, qs, bs, cones = portfolio_batch(B=16)
    sols = BatchSolver(None, qs, A, bs, cones, n_devices=8).solve()
    assert all(s.status == cc.SolverStatus.SOLVED for s in sols)
    # budget constraint holds for every scenario
    for s in sols:
        assert abs(s.x[:-1].sum() - 1.0) < 1e-6


def test_batched_varying_P_and_A():
    """Per-problem P and A values (same sparsity structure)."""
    rng = np.random.default_rng(1)
    B, nvar = 6, 5
    Ps, As, qs, bs = [], [], [], []
    for i in range(B):
        F = rng.standard_normal((nvar, nvar))
        Ps.append(F @ F.T + np.eye(nvar))
        As.append(np.vstack([np.ones((1, nvar)), -np.eye(nvar)]))
        qs.append(rng.standard_normal(nvar))
        bs.append(np.concatenate([[1.0], np.zeros(nvar)]))
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(nvar)]
    sols = BatchSolver(
        np.stack(Ps), np.stack(qs), np.stack(As), np.stack(bs), cones
    ).solve()
    for i, s in enumerate(sols):
        assert s.status == cc.SolverStatus.SOLVED
        ref = cc.Solver(
            Ps[i], qs[i], As[i], bs[i], cones, presolve_enable=False
        ).solve()
        assert abs(ref.obj_val - s.obj_val) < 1e-7


def test_batch_mixed_feasibility():
    """A batch mixing solvable and primal-infeasible problems must
    report per-problem statuses correctly (the vmapped while_loop keeps
    executing finished elements until the whole batch terminates, so
    terminal statuses must be stable under extra passes)."""
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.vstack([np.array([[1.0, 1.0]]), np.eye(2), -np.eye(2)])
    b_ok = np.array([1.0, 0.7, 0.7, 0.0, 0.0])
    b_inf = np.array([-1.0, 0.7, 0.7, -0.5, -0.5])  # infeasible bounds
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(2), cc.NonnegativeConeT(2)]
    sols = BatchSolver(
        P, np.stack([q, q, q]), A, np.stack([b_ok, b_inf, b_ok]), cones
    ).solve()
    assert sols[0].status == cc.SolverStatus.SOLVED
    assert sols[1].status == cc.SolverStatus.PRIMAL_INFEASIBLE
    assert sols[2].status == cc.SolverStatus.SOLVED
    assert abs(sols[0].obj_val - 1.88) < 1e-2
    assert np.isnan(sols[1].obj_val)


def test_batch_update_data_resolves():
    """BatchSolver.update_data swaps runtime arguments; the compiled
    batched program is reused for parametric scenario re-solves."""
    rng = np.random.default_rng(5)
    B, n = 6, 10
    F = rng.standard_normal((n, 4))
    P = F @ F.T + 0.5 * np.eye(n)
    A = np.vstack([np.ones((1, n)), -np.eye(n)])
    bs = np.tile(np.concatenate([[1.0], np.zeros(n)]), (B, 1))
    qs = rng.standard_normal((B, n))
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(n)]

    solver = BatchSolver(P, qs, A, bs, cones)
    solver.solve()

    qs2 = qs + 0.2 * rng.standard_normal((B, n))
    solver.update_data(q=qs2)
    sols = solver.solve()
    for i in range(B):
        ref = cc.Solver(P, qs2[i], A, bs[i], cones,
                        presolve_enable=False).solve()
        assert sols[i].status == cc.SolverStatus.SOLVED
        assert abs(sols[i].obj_val - ref.obj_val) < 1e-6

    import pytest
    with pytest.raises(ValueError, match="P is zero"):
        solver.update_data(P=np.zeros((n, n)))


def test_batch_dp_has_no_data_collectives():
    """The dp axis is embarrassingly parallel: the compiled 8-device
    batched program moves NO problem data between devices.  The only
    permitted collective is the scalar loop-termination consensus (the
    vmapped while_loop's OR-reduce over 'all problems done').  This is
    what makes batch scaling to more chips/hosts near-linear (BASELINE
    scaling-efficiency target — no communication to lose)."""
    import re

    import jax

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(11)
    B, n = 8, 6
    A = np.vstack([np.ones((1, n)), -np.eye(n)])
    bs = np.tile(np.concatenate([[1.0], np.zeros(n)]), (B, 1))
    qs = rng.standard_normal((B, n))
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(n)]
    solver = BatchSolver(None, qs, A, bs, cones, n_devices=8)
    import time as _time
    import jax.numpy as jnp
    txt = solver._fn.lower(
        *solver._args, jnp.asarray(_time.time())
    ).compile().as_text()
    for op in ("all-gather", "collective-permute", "reduce-scatter",
               "all-to-all"):
        assert op not in txt, f"unexpected {op} in dp program"
    # all-reduce only on tiny predicate/scalar tuples (loop consensus)
    for line in txt.splitlines():
        if "all-reduce" not in line:
            continue
        for dtype, dims in re.findall(
            r"(pred|f32|f64|s32|u32|s8|u8)\[([0-9,]*)\]", line
        ):
            nelem = 1
            for d in dims.split(","):
                if d:
                    nelem *= int(d)
            assert nelem <= 8, f"data-sized all-reduce: {line[:160]}"
    sols = solver.solve()
    assert all(s.status == cc.SolverStatus.SOLVED for s in sols)
