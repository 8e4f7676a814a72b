"""Tensor-parallel single-problem solving on the 8-virtual-device CPU
mesh: the KKT operator's constraint dimension shards over the mesh and
XLA inserts the collectives (GSPMD)."""

import numpy as np
import jax

import cuclarabel_tpu as cc
from cuclarabel_tpu.parallel import ShardedSolver


def make_problem(n=40, seed=0):
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((n, 8))
    P = F @ F.T + 0.1 * np.eye(n)
    q = rng.standard_normal(n)
    meq = 8
    Aeq = rng.standard_normal((meq, n))
    beq = Aeq @ rng.standard_normal(n)
    nfac = 7
    Fs = rng.standard_normal((n, nfac))
    A_soc = np.zeros((nfac + 1, n))
    A_soc[1:, :] = -Fs.T
    b_soc = np.zeros(nfac + 1)
    b_soc[0] = 3.0
    A = np.vstack([Aeq, -np.eye(n), A_soc])
    b = np.concatenate([beq, np.zeros(n) + 3.0, b_soc])
    cones = [
        cc.ZeroConeT(meq),
        cc.NonnegativeConeT(n),
        cc.SecondOrderConeT(nfac + 1),
    ]
    return P, q, A, b, cones


def test_sharded_matches_single_device():
    assert len(jax.devices()) >= 8
    P, q, A, b, cones = make_problem()
    ref = cc.Solver(P, q, A, b, cones, presolve_enable=False).solve()
    sol = ShardedSolver(P, q, A, b, cones, n_devices=8).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert abs(sol.obj_val - ref.obj_val) < 1e-8
    # row repacking (shard alignment) changes the equilibration and
    # iterate path; x agreement is bounded by cond * tol, not tol
    assert np.linalg.norm(sol.x - ref.x) < 1e-5


def test_sharded_compiles_with_collectives():
    P, q, A, b, cones = make_problem(seed=1)
    sh = ShardedSolver(P, q, A, b, cones, n_devices=8)
    txt = sh._fn.lower(sh._dev).compile().as_text()
    assert txt.count("all-reduce") + txt.count("all-gather") > 0


def test_sharded_pads_nondivisible_m():
    """m not divisible by the mesh gets padded with inert NN rows; the
    returned s/z are stripped back to the original length."""
    P, q, A, b, cones = make_problem(n=30, seed=2)
    m = b.shape[0]
    ref = cc.Solver(P, q, A, b, cones, presolve_enable=False).solve()
    sol = ShardedSolver(P, q, A, b, cones, n_devices=8).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert len(sol.s) == m and len(sol.z) == m
    # padding perturbs the equilibration slightly; both solves are at
    # the 1e-8 gap tolerance so compare at 1e-6
    assert abs(sol.obj_val - ref.obj_val) < 1e-6


def test_sharded_update_data_resolves():
    """update_data re-applies the stored equilibration and row packing
    and re-solves without recompiling (data_updating.jl semantics)."""
    P, q, A, b, cones = make_problem(seed=3)
    sh = ShardedSolver(P, q, A, b, cones, n_devices=8)
    sh.solve()

    rng = np.random.default_rng(7)
    q2 = q + 0.1 * rng.standard_normal(q.shape[0])
    b2 = b.copy()
    b2[-8] = 4.0  # loosen the SOC radius row
    sh.update_data(q=q2, b=b2)
    sol = sh.solve()
    ref = cc.Solver(P, q2, A, b2, cones, presolve_enable=False).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert abs(sol.obj_val - ref.obj_val) < 1e-6
    np.testing.assert_allclose(sol.x, ref.x, atol=1e-5)

    # matrix updates too (same pattern; values scaled)
    P2 = P * 1.5
    A2 = A.copy()
    A2[:8] *= 1.1  # scale the equality rows
    b2b = b2.copy()
    b2b[:8] *= 1.1
    sh.update_data(P=P2, A=A2, b=b2b)
    sol2 = sh.solve()
    ref2 = cc.Solver(P2, q2, A2, b2b, cones, presolve_enable=False).solve()
    assert sol2.status == cc.SolverStatus.SOLVED
    assert abs(sol2.obj_val - ref2.obj_val) < 1e-6
