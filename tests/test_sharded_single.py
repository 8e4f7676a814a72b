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


def test_sharded_exp_pow_matches_single():
    """Nonsymmetric cones through the TP path: the arrow-TP KKT keeps
    exp/pow rows as explicit saddle unknowns (kkt/arrow.py), and the
    BFGS dual scaling + backtracking run under the sharded jit.  A
    mixed exp+pow+NN problem on the 8-device mesh must match the
    single-device solve (reference behavior coneops_expcone.jl /
    coneops_powcone.jl through solver.jl's loop)."""
    rng = np.random.default_rng(11)
    n = 12
    # min q'x st sum x = 1, x free-ish caps, (x0,x1,x2) in Kexp,
    # (x3,x4,x5) in Kpow(0.4), rest NN
    q = rng.standard_normal(n) * 0.3
    A_eq = np.ones((1, n))
    b_eq = np.array([1.0])
    A_exp = np.zeros((3, n)); A_exp[:, 0:3] = -np.eye(3)
    A_pow = np.zeros((3, n)); A_pow[:, 3:6] = -np.eye(3)
    A_nn = np.zeros((n - 6, n)); A_nn[:, 6:] = -np.eye(n - 6)
    A_cap = np.eye(n)
    A = np.vstack([A_eq, A_cap, A_exp, A_pow, A_nn])
    b = np.concatenate([b_eq, np.full(n, 2.0), np.zeros(3), np.zeros(3),
                        np.zeros(n - 6)])
    cones = [
        cc.ZeroConeT(1), cc.NonnegativeConeT(n), cc.ExponentialConeT(),
        cc.PowerConeT(0.4), cc.NonnegativeConeT(n - 6),
    ]
    ref = cc.Solver(None, q, A, b, cones, presolve_enable=False).solve()
    assert ref.status == cc.SolverStatus.SOLVED
    sol = ShardedSolver(None, q, A, b, cones, n_devices=8).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert abs(sol.obj_val - ref.obj_val) < 1e-6


def test_sharded_psd_matches_single():
    """PSD-triangle cone through the TP path (svec rows sharded over
    the mesh; eigh-based NT scaling under the sharded jit)."""
    rng = np.random.default_rng(5)
    d = 4
    nsv = d * (d + 1) // 2

    def svec(M):
        out = []
        for j in range(d):
            for i in range(j + 1):
                out.append(M[i, j] * (1.0 if i == j else np.sqrt(2.0)))
        return np.array(out)

    Cm = rng.standard_normal((d, d))
    Cm = (Cm + Cm.T) / 2
    q = svec(Cm)
    A = np.vstack([svec(np.eye(d))[None, :], -np.eye(nsv)])
    b = np.concatenate([[1.0], np.zeros(nsv)])
    cones = [cc.ZeroConeT(1), cc.PSDTriangleConeT(d)]
    ref = cc.Solver(None, q, A, b, cones, presolve_enable=False).solve()
    sol = ShardedSolver(None, q, A, b, cones, n_devices=8).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert abs(sol.obj_val - ref.obj_val) < 1e-7
    assert abs(sol.obj_val - np.linalg.eigvalsh(Cm)[0]) < 1e-7
