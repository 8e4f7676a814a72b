"""Gondzio multiple-centrality-corrector tests.

No reference counterpart (Clarabel.jl implements Mehrotra plus one
reduced correction only, solver.jl:295-311); these validate the
optional `centrality_correctors` extension: the corrector op's spectral
semantics per cone, and end-to-end equivalence of the converged
solutions with correctors on.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import cuclarabel_tpu as cc
from cuclarabel_tpu.cones import ops as cone_ops
from cuclarabel_tpu.cones.layout import build_layout

rng = np.random.default_rng(7151)


def _soc_interior(n, scale=1.0):
    v = rng.standard_normal(n) * scale
    v[0] = np.linalg.norm(v[1:]) + 1.0 * scale
    return v


# ---------------------------------------------------------------------------
# unit: centrality_correction spectral semantics
# ---------------------------------------------------------------------------


def test_correction_zero_inside_box_nn():
    layout = build_layout((cc.NonnegativeConeT(6),))
    s = jnp.asarray(rng.uniform(0.5, 2.0, 6))
    z = jnp.asarray(rng.uniform(0.5, 2.0, 6))
    mu = float(s @ z) / 6
    state, ok = cone_ops.update_scaling(layout, s, z, mu, 0)
    assert bool(ok)
    v = np.asarray(s) * np.asarray(z)
    corr = np.asarray(
        cone_ops.centrality_correction(
            layout, state, z, s, v.min() - 1.0, v.max() + 1.0
        )
    )
    assert np.all(corr == 0.0)
    # outliers: components above hi must be pulled back by exactly v-hi
    hi = float(np.median(v))
    corr = np.asarray(
        cone_ops.centrality_correction(layout, state, z, s, 0.0, hi)
    )
    expect = np.maximum(v - hi, 0.0)
    assert np.allclose(corr, expect, atol=1e-12)


def test_correction_soc_spectral_property():
    """After subtracting the correction, the Jordan eigenvalues of the
    scaled complementarity must lie inside [lo, hi]."""
    n = 5
    layout = build_layout((cc.SecondOrderConeT(n),))
    s = jnp.asarray(_soc_interior(n, 2.0))
    z = jnp.asarray(_soc_interior(n, 0.3))
    mu = float(s @ z) / 1.0
    state, ok = cone_ops.update_scaling(layout, s, z, mu, 0)
    assert bool(ok)

    Wz = cone_ops._soc_mul_W(layout, state["soc_eta"], state["soc_w"], z)
    Wis = cone_ops._soc_mul_Winv(layout, state["soc_eta"], state["soc_w"], s)
    u = np.asarray(cone_ops._soc_circ(layout, Wis, Wz))
    eig = np.array([u[0] + np.linalg.norm(u[1:]), u[0] - np.linalg.norm(u[1:])])
    lo, hi = float(eig.min()) * 1.5, float(eig.max()) * 0.7
    assert lo < hi

    corr = np.asarray(
        cone_ops.centrality_correction(layout, state, z, s, lo, hi)
    )
    u2 = u - corr
    eig2 = np.array(
        [u2[0] + np.linalg.norm(u2[1:]), u2[0] - np.linalg.norm(u2[1:])]
    )
    assert np.all(eig2 >= lo - 1e-10) and np.all(eig2 <= hi + 1e-10)
    # and the clipped eigenvalues are exactly clip(original)
    assert np.allclose(np.sort(eig2), np.sort(np.clip(eig, lo, hi)), atol=1e-10)


def test_correction_psd_spectral_property():
    d = 3
    layout = build_layout((cc.PSDTriangleConeT(d),))
    from cuclarabel_tpu.cones import psd as psd_ops

    def rand_spd():
        M = rng.standard_normal((d, d))
        return M @ M.T + 0.2 * np.eye(d)

    s = jnp.asarray(psd_ops.mat_to_svec(jnp.asarray(rand_spd()), d))
    z = jnp.asarray(psd_ops.mat_to_svec(jnp.asarray(rand_spd()), d))
    mu = float(s @ z) / d
    state, ok = cone_ops.update_scaling(layout, s, z, mu, 0)
    assert bool(ok)

    # scaled complementarity via the same R/Rinv transforms
    R = np.asarray(state[f"psd{d}_R"][0])
    Rinv = np.asarray(state[f"psd{d}_Rinv"][0])
    Z = np.asarray(psd_ops.svec_to_mat(z, d))
    S = np.asarray(psd_ops.svec_to_mat(s, d))
    Wz = R.T @ Z @ R
    Ws = Rinv @ S @ Rinv.T
    M = (Ws @ Wz + Wz @ Ws) / 2
    eig = np.linalg.eigvalsh(M)
    lo, hi = float(eig.min()) * 1.5, float(eig.max()) * 0.7
    assert lo < hi

    corr = np.asarray(
        cone_ops.centrality_correction(layout, state, z, s, lo, hi)
    )
    M2 = np.asarray(psd_ops.svec_to_mat(jnp.asarray(corr), d))
    eig2 = np.linalg.eigvalsh(M - M2)
    assert np.allclose(eig2, np.clip(eig, lo, hi), atol=1e-9)


# ---------------------------------------------------------------------------
# end-to-end: correctors preserve the converged solution
# ---------------------------------------------------------------------------


def _portfolio(n=30, seed=3):
    r = np.random.default_rng(seed)
    F = r.standard_normal((n, 6))
    P = 2 * (F @ F.T + 0.1 * np.eye(n))
    q = -r.standard_normal(n)
    A = np.vstack([np.ones((1, n)), -np.eye(n), np.eye(n)])
    b = np.concatenate([[1.0], np.zeros(n), 0.5 * np.ones(n)])
    return P, q, A, b, [cc.ZeroConeT(1), cc.NonnegativeConeT(2 * n)]


def test_e2e_qp_matches_and_does_not_regress():
    P, q, A, b, cones = _portfolio()
    base = cc.Solver(P, q, A, b, cones).solve()
    corr = cc.Solver(P, q, A, b, cones, centrality_correctors=2).solve()
    assert base.status.name == corr.status.name == "SOLVED"
    assert abs(base.obj_val - corr.obj_val) < 1e-7 * max(1, abs(base.obj_val))
    assert np.linalg.norm(base.x - corr.x, np.inf) < 1e-6
    assert corr.iterations <= base.iterations


def test_e2e_socp_with_correctors():
    # min t s.t. ||x|| <= t, sum x = 1
    n = 8
    q = np.zeros(n + 1)
    q[-1] = 1.0
    A_eq = np.zeros((1, n + 1))
    A_eq[0, :n] = 1.0
    A_soc = np.zeros((n + 1, n + 1))
    A_soc[0, -1] = -1.0
    A_soc[1:, :n] = -np.eye(n)
    A = np.vstack([A_eq, A_soc])
    b = np.concatenate([[1.0], np.zeros(n + 1)])
    cones = [cc.ZeroConeT(1), cc.SecondOrderConeT(n + 1)]
    base = cc.Solver(None, q, A, b, cones).solve()
    corr = cc.Solver(None, q, A, b, cones, centrality_correctors=3).solve()
    assert base.status.name == corr.status.name == "SOLVED"
    # optimum: x = 1/n, t = 1/sqrt(n)
    assert abs(corr.obj_val - 1.0 / np.sqrt(n)) < 1e-6
    assert corr.iterations <= base.iterations + 1


def test_e2e_sdp_with_correctors():
    # min tr(C X), tr(X) = 1, X psd (d=3)
    d = 3
    from cuclarabel_tpu.cones import psd as psd_ops

    Cm = rng.standard_normal((d, d))
    Cm = (Cm + Cm.T) / 2
    qv = np.asarray(psd_ops.mat_to_svec(jnp.asarray(Cm), d))
    nsv = d * (d + 1) // 2
    tr = np.asarray(psd_ops.mat_to_svec(jnp.asarray(np.eye(d)), d))
    A = np.vstack([tr[None, :], -np.eye(nsv)])
    b = np.concatenate([[1.0], np.zeros(nsv)])
    cones = [cc.ZeroConeT(1), cc.PSDTriangleConeT(d)]
    base = cc.Solver(None, qv, A, b, cones, chordal_decomposition_enable=False).solve()
    corr = cc.Solver(None, qv, A, b, cones, chordal_decomposition_enable=False,
                     centrality_correctors=2).solve()
    assert base.status.name == corr.status.name == "SOLVED"
    # optimum is the smallest eigenvalue of C
    lam_min = np.linalg.eigvalsh(Cm)[0]
    assert abs(corr.obj_val - lam_min) < 1e-6
    assert abs(base.obj_val - corr.obj_val) < 1e-7


def test_correctors_ignored_on_nonsymmetric():
    # exp-cone problem: correctors must be silently inactive (identical
    # iterates to the baseline)
    c = np.array([-1.0, 0.0, 1.0])
    A = np.vstack([np.array([[0.0, 1.0, 0.0]]), -np.eye(3)])
    b = np.concatenate([[1.0], np.zeros(3)])
    cones = [cc.ZeroConeT(1), cc.ExponentialConeT()]
    base = cc.Solver(None, c, A, b, cones).solve()
    corr = cc.Solver(None, c, A, b, cones, centrality_correctors=2).solve()
    assert base.status.name == corr.status.name
    assert base.iterations == corr.iterations
    assert np.allclose(base.x, corr.x, atol=1e-12)


def test_batch_correctors():
    from cuclarabel_tpu.parallel import BatchSolver

    P, q, A, b, cones = _portfolio()
    qs = np.stack([q, q * 1.05, q * 0.95, q * 1.1])
    bs = np.stack([b] * 4)
    base = BatchSolver(P, qs, A, bs, cones).solve()
    corr = BatchSolver(P, qs, A, bs, cones, centrality_correctors=2).solve()
    for s0, s2 in zip(base, corr):
        assert s0.status.name == s2.status.name == "SOLVED"
        assert abs(s0.obj_val - s2.obj_val) < 1e-6 * max(1, abs(s0.obj_val))
    assert max(s.iterations for s in corr) <= max(s.iterations for s in base)


def test_correctors_with_termination_machinery():
    """Correctors must not disturb the limit-exit classifications: the
    unreachable-tolerance case still downgrades to ALMOST_SOLVED and a
    1-iteration cap still reports MAX_ITERATIONS."""
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.vstack([np.array([[1.0, 1.0]]), np.eye(2), -np.eye(2)])
    b = np.array([1.0, 0.7, 0.7, 0.0, 0.0])
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(2), cc.NonnegativeConeT(2)]
    sol = cc.Solver(
        P, q, A, b, cones, centrality_correctors=2,
        tol_gap_abs=1e-300, tol_gap_rel=1e-300, tol_feas=1e-300,
    ).solve()
    assert sol.status == cc.SolverStatus.ALMOST_SOLVED
    assert abs(sol.obj_val - 1.88) < 1e-2
    sol = cc.Solver(
        P, q, A, b, cones, centrality_correctors=2, max_iter=1,
        reduced_tol_gap_abs=1e-300, reduced_tol_gap_rel=1e-300,
        reduced_tol_feas=1e-300,
    ).solve()
    assert sol.status == cc.SolverStatus.MAX_ITERATIONS


def test_settings_validation():
    with pytest.raises(ValueError):
        cc.Settings(centrality_correctors=-1).validate()
    with pytest.raises(ValueError):
        cc.Settings(corrector_beta_min=1.5).validate()
