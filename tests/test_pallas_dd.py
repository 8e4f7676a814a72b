"""Double-float Pallas KKT engine: accuracy against numpy f64.

Interpret mode on CPU; the same assertions run compiled on real TPU via
scripts/tpu_dd_check.py (error-free transformations depend on strict
IEEE f32 — a fast-math compiler would break them, so the compiled check
matters)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from cuclarabel_tpu.kkt.pallas_dd import (
    dd_ldl_factor,
    dd_ldl_solve,
    dd_residual,
    join_f64,
    split_f64,
)


def _make_qd(rng, B, n, m, spread=4.0):
    """Batch of statically-regularizable quasidefinite KKT matrices with
    an Hs diagonal spanning 10^±spread (late-IPM conditioning)."""
    N = n + m
    A = rng.standard_normal((B, m, n))
    Pd = np.zeros((B, n, n))
    for i in range(B):
        G = rng.standard_normal((n, n)) / np.sqrt(n)
        Pd[i] = G @ G.T
    Hs = 10.0 ** rng.uniform(-spread, spread, (B, m))
    K = np.zeros((B, N, N))
    K[:, :n, :n] = Pd
    K[:, :n, n:] = np.transpose(A, (0, 2, 1))
    K[:, n:, :n] = A
    K[:, n:, n:] = -np.einsum("bi,ij->bij", Hs, np.eye(m))
    return K


def _lane(x):  # (B, ...) -> (..., B)
    return jnp.moveaxis(jnp.asarray(x), 0, -1)


def _unlane(x):  # (..., B) -> (B, ...)
    return np.moveaxis(np.asarray(x), -1, 0)


def test_split_join_roundtrip():
    x = np.array([1.0, np.pi, 1e12 + 0.125, -3e-20, 0.0])
    hi, lo = split_f64(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(join_f64(hi, lo)), x, rtol=3e-15)


def test_dd_factor_solve_accuracy():
    rng = np.random.default_rng(0)
    B, n, m = 7, 11, 14
    N = n + m
    K = _make_qd(rng, B, n, m)
    eps = 1e-8
    dsigns = np.concatenate([np.ones(n), -np.ones(m)])
    b = rng.standard_normal((B, N))

    Kh, Kl = split_f64(_lane(K))
    regT = jnp.broadcast_to(jnp.asarray(dsigns * eps)[:, None], (N, B))
    Lh, Ll, Dh, Dl = dd_ldl_factor(Kh, Kl, regT.astype(jnp.float32),
                                   interpret=True)
    bh, bl = split_f64(_lane(b))
    xh, xl = dd_ldl_solve(Lh, Ll, Dh, Dl, bh, bl, interpret=True)
    x = _unlane(join_f64(xh, xl))

    Kreg = K + (dsigns * eps) * np.eye(N)
    x_ref = np.linalg.solve(Kreg, b[..., None])[..., 0]
    err = np.abs(x - x_ref).max() / max(np.abs(x_ref).max(), 1.0)
    # cond(K) ~ 1e8 here; dd (~2^-48) leaves ~1e-10 headroom vs the f64
    # reference, which itself carries cond*eps64 error
    assert err < 1e-9, err


def test_dd_blocked_variants_match_plain():
    """Blocked-panel factor and substitution (block=) are the same dd
    op sets under reordered summation trees: solutions must agree with
    the plain kernels to dd accuracy, for panel widths straddling the
    matrix size."""
    rng = np.random.default_rng(7)
    B, n, m = 5, 9, 12
    N = n + m
    K = _make_qd(rng, B, n, m)
    eps = 1e-8
    dsigns = np.concatenate([np.ones(n), -np.ones(m)])
    b = rng.standard_normal((B, N))

    Kh, Kl = split_f64(_lane(K))
    regT = jnp.broadcast_to(
        jnp.asarray(dsigns * eps)[:, None], (N, B)).astype(jnp.float32)
    bh, bl = split_f64(_lane(b))

    Kreg = K + (dsigns * eps) * np.eye(N)
    x_ref = np.linalg.solve(Kreg, b[..., None])[..., 0]
    scale = max(np.abs(x_ref).max(), 1.0)

    for fblk in (0, 4, 8):
        Lh, Ll, Dh, Dl = dd_ldl_factor(Kh, Kl, regT, interpret=True,
                                       block=fblk)
        for sblk in (0, 4, 8, N + 5):  # N+5 > N-1 disables blocking
            xh, xl = dd_ldl_solve(Lh, Ll, Dh, Dl, bh, bl,
                                  interpret=True, block=sblk)
            x = _unlane(join_f64(xh, xl))
            err = np.abs(x - x_ref).max() / scale
            assert err < 1e-9, (fblk, sblk, err)


def test_dd_presplit_factor_matches_plain():
    """Pre-split rank-p factor (_ldl_kernel_ps): hoisted Dekker splits
    + fused rank-p accumulation are the same error class as the plain
    dd chain — solutions through its factors must reach dd accuracy for
    ranks straddling the matrix size, including badly-scaled Hs."""
    rng = np.random.default_rng(11)
    B, n, m = 5, 9, 12
    N = n + m
    K = _make_qd(rng, B, n, m, spread=6.0)
    eps = 1e-8
    dsigns = np.concatenate([np.ones(n), -np.ones(m)])
    b = rng.standard_normal((B, N))

    Kh, Kl = split_f64(_lane(K))
    regT = jnp.broadcast_to(
        jnp.asarray(dsigns * eps)[:, None], (N, B)).astype(jnp.float32)
    bh, bl = split_f64(_lane(b))

    Kreg = K + (dsigns * eps) * np.eye(N)
    x_ref = np.linalg.solve(Kreg, b[..., None])[..., 0]
    scale = max(np.abs(x_ref).max(), 1.0)

    for ps in (1, 2, 3, 4, 8, N + 5):
        Lh, Ll, Dh, Dl = dd_ldl_factor(Kh, Kl, regT, interpret=True,
                                       ps=ps)
        xh, xl = dd_ldl_solve(Lh, Ll, Dh, Dl, bh, bl, interpret=True)
        x = _unlane(join_f64(xh, xl))
        err = np.abs(x - x_ref).max() / scale
        assert err < 1e-9, (ps, err)
        # the factor itself must match the plain kernel's to dd grade
        Lh0, Ll0, Dh0, Dl0 = dd_ldl_factor(Kh, Kl, regT, interpret=True,
                                           ps=0, block=0)
        L = np.tril(_unlane(join_f64(Lh, Ll)), -1)
        L0 = np.tril(_unlane(join_f64(Lh0, Ll0)), -1)
        assert np.abs(L - L0).max() < 1e-10 * max(np.abs(L0).max(), 1.0)


def test_dd_residual_accuracy():
    rng = np.random.default_rng(1)
    B, n, m = 5, 8, 9
    N = n + m
    K = _make_qd(rng, B, n, m, spread=2.0)
    b = rng.standard_normal((B, N))
    x = rng.standard_normal((B, N)) * 1e3

    Kh, Kl = split_f64(_lane(K))
    bh, bl = split_f64(_lane(b))
    xh, xl = split_f64(_lane(x))
    rh, rl = dd_residual(Kh, Kl, xh, xl, bh, bl, interpret=True)
    r = _unlane(join_f64(rh, rl))

    r_ref = b - np.einsum("bij,bj->bi", K, x)
    scale = np.abs(np.einsum("bij,bj->bi", np.abs(K), np.abs(x))).max()
    assert np.abs(r - r_ref).max() / scale < 1e-13


def test_dd_solve_ill_conditioned():
    """The motivating case: cond(K) ~ 1e8 where a plain f32 factor
    stalls refinement.  dd factors must hit ~1e-10 directly."""
    rng = np.random.default_rng(2)
    B, n, m = 4, 6, 10
    N = n + m
    K = _make_qd(rng, B, n, m, spread=6.0)
    eps = 1e-8
    dsigns = np.concatenate([np.ones(n), -np.ones(m)])
    b = rng.standard_normal((B, N))

    Kh, Kl = split_f64(_lane(K))
    regT = jnp.broadcast_to(jnp.asarray(dsigns * eps)[:, None], (N, B))
    Lh, Ll, Dh, Dl = dd_ldl_factor(Kh, Kl, regT.astype(jnp.float32),
                                   interpret=True)
    bh, bl = split_f64(_lane(b))
    xh, xl = dd_ldl_solve(Lh, Ll, Dh, Dl, bh, bl, interpret=True)
    x = _unlane(join_f64(xh, xl))

    Kreg = K + (dsigns * eps) * np.eye(N)
    res = b - np.einsum("bij,bj->bi", Kreg, x)
    relres = np.abs(res).max() / np.abs(b).max()
    assert relres < 1e-9, relres


def test_dd_batch_padding():
    """Non-multiple-of-128 batch sizes pad transparently."""
    rng = np.random.default_rng(3)
    B, n, m = 3, 4, 5
    N = n + m
    K = _make_qd(rng, B, n, m, spread=1.0)
    b = rng.standard_normal((B, N))
    dsigns = np.concatenate([np.ones(n), -np.ones(m)])
    Kh, Kl = split_f64(_lane(K))
    regT = jnp.broadcast_to(jnp.asarray(dsigns * 1e-8)[:, None], (N, B))
    Lh, Ll, Dh, Dl = dd_ldl_factor(Kh, Kl, regT.astype(jnp.float32),
                                   interpret=True)
    assert Lh.shape == (N, N, B)
    bh, bl = split_f64(_lane(b))
    xh, xl = dd_ldl_solve(Lh, Ll, Dh, Dl, bh, bl, interpret=True)
    assert xh.shape == (N, B)


# ---------------------------------------------------------------------
# end-to-end through the solver (interpret mode on CPU)
# ---------------------------------------------------------------------

def _qp():
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    b = np.array([1.0, 1.0, 1.0])
    from cuclarabel_tpu.cones import api
    cones = [api.NonnegativeConeT(1), api.ZeroConeT(1),
             api.NonnegativeConeT(1)]
    return P, q, A, b, cones


def test_dd_solver_end_to_end():
    from cuclarabel_tpu.solver import Solver
    from cuclarabel_tpu.statuscodes import SolverStatus

    P, q, A, b, cones = _qp()
    s_dd = Solver(P, q, A, b, cones, kkt_solve_method="pallas").solve()
    s_ref = Solver(P, q, A, b, cones).solve()
    assert s_dd.status == SolverStatus.SOLVED
    np.testing.assert_allclose(s_dd.x, s_ref.x, atol=1e-9)
    assert abs(s_dd.obj_val - s_ref.obj_val) < 1e-9


def test_dd_solver_batched_matches_single():
    from cuclarabel_tpu.parallel import BatchSolver
    from cuclarabel_tpu.solver import Solver
    from cuclarabel_tpu.statuscodes import SolverStatus

    P, q, A, b, cones = _qp()
    B = 3
    rng = np.random.default_rng(0)
    qb = np.broadcast_to(q, (B, 2)) + 0.1 * rng.standard_normal((B, 2))
    bb = np.broadcast_to(b, (B, 3)).copy()
    sols = BatchSolver(P, qb, A, bb, cones,
                       kkt_solve_method="pallas").solve()
    for i, s in enumerate(sols):
        assert s.status == SolverStatus.SOLVED
        ref = Solver(P, qb[i], A, bb[i], cones,
                     equilibrate_enable=True,
                     presolve_enable=False).solve()
        np.testing.assert_allclose(s.x, ref.x, atol=1e-7)


def test_dd_solver_socp():
    """SOC cone through the dd KKT path (portfolio-style)."""
    from cuclarabel_tpu.cones import api
    from cuclarabel_tpu.solver import Solver
    from cuclarabel_tpu.statuscodes import SolverStatus

    # min -mu'w s.t. sum w = 1, w >= 0, ||G w|| <= gamma
    rng = np.random.default_rng(1)
    n = 6
    G = rng.standard_normal((4, n)) / 4.0
    mu = rng.random(n)
    gamma = 0.3
    q = -mu
    A = np.vstack([
        np.ones((1, n)),          # Zero: sum = 1
        -np.eye(n),               # NN:   w >= 0
        np.zeros((1, n)),         # SOC t row
        -G,                       # SOC vec rows
    ])
    b = np.concatenate([[1.0], np.zeros(n), [gamma], np.zeros(4)])
    cones = [api.ZeroConeT(1), api.NonnegativeConeT(n),
             api.SecondOrderConeT(5)]
    sol = Solver(None, q, A, b, cones, kkt_solve_method="pallas").solve()
    ref = Solver(None, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED
    np.testing.assert_allclose(sol.x, ref.x, atol=1e-7)


def test_dd_looped_kernels_match_unrolled(monkeypatch):
    """The fori_loop kernel variants (used for N > UNROLL_MAX, where the
    unrolled Mosaic compile explodes) produce the same factors/solves."""
    from cuclarabel_tpu.kkt import pallas_dd as pd

    rng = np.random.default_rng(7)
    B, n, m = 3, 5, 8
    N = n + m
    K = _make_qd(rng, B, n, m, spread=2.0)
    b = rng.standard_normal((B, N))
    dsigns = np.concatenate([np.ones(n), -np.ones(m)])
    Kh, Kl = split_f64(_lane(K))
    regT = jnp.broadcast_to(jnp.asarray(dsigns * 1e-8)[:, None], (N, B))
    bh, bl = split_f64(_lane(b))

    Lh0, Ll0, Dh0, Dl0 = dd_ldl_factor(Kh, Kl, regT.astype(jnp.float32),
                                       interpret=True)
    x0h, x0l = dd_ldl_solve(Lh0, Ll0, Dh0, Dl0, bh, bl, interpret=True)

    monkeypatch.setattr(pd, "UNROLL_MAX", 0)  # force the looped path
    Lh1, Ll1, Dh1, Dl1 = dd_ldl_factor(Kh, Kl, regT.astype(jnp.float32),
                                       interpret=True)
    x1h, x1l = dd_ldl_solve(Lh1, Ll1, Dh1, Dl1, bh, bl, interpret=True)

    # different summation orders (the default unrolled kernel is the
    # rank-p pre-split one) differ by ~cond * eps_dd ~ 1e-11 here; the
    # real criterion is residual quality of the looped solve
    np.testing.assert_allclose(np.asarray(join_f64(Dh1, Dl1)),
                               np.asarray(join_f64(Dh0, Dl0)), rtol=1e-9)
    x_un = _unlane(join_f64(x0h, x0l))
    x_lp = _unlane(join_f64(x1h, x1l))
    np.testing.assert_allclose(x_lp, x_un, rtol=1e-6, atol=1e-8)
    Kreg = K + (dsigns * 1e-8) * np.eye(N)
    res = b - np.einsum("bij,bj->bi", Kreg, x_lp)
    assert np.abs(res).max() / np.abs(b).max() < 1e-10


def test_dd_fused_refine_matches_unfused():
    """dd_ldl_solve_refine must equal solve + npass monotone-accepted
    refinement rounds done with separate launches, and return the true
    residual of the accepted iterate."""
    from cuclarabel_tpu.kkt.pallas_dd import dd_ldl_solve_refine

    rng = np.random.default_rng(11)
    B, n, m = 5, 9, 12
    N = n + m
    K = _make_qd(rng, B, n, m, spread=5.0)
    b = rng.standard_normal((B, N))
    dsigns = np.concatenate([np.ones(n), -np.ones(m)])
    Kh, Kl = split_f64(_lane(K))
    regT = jnp.broadcast_to(jnp.asarray(dsigns * 1e-8)[:, None], (N, B))
    Lh, Ll, Dh, Dl = dd_ldl_factor(Kh, Kl, regT.astype(jnp.float32),
                                   interpret=True)
    bh, bl = split_f64(_lane(b))

    xh, xl, rh, rl = dd_ldl_solve_refine(
        Kh, Kl, Lh, Ll, Dh, Dl, bh, bl, npass=2, interpret=True)
    x = _unlane(join_f64(xh, xl))
    r = _unlane(join_f64(rh, rl))

    # returned residual must be b - K x of the returned iterate
    # (UNregularized K, matching dd_residual semantics)
    r_ref = b - np.einsum("bij,bj->bi", K, x)
    scale = max(np.abs(b).max(), 1.0)
    assert np.abs(r - r_ref).max() / scale < 1e-12

    # accuracy: refined dd iterate should be at solver-quality residual
    assert np.abs(r_ref).max() / scale < 1e-10

    # npass=0 reduces to the plain solve
    x0h, x0l, r0h, r0l = dd_ldl_solve_refine(
        Kh, Kl, Lh, Ll, Dh, Dl, bh, bl, npass=0, interpret=True)
    xsh, xsl = dd_ldl_solve(Lh, Ll, Dh, Dl, bh, bl, interpret=True)
    np.testing.assert_array_equal(np.asarray(x0h), np.asarray(xsh))
    np.testing.assert_array_equal(np.asarray(x0l), np.asarray(xsl))


def test_dd_multirhs_matches_single(monkeypatch):
    """dd_ldl_solve_r / dd_ldl_solve_refine_r (one substitution chain
    serving r right-hand sides) must match the single-RHS kernels per
    column, for both the unrolled and fori_loop variants."""
    from cuclarabel_tpu.kkt import pallas_dd as pd

    rng = np.random.default_rng(13)
    B, n, m, r = 3, 4, 6, 2
    N = n + m
    K = _make_qd(rng, B, n, m, spread=4.0)
    bs = rng.standard_normal((r, B, N))
    dsigns = np.concatenate([np.ones(n), -np.ones(m)])
    Kh, Kl = split_f64(_lane(K))
    regT = jnp.broadcast_to(jnp.asarray(dsigns * 1e-8)[:, None], (N, B))
    Lh, Ll, Dh, Dl = dd_ldl_factor(Kh, Kl, regT.astype(jnp.float32),
                                   interpret=True)
    # stack RHS on a middle axis: (N, r, B)
    bh = jnp.stack([split_f64(_lane(bs[t]))[0] for t in range(r)], axis=1)
    bl = jnp.stack([split_f64(_lane(bs[t]))[1] for t in range(r)], axis=1)

    for force_loop in (False, True):
        if force_loop:
            monkeypatch.setattr(pd, "UNROLL_MAX", 0)
        xh, xl = pd.dd_ldl_solve_r(Lh, Ll, Dh, Dl, bh, bl, interpret=True)
        xrh, xrl, rrh, rrl = pd.dd_ldl_solve_refine_r(
            Kh, Kl, Lh, Ll, Dh, Dl, bh, bl, npass=2, interpret=True)
        for t in range(r):
            sh, sl = split_f64(_lane(bs[t]))
            x1h, x1l = pd.dd_ldl_solve(Lh, Ll, Dh, Dl, sh, sl,
                                       interpret=True)
            np.testing.assert_allclose(
                np.asarray(join_f64(xh[:, t], xl[:, t])),
                np.asarray(join_f64(x1h, x1l)), rtol=1e-9, atol=1e-11)
            f1h, f1l, e1h, e1l = pd.dd_ldl_solve_refine(
                Kh, Kl, Lh, Ll, Dh, Dl, sh, sl, npass=2, interpret=True)
            np.testing.assert_allclose(
                np.asarray(join_f64(xrh[:, t], xrl[:, t])),
                np.asarray(join_f64(f1h, f1l)), rtol=1e-9, atol=1e-11)
            # residual output must be b - K x of the accepted iterate
            x_t = _unlane(join_f64(xrh[:, t], xrl[:, t]))
            r_t = _unlane(join_f64(rrh[:, t], rrl[:, t]))
            r_ref = bs[t] - np.einsum("bij,bj->bi", K, x_t)
            assert np.abs(r_t - r_ref).max() < 1e-11


def test_dd_kkt_solve_pair_matches_two_solves():
    """The dense backend's kkt_solve.pair (constant-RHS + affine systems
    in one launch) must agree with two independent kkt_solve calls,
    including under vmap."""
    from cuclarabel_tpu.kkt.dense import make_dense_kkt
    from cuclarabel_tpu.settings import Settings

    rng = np.random.default_rng(3)
    n, m, B = 4, 6, 3
    A = rng.standard_normal((m, n))
    Hs = np.diag(10.0 ** rng.uniform(-3, 3, size=m))
    st = Settings(kkt_solve_method="pallas")
    factorize, kkt_solve = make_dense_kkt(n, m, st, jnp.float32)
    assert hasattr(kkt_solve, "pair")

    fac, ok = jax.jit(factorize)(
        jnp.zeros((n, n)), jnp.asarray(A), jnp.asarray(Hs))
    rx1, rz1 = rng.standard_normal(n), rng.standard_normal(m)
    rx2, rz2 = rng.standard_normal(n), rng.standard_normal(m)
    x1, z1, ok1, _ = jax.jit(kkt_solve)(fac, jnp.asarray(rx1),
                                        jnp.asarray(rz1))
    x2, z2, ok2, _ = jax.jit(kkt_solve)(fac, jnp.asarray(rx2),
                                        jnp.asarray(rz2))
    xa, za, xb, zb, okp, _ = jax.jit(kkt_solve.pair)(
        fac, jnp.asarray(rx1), jnp.asarray(rz1),
        jnp.asarray(rx2), jnp.asarray(rz2))
    assert bool(ok) and bool(okp)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(x1), atol=1e-11)
    np.testing.assert_allclose(np.asarray(za), np.asarray(z1), atol=1e-11)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(x2), atol=1e-11)
    np.testing.assert_allclose(np.asarray(zb), np.asarray(z2), atol=1e-11)

    fb, _ = jax.jit(jax.vmap(factorize, in_axes=(None, None, 0)))(
        jnp.zeros((n, n)), jnp.asarray(A),
        jnp.broadcast_to(jnp.asarray(Hs), (B, m, m)))
    rbx = jnp.asarray(rng.standard_normal((B, n)))
    rbz = jnp.asarray(rng.standard_normal((B, m)))
    ov = jax.jit(jax.vmap(kkt_solve.pair))(fb, rbx, rbz, 2 * rbx, 2 * rbz)
    o1 = jax.jit(jax.vmap(kkt_solve))(fb, rbx, rbz)
    np.testing.assert_allclose(np.asarray(ov[0]), np.asarray(o1[0]),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(ov[2]), 2 * np.asarray(o1[0]),
                               atol=1e-10)


def test_dd_solver_ir_disabled():
    """kkt_solve_method='pallas' with iterative refinement off still
    solves (the pair path's no-IR branch)."""
    from cuclarabel_tpu.solver import Solver
    from cuclarabel_tpu.statuscodes import SolverStatus

    P, q, A, b, cones = _qp()
    sol = Solver(P, q, A, b, cones, kkt_solve_method="pallas",
                 iterative_refinement_enable=False).solve()
    ref = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED
    np.testing.assert_allclose(sol.x, ref.x, atol=1e-7)


def test_dd_chunked_variants_match():
    """Row-chunked factor (_ldl_kernel_psc) and chunked-residual
    refine (_refine_kernel_c / _residual_kernel_c) match the
    whole-array kernels to dd accuracy (the round-5 Mosaic-analysis
    kernels; per-variant interpret verification is mandatory for every
    new dd layout)."""
    from cuclarabel_tpu.kkt.pallas_dd import dd_ldl_solve_refine

    rng = np.random.default_rng(13)
    B, n, m = 5, 9, 12
    N = n + m
    K = _make_qd(rng, B, n, m, spread=5.0)
    eps = 1e-8
    dsigns = np.concatenate([np.ones(n), -np.ones(m)])
    b = rng.standard_normal((B, N))
    x = rng.standard_normal((B, N))

    Kh, Kl = split_f64(_lane(K))
    regT = jnp.broadcast_to(
        jnp.asarray(dsigns * eps)[:, None], (N, B)).astype(jnp.float32)
    bh, bl = split_f64(_lane(b))
    xh, xl = split_f64(_lane(x))

    Kreg = K + (dsigns * eps) * np.eye(N)
    x_ref = np.linalg.solve(Kreg, b[..., None])[..., 0]
    scale = max(np.abs(x_ref).max(), 1.0)

    # chunked factor (positive = rank-1 psc, negative = rank-2
    # pivot-pair psc2 with |psc| chunk rows)
    for psc in (1, 4, 8, N + 5, -1, -2, -4, -8):
        Lh, Ll, Dh, Dl = dd_ldl_factor(Kh, Kl, regT, interpret=True,
                                       psc=psc)
        sh, sl = dd_ldl_solve(Lh, Ll, Dh, Dl, bh, bl, interpret=True)
        xs = _unlane(join_f64(sh, sl))
        assert np.abs(xs - x_ref).max() / scale < 1e-9, psc

    # EVEN N exercises psc2's terminal-pair branch (j+2 == n: no tail,
    # no second stash, lone deferred store) — dead at odd N
    Ke = _make_qd(rng, B, n, m + 1, spread=4.0)
    Ne = N + 1
    dse = np.concatenate([np.ones(n), -np.ones(m + 1)])
    be_ = rng.standard_normal((B, Ne))
    Khe, Kle = split_f64(_lane(Ke))
    regE = jnp.broadcast_to(
        jnp.asarray(dse * eps)[:, None], (Ne, B)).astype(jnp.float32)
    bhe, ble = split_f64(_lane(be_))
    xe_ref = np.linalg.solve(Ke + (dse * eps) * np.eye(Ne),
                             be_[..., None])[..., 0]
    for psc in (-1, -2, -4):
        L = dd_ldl_factor(Khe, Kle, regE, interpret=True, psc=psc)
        sh, sl = dd_ldl_solve(*L, bhe, ble, interpret=True)
        xs = _unlane(join_f64(sh, sl))
        err = np.abs(xs - xe_ref).max() / max(np.abs(xe_ref).max(), 1.0)
        assert err < 1e-9, (psc, err)

    # chunked residual
    r_ref = b - np.einsum("bij,bj->bi", K, x)
    for psc in (4, 8):
        rh, rl = dd_residual(Kh, Kl, xh, xl, bh, bl, interpret=True,
                             psc=psc)
        r = _unlane(join_f64(rh, rl))
        assert np.abs(r - r_ref).max() < 1e-10 * max(
            1.0, np.abs(r_ref).max()), psc

    # chunked refine returns the true residual of its accepted iterate
    # and matches the whole-array refine to dd accuracy
    L = dd_ldl_factor(Kh, Kl, regT, interpret=True)
    xs_by_psc = {}
    for psc in (0, 8):
        xh2, xl2, rh2, rl2 = dd_ldl_solve_refine(
            Kh, Kl, *L, bh, bl, npass=2, interpret=True, psc=psc)
        xs = _unlane(join_f64(xh2, xl2))
        rs = _unlane(join_f64(rh2, rl2))
        rtrue = b - np.einsum("bij,bj->bi", K, xs)
        assert np.abs(rs - rtrue).max() < 1e-11, psc
        xs_by_psc[psc] = xs
    assert np.abs(xs_by_psc[0] - xs_by_psc[8]).max() / scale < 1e-9
