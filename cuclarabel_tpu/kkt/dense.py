"""Dense quasidefinite KKT backend.

The reduced KKT system (after eliminating Delta_s and the tau column,
`src/kktsystem.jl:5-232`):

    K = [ P   A' ]
        [ A  -Hs ]

is symmetric quasidefinite once statically regularized with signed
epsilon (+eps on the x block, -eps on the z block — Dsigns semantics of
`src/kktsolvers/kktsolver_directldl.jl:112-126,247-310`).

TPU-first design decisions:
  * the factorization runs DENSE — on TPU the MXU makes dense
    O(N^3) factorization of moderate KKT systems faster than any
    scatter-heavy sparse scheme; a block-sparse backend can register
    alongside later (mirroring the reference's L1 backend registry).
  * factorization precision is configurable: float32 factor + float64
    iterative refinement recovers ~1e-8 accuracy on TPU where native
    f64 matmul is slow (the reference's static-reg + IR architecture,
    `kktsolver_directldl.jl:389-449`, is exactly what makes this work).
  * iterative refinement runs as a `lax.while_loop` against the
    *unregularized* f64 KKT operator.
"""

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _inf_norm(v):
    return jnp.max(jnp.abs(v))


def _gj_inv_small(M):
    """Unrolled no-pivot Gauss-Jordan inverse for tiny blocks.

    Valid because every diagonal block reached by the recursive Schur
    split of a statically regularized quasidefinite matrix is itself
    quasidefinite (nonzero pivots); f64 refinement absorbs the loss of
    pivoting accuracy."""
    N = M.shape[-1]
    X = jnp.concatenate([M, jnp.eye(N, dtype=M.dtype)], axis=-1)
    for i in range(N):
        piv = X[i, :] / X[i, i]
        X = X - X[:, i : i + 1] * piv[None, :]
        X = X.at[i, :].set(piv)
    return X[:, N:]


def pivotfree_inv(M):
    """Pivot-free inverse of a (regularized) quasidefinite matrix by
    recursive 2x2 block Schur complementation:

        inv([A B; C D]) = [Ai + AiB Si CAi,  -AiB Si]
                          [      -Si CAi,        Si ]

    with Ai = inv(A), S = D - C Ai B, Si = inv(S).  All work is batched
    matmuls (MXU) — no sequential pivot search / row swaps, which is
    what serializes XLA's LU on TPU.  Leading principal submatrices of
    a quasidefinite matrix are quasidefinite, so every recursive block
    is invertible without pivoting (Vanderbei 1995)."""
    N = M.shape[-1]
    if N <= 8:
        return _gj_inv_small(M)
    k = N // 2
    A = M[:k, :k]
    B = M[:k, k:]
    C = M[k:, :k]
    D = M[k:, k:]
    Ai = pivotfree_inv(A)
    AiB = Ai @ B
    S = D - C @ AiB
    Si = pivotfree_inv(S)
    CAi = C @ Ai
    SiCAi = Si @ CAi
    top = jnp.concatenate([Ai + AiB @ SiCAi, -(AiB @ Si)], axis=1)
    bot = jnp.concatenate([-SiCAi, Si], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def resolve_kkt_method(settings, N: int) -> str:
    """Resolve kkt_solve_method='auto' to the backend actually used.

    TPU: the double-float Pallas LDL engine wins end-to-end at every
    batch size (v5e, portfolio SOCP: 2193/s vs 1872/s at B=256,
    2264/s vs 398/s at B=4096 against the f32-inverse path) with
    f64-grade factors — see pallas_dd.py.  The kernel is UNROLLED over
    N pivots, so Mosaic compile memory grows ~N^3-ish: past N ~ 128 the
    remote compile helper OOMs (observed SIGKILL at N=160) and the
    (N,N,128) hi/lo fronts outgrow VMEM — fall back to the
    explicit-inverse path there.  Elsewhere the interpret-mode kernels
    are slow: pivoted LU."""
    method = settings.kkt_solve_method
    if method == "auto":
        if jax.default_backend() in ("tpu", "axon"):
            if N <= 128:
                method = "pallas"
            elif settings.kkt_factor_precision == "float32":
                # f32: XLA's pivoted inv is available and measured
                # fastest; refinement against f64 K recovers accuracy
                method = "inverse"
            else:
                # f64 past the Pallas cap: Householder QR — the
                # pivot-free inverse recursion loses ~8 digits on
                # dense ill-conditioned Hs blocks (late-IPM PSD
                # cones), QR is pivoting-free AND backward stable
                method = "qr"
        else:
            method = "lu"
    return method


def resolve_dd_npass(settings) -> int:
    """Effective fused iterative-refinement pass count of the dd Pallas
    engine (dd_ldl_solve_refine's `npass`).  Default: 1 pass fused into
    the solve kernel launch; the outer tolerance loop picks up the rare
    second pass (measured IR need is ~1.4 passes — the always-computed
    second fused pass was rejected work most calls, and the round-4
    interleaved A/B at (83, 4096) measured npass=1 at 9.1k problems/s
    vs 8.7k for npass=2 with identical iteration counts;
    benchmarks/ab_results/ab_npass.json).  The CUCLARABEL_DD_NPASS env
    var overrides it at build time (A/B knob); the resolved value is
    surfaced in get_info()['linear_solver'] so the semantics of a
    compiled solver are never silently environment-driven.
    """
    ir_enable = settings.iterative_refinement_enable
    ir_maxiter = settings.iterative_refinement_max_iter
    npass = max(0, min(1, ir_maxiter)) if ir_enable else 0
    env = os.environ.get("CUCLARABEL_DD_NPASS")
    if env is not None and ir_enable:
        try:
            val = int(env)
        except ValueError:
            raise ValueError(
                "CUCLARABEL_DD_NPASS must be an integer (fused dd "
                f"refinement pass count); got {env!r}"
            ) from None
        npass = max(0, min(val, ir_maxiter))
    return npass


def make_dense_kkt(n: int, m: int, settings, factor_dtype, layout=None):
    """Returns (factorize, solve):

    factorize(P, A, Hs) -> (fac, ok)
        fac carries the LU factor of the regularized K (factor dtype)
        and the unregularized K in f64 for refinement residuals.

    solve(fac, rx, rz) -> (x, z, ok)
        one KKT solve with iterative refinement.
    """
    N = n + m
    eps_const = settings.static_regularization_constant
    eps_prop = settings.static_regularization_proportional
    reg_enable = settings.static_regularization_enable
    ir_enable = settings.iterative_refinement_enable
    ir_reltol = settings.iterative_refinement_reltol
    ir_abstol = settings.iterative_refinement_abstol
    ir_maxiter = settings.iterative_refinement_max_iter
    ir_stopratio = settings.iterative_refinement_stop_ratio

    # NB: keep closure constants as numpy — an eagerly created device
    # array would be embedded as an MLIR constant at lowering time via a
    # device->host readback, which is pathologically slow on remote
    # (tunneled) TPU backends.
    import numpy as _np

    dsigns = _np.concatenate([_np.ones(n), -_np.ones(m)])

    method = resolve_kkt_method(settings, N)

    def _assemble(P, A, Hs):
        top = jnp.concatenate([P, A.T], axis=1)
        bot = jnp.concatenate([A, -Hs], axis=1)
        K = jnp.concatenate([top, bot], axis=0)  # f64, unregularized

        if reg_enable:
            # eps = const + proportional * max |diag K|
            # (kktsolver_directldl.jl:297-310)
            diag = jnp.diagonal(K)
            eps = eps_const + eps_prop * _inf_norm(diag)
            Kreg = K + jnp.diag(dsigns * eps)
        else:
            eps = jnp.asarray(0.0)
            Kreg = K

        # symmetric row-norm (one-shot Ruiz) pre-scaling of the matrix
        # handed to the reduced-precision factorization: the Hs block
        # spans many orders of magnitude late in the IPM, and rescaling
        # keeps the factor's condition number within f32 range.  Row
        # inf-norms (not the diagonal, which is ~0 on the x block of an
        # LP) so zero-diagonal rows scale sanely.  The f64 refinement
        # still runs against the raw operator K.
        rn = jnp.max(jnp.abs(Kreg), axis=1)
        dj = 1.0 / jnp.sqrt(jnp.where(rn > 1e-300, rn, 1.0))
        Ks = Kreg * dj[:, None] * dj[None, :]
        # regdiag: the regularization in the scaled space, so that
        # Ks - diag(regdiag) is the scaled UNregularized operator
        regdiag = dsigns * eps * dj * dj
        return K, Ks, dj, regdiag

    # Stability ordering for pivot-free elimination: inequality slack
    # rows first (pivots -(Hs+eps), O(1) magnitudes), then the x block
    # (its Schur complement P + eps + A' H^-1 A is SPD), then equality
    # (zero-cone) rows last (their Schur pivots become
    # -(eps + A_eq S^-1 A_eq') rather than the raw -eps).  Without
    # this, an LP's leading eps*I pivots produce 1e8-scale multipliers
    # that destroy an f32 factorization (pallas LDL and pivotfree_inv
    # alike).
    zero_mask = (
        _np.asarray(layout.zero_mask)
        if layout is not None and getattr(layout, "has_zero", False)
        else _np.zeros(m, dtype=bool)
    )
    mrows = _np.arange(m) + n
    perm = _np.concatenate([mrows[~zero_mask], _np.arange(n), mrows[zero_mask]])
    iperm = _np.argsort(perm)

    if method == "pallas":
        # double-float (two-float f32, ~2^-48) Pallas LDL^T engine
        # (pallas_dd.py): f64-quality factors and residual matvecs at
        # VPU f32 speeds.  Round-2 answer to the large-batch profile
        # (see pallas_dd.py header): the plain-f32 kernel stalled
        # refinement at cond(K) ~ 1e8 while XLA's emulated-f64 residual
        # matvecs cost ~28 ms each at B=4096; dd removes both.
        #
        # Layout note: the kernels want lane-major (N, N, B) operands.
        # The custom_vmap rules keep the public batch semantics honest
        # (fac leaves are (B, N, N), batch axis 0) and moveaxis at the
        # kernel boundary; the factor-output transpose and each solve's
        # input transpose are inverse pairs of the same value, which
        # XLA's algebraic simplifier cancels/CSEs, so the large factor
        # arrays are not physically transposed per solve call.
        from jax.custom_batching import custom_vmap

        from .pallas_dd import (
            dd_ldl_factor,
            dd_ldl_solve,
            dd_ldl_solve_refine,
            dd_residual,
            join_f64,
            split_f64,
        )

        interp = jax.default_backend() not in ("tpu", "axon")
        permj = jnp.asarray(perm)
        # passes fused into the solve kernel launch (L and K stream from
        # HBM once for all of them); measured IR mean is 1.4 passes, so
        # 2 fused passes leave the outer tolerance loop rarely taken.
        # CUCLARABEL_DD_NPASS overrides the fused pass count (A/B knob:
        # npass=1 trades one always-computed solve+residual per call for
        # more outer tolerance-loop entries).
        npass_fused = resolve_dd_npass(settings)

        def _ensure_batched(axis_size, in_batched, *ops):
            # these rules move axis 0 of EVERY operand to the lane dim;
            # a partially-batched call (e.g. the identity-scaling INIT
            # factor when P, A and Hs0 are all shared across the batch,
            # so only the RHS carries the mapped axis) is mathematically
            # a broadcast — materialize it so the axis bookkeeping below
            # stays uniform
            return tuple(
                op if batched
                else jnp.broadcast_to(op, (axis_size,) + op.shape)
                for op, batched in zip(ops, in_batched)
            )

        @custom_vmap
        def _dd_factor(Ksph, Kspl, regp):
            # (Ksph, Kspl) (N, N) f32 dd pair of the scaled+permuted
            # UNregularized K; regp (N,) f32 signed regularization.
            # K is ECHOED through the call so the batched rule hands
            # back `back(lane(K))` — downstream solve/residual calls do
            # `lane(fac["Kh"])` again and XLA's simplifier cancels the
            # transpose pairs; storing the caller's (B, N, N) array
            # directly would make every solve pay a REAL (N, N, B)
            # transpose of both 94 MB halves
            ex = lambda a: a[..., None]
            Lh, Ll, Dh, Dl = dd_ldl_factor(
                ex(Ksph), ex(Kspl), regp[:, None], interpret=interp
            )
            ok = jnp.all(jnp.isfinite(Dh))
            # outputs squeezed to per-problem rank so the batched rule's
            # element shapes match (custom_vmap consistency requirement)
            return Ksph, Kspl, *(a[..., 0] for a in (Lh, Ll, Dh, Dl)), ok

        @_dd_factor.def_vmap
        def _dd_factor_vmap(axis_size, in_batched, Ksph, Kspl, regp):
            Ksph, Kspl, regp = _ensure_batched(
                axis_size, in_batched, Ksph, Kspl, regp)
            lane = lambda a: jnp.moveaxis(a, 0, -1)  # (N, N, B) lane-major
            KTh, KTl = lane(Ksph), lane(Kspl)
            Lh, Ll, Dh, Dl = dd_ldl_factor(
                KTh, KTl, lane(regp), interpret=interp)
            ok = jnp.all(jnp.isfinite(Dh), axis=0)  # (B,)
            back = lambda a: jnp.moveaxis(a, -1, 0)
            return (
                back(KTh), back(KTl),
                back(Lh), back(Ll), back(Dh), back(Dl), ok,
            ), (True, True, True, True, True, True, True)

        @custom_vmap
        def _dd_solve(Lh, Ll, Dh, Dl, bs):
            ex = lambda a: a[..., None]
            bh, bl = split_f64(bs[:, None])
            xh, xl = dd_ldl_solve(
                ex(Lh), ex(Ll), ex(Dh), ex(Dl), bh, bl, interpret=interp
            )
            return join_f64(xh, xl)[:, 0]

        @_dd_solve.def_vmap
        def _dd_solve_vmap(axis_size, in_batched, Lh, Ll, Dh, Dl, bs):
            Lh, Ll, Dh, Dl, bs = _ensure_batched(
                axis_size, in_batched, Lh, Ll, Dh, Dl, bs)
            lane = lambda a: jnp.moveaxis(a, 0, -1)
            bh, bl = split_f64(lane(bs))
            xh, xl = dd_ldl_solve(
                lane(Lh), lane(Ll), lane(Dh), lane(Dl), bh, bl,
                interpret=interp,
            )
            return jnp.moveaxis(join_f64(xh, xl), -1, 0), True

        @custom_vmap
        def _dd_resid(Kh, Kl, xs, bs):
            ex = lambda a: a[..., None]
            xh, xl = split_f64(xs[:, None])
            bh, bl = split_f64(bs[:, None])
            rh, rl = dd_residual(
                ex(Kh), ex(Kl), xh, xl, bh, bl, interpret=interp
            )
            return join_f64(rh, rl)[:, 0]

        @_dd_resid.def_vmap
        def _dd_resid_vmap(axis_size, in_batched, Kh, Kl, xs, bs):
            Kh, Kl, xs, bs = _ensure_batched(
                axis_size, in_batched, Kh, Kl, xs, bs)
            lane = lambda a: jnp.moveaxis(a, 0, -1)
            xh, xl = split_f64(lane(xs))
            bh, bl = split_f64(lane(bs))
            rh, rl = dd_residual(
                lane(Kh), lane(Kl), xh, xl, bh, bl, interpret=interp
            )
            return jnp.moveaxis(join_f64(rh, rl), -1, 0), True

        @custom_vmap
        def _dd_refsolve(Kh, Kl, Lh, Ll, Dh, Dl, bs):
            ex = lambda a: a[..., None]
            bh, bl = split_f64(bs[:, None])
            xh, xl, rh, rl = dd_ldl_solve_refine(
                ex(Kh), ex(Kl), ex(Lh), ex(Ll), ex(Dh), ex(Dl), bh, bl,
                npass=npass_fused, interpret=interp,
            )
            return join_f64(xh, xl)[:, 0], join_f64(rh, rl)[:, 0]

        @_dd_refsolve.def_vmap
        def _dd_refsolve_vmap(axis_size, in_batched, Kh, Kl, Lh, Ll,
                              Dh, Dl, bs):
            Kh, Kl, Lh, Ll, Dh, Dl, bs = _ensure_batched(
                axis_size, in_batched, Kh, Kl, Lh, Ll, Dh, Dl, bs)
            lane = lambda a: jnp.moveaxis(a, 0, -1)
            bh, bl = split_f64(lane(bs))
            xh, xl, rh, rl = dd_ldl_solve_refine(
                lane(Kh), lane(Kl), lane(Lh), lane(Ll), lane(Dh),
                lane(Dl), bh, bl, npass=npass_fused, interpret=interp,
            )
            return (
                jnp.moveaxis(join_f64(xh, xl), -1, 0),
                jnp.moveaxis(join_f64(rh, rl), -1, 0),
            ), (True, True)

        dsigns32 = dsigns.astype(_np.float32)

        def _assemble_dd(P, A, Hs):
            """Assemble the scaled unregularized K as a dd (hi, lo) f32
            pair with TWO emulated-f64 passes over (B, N, N) (one
            scaling multiply + one split) instead of the previous four
            (row maxima, two scaling multiplies, reg subtract): the row
            maxima come from a cheap f32 cast and the regularization is
            applied inside the factor kernel.  NB the scaled K must NOT
            be formed by a jnp-level dd_mul: XLA(:CPU at least) breaks
            error-free transforms in fused contexts outside Pallas
            kernels (CLAUDE.md round-2 trap; re-hit in round 4 — the
            'scaled K' degraded to f32, IR stalled at r_prim ~ 1e-5 and
            solves ended ALMOST_SOLVED), so the product stays in f64
            and is split once."""
            top = jnp.concatenate([P, A.T], axis=1)
            bot = jnp.concatenate([A, -Hs], axis=1)
            K = jnp.concatenate([top, bot], axis=0)  # f64, unregularized

            if reg_enable:
                # eps = const + proportional * max |diag K|
                # (kktsolver_directldl.jl:297-310)
                diag_h = jnp.diagonal(K).astype(jnp.float32)
                eps = jnp.float32(eps_const) + jnp.float32(
                    eps_prop) * jnp.max(jnp.abs(diag_h))
            else:
                eps = jnp.float32(0.0)

            # symmetric row-norm pre-scaling (one-shot Ruiz) of the
            # matrix handed to the factorization; |Kreg| row maxima are
            # approximated by max(row max |K|, eps) — identical except
            # when the regularized diagonal entry |K_jj ± eps| would
            # have dominated its row, where the two differ by at most
            # 2x on a clipped heuristic
            # clamp the f32 row maxima to f32 max: an |K| entry above
            # it overflows the cast to inf, which would zero that
            # row's scaling (1/sqrt(inf)) and guarantee factorization
            # failure where the f64 row-norm degraded gracefully
            # (ADVICE r4); min(inf, f32max) = f32max restores that
            rn = jnp.maximum(
                jnp.minimum(
                    jnp.max(jnp.abs(K.astype(jnp.float32)), axis=1),
                    jnp.float32(np.finfo(np.float32).max),
                ),
                eps,
            )
            dj32 = 1.0 / jnp.sqrt(jnp.where(rn > 1e-30, rn, 1.0))
            dj = dj32.astype(jnp.float64)
            Ks = K * (dj[:, None] * dj[None, :])  # one emulated-f64 pass
            Ksh, Ksl = split_f64(Ks)
            regdiag32 = jnp.asarray(dsigns32) * eps * dj32 * dj32
            return Ksh, Ksl, dj, regdiag32

        def factorize(P, A, Hs):
            Ksh, Ksl, dj, regdiag32 = _assemble_dd(P, A, Hs)
            Ksph = Ksh[perm][:, perm]
            Kspl = Ksl[perm][:, perm]
            Kh, Kl, Lh, Ll, Dh, Dl, ok = _dd_factor(
                Ksph, Kspl, regdiag32[perm])
            return {
                "Kh": Kh, "Kl": Kl, "Lh": Lh, "Ll": Ll,
                "Dh": Dh, "Dl": Dl, "dj": dj,
            }, ok

        def _dd_kkt_solve(fac, rx, rz):
            """Solve + iterative refinement entirely in the scaled,
            permuted dd domain (reference IR contract:
            kktsolver_directldl.jl:389-449, residuals against the
            UNregularized operator)."""
            dj = fac["dj"]
            djp = dj[permj]
            b = jnp.concatenate([rx, rz])
            bs = (dj * b)[permj]
            normb = _inf_norm(b)
            tol = ir_abstol + ir_reltol * normb

            def unscaled_norm(rs):
                # rs = dj*(b - K x)[perm]; undo the row scaling for the
                # tolerance test in the reference's (unscaled) units
                return _inf_norm(rs / djp)

            if ir_enable:
                # fused kernel: solve + npass_fused gated refinement
                # passes in one launch, returning the accepted iterate
                # and its residual; the while_loop below only runs for
                # stragglers still above tolerance
                x, e0 = _dd_refsolve(
                    fac["Kh"], fac["Kl"], fac["Lh"], fac["Ll"],
                    fac["Dh"], fac["Dl"], bs,
                )
                norme0 = unscaled_norm(e0)
                ok0 = jnp.isfinite(norme0)

                def cond(c):
                    _, _, norme, i, stop, ok = c
                    return (~stop) & ok & (i < ir_maxiter) & (norme > tol)

                def body(c):
                    xc, e, norme, i, _, _ = c
                    dx = _dd_solve(
                        fac["Lh"], fac["Ll"], fac["Dh"], fac["Dl"], e
                    )
                    xn = xc + dx
                    en = _dd_resid(fac["Kh"], fac["Kl"], xn, bs)
                    normen = unscaled_norm(en)
                    okn = jnp.isfinite(normen)
                    ratio = norme / jnp.where(normen > 0, normen, 1e-300)
                    accept = ratio > 1.0
                    keep_going = ratio > min(ir_stopratio, 1.2)
                    return (
                        jnp.where(accept, xn, xc),
                        jnp.where(accept, en, e),
                        jnp.where(accept, normen, norme),
                        i + 1,
                        ~keep_going,
                        okn,
                    )

                x, _, norme, nir, _, okr = jax.lax.while_loop(
                    cond, body, (x, e0, norme0, npass_fused, False, ok0)
                )
                ok = okr & jnp.isfinite(norme)
            else:
                x = _dd_solve(
                    fac["Lh"], fac["Ll"], fac["Dh"], fac["Dl"], bs
                )
                nir = jnp.asarray(0)
                ok = jnp.all(jnp.isfinite(x))
            xout = dj * x[iperm]
            return xout[:n], xout[n:], ok, nir

    elif method == "inverse":

        def factorize(P, A, Hs):
            K, Ks, dj, _regdiag = _assemble(P, A, Hs)
            # f32: pivoted inversion (XLA's f32 LU) — measured fastest
            # end-to-end: the pivot-free recursion's many small matmuls
            # underutilize the MXU and its f32 accuracy degrades with
            # the late-IPM Hs spread (stability ordering fixes the
            # eps-pivot blowup but not the spread).  f64: XLA has no
            # f64 LU on TPU, so use the stability-ordered pivot-free
            # block-Schur inverse (pure matmuls; ~1e-16 headroom makes
            # the recursion accurate).  Either way a Newton-Schulz step
            # tightens the residual and every solve is one matmul.
            if factor_dtype == jnp.float32:
                Kf = Ks.astype(factor_dtype)
                Kinv = jnp.linalg.inv(Kf)
            else:
                Kf = Ks[perm][:, perm].astype(factor_dtype)
                Kinv = pivotfree_inv(Kf)
            Kinv = Kinv @ (2.0 * jnp.eye(N, dtype=factor_dtype) - Kf @ Kinv)
            ok = jnp.all(jnp.isfinite(Kinv))
            return {"Kinv": Kinv, "K": K, "dj": dj}, ok

        _permuted = factor_dtype != jnp.float32

        def _raw_solve(fac, b):
            dj = fac["dj"]
            if _permuted:
                bs = (dj * b)[perm].astype(factor_dtype)
                return dj * (fac["Kinv"] @ bs)[iperm].astype(jnp.float64)
            bs = (dj * b).astype(factor_dtype)
            return dj * (fac["Kinv"] @ bs).astype(jnp.float64)

    elif method == "qr":

        def factorize(P, A, Hs):
            # Householder QR: pivoting-free AND backward stable — the
            # f64 fallback for KKT dims past the Pallas cap on TPU
            # (XLA has no f64 LU there).  The pivot-free block-Schur
            # inverse loses ~8 digits on dense ill-conditioned Hs
            # blocks (late-IPM PSD cones: observed INSUFFICIENT_
            # PROGRESS at r_prim ~ 4e-4 on a PSD projection, round 4)
            # because intermediate Schur complements are far worse
            # conditioned than K itself; Householder factors touch K
            # only through orthogonal transforms.
            K, Ks, dj, _regdiag = _assemble(P, A, Hs)
            Qf, Rf = jnp.linalg.qr(Ks.astype(factor_dtype))
            ok = jnp.all(jnp.isfinite(Rf))
            return {"Q": Qf, "R": Rf, "K": K, "dj": dj}, ok

        def _raw_solve(fac, b):
            dj = fac["dj"]
            bs = (dj * b).astype(factor_dtype)
            y = fac["Q"].T @ bs
            x = jax.scipy.linalg.solve_triangular(fac["R"], y, lower=False)
            return dj * x.astype(jnp.float64)

    else:

        def factorize(P, A, Hs):
            K, Ks, dj, _regdiag = _assemble(P, A, Hs)
            lu, piv = jax.scipy.linalg.lu_factor(Ks.astype(factor_dtype))
            ok = jnp.all(jnp.isfinite(lu))
            return {"lu": lu, "piv": piv, "K": K, "dj": dj}, ok

        def _raw_solve(fac, b):
            dj = fac["dj"]
            x = jax.scipy.linalg.lu_solve(
                (fac["lu"], fac["piv"]), (dj * b).astype(factor_dtype)
            )
            return dj * x.astype(jnp.float64)

    if method == "pallas":
        from .pallas_dd import dd_ldl_solve_r, dd_ldl_solve_refine_r

        @custom_vmap
        def _dd_solve2(Lh, Ll, Dh, Dl, bs):
            ex = lambda a: a[..., None]
            bh, bl = split_f64(bs[..., None])  # (N, 2, 1)
            xh, xl = dd_ldl_solve_r(
                ex(Lh), ex(Ll), ex(Dh), ex(Dl), bh, bl, interpret=interp
            )
            return join_f64(xh, xl)[..., 0]

        @_dd_solve2.def_vmap
        def _dd_solve2_vmap(axis_size, in_batched, Lh, Ll, Dh, Dl, bs):
            Lh, Ll, Dh, Dl, bs = _ensure_batched(
                axis_size, in_batched, Lh, Ll, Dh, Dl, bs)
            lane = lambda a: jnp.moveaxis(a, 0, -1)
            bh, bl = split_f64(lane(bs))  # (N, 2, B)
            xh, xl = dd_ldl_solve_r(
                lane(Lh), lane(Ll), lane(Dh), lane(Dl), bh, bl,
                interpret=interp,
            )
            return jnp.moveaxis(join_f64(xh, xl), -1, 0), True

        @custom_vmap
        def _dd_refsolve2(Kh, Kl, Lh, Ll, Dh, Dl, bs):
            ex = lambda a: a[..., None]
            bh, bl = split_f64(bs[..., None])
            xh, xl, rh, rl = dd_ldl_solve_refine_r(
                ex(Kh), ex(Kl), ex(Lh), ex(Ll), ex(Dh), ex(Dl), bh, bl,
                npass=npass_fused, interpret=interp,
            )
            return join_f64(xh, xl)[..., 0], join_f64(rh, rl)[..., 0]

        @_dd_refsolve2.def_vmap
        def _dd_refsolve2_vmap(axis_size, in_batched, Kh, Kl, Lh, Ll,
                               Dh, Dl, bs):
            Kh, Kl, Lh, Ll, Dh, Dl, bs = _ensure_batched(
                axis_size, in_batched, Kh, Kl, Lh, Ll, Dh, Dl, bs)
            lane = lambda a: jnp.moveaxis(a, 0, -1)
            bh, bl = split_f64(lane(bs))
            xh, xl, rh, rl = dd_ldl_solve_refine_r(
                lane(Kh), lane(Kl), lane(Lh), lane(Ll), lane(Dh),
                lane(Dl), bh, bl, npass=npass_fused, interpret=interp,
            )
            return (
                jnp.moveaxis(join_f64(xh, xl), -1, 0),
                jnp.moveaxis(join_f64(rh, rl), -1, 0),
            ), (True, True)

        def _dd_kkt_solve_pair(fac, rx1, rz1, rx2, rz2):
            """Two refined KKT solves against one factor in a single
            kernel launch (the constant-RHS (-q, b) and affine systems
            of one IPM iteration, kktsystem.jl:62-92 + :135-163: both
            right-hand sides exist as soon as the factor does).  The
            substitution chain's sequential latency is paid once for
            both systems; per-(rhs, lane) refinement gating matches
            _dd_kkt_solve exactly.

            KEEP IN SYNC with _dd_kkt_solve above: the refinement
            acceptance semantics (accept on ratio > 1.0, continue on
            ratio > min(ir_stopratio, 1.2), nir seeded at npass_fused)
            are intentionally duplicated rather than unified — folding
            the single-RHS path into an r=1 call of these kernels
            would re-lower the proven combined-solve path."""
            dj = fac["dj"]
            djp = dj[permj]
            b1 = jnp.concatenate([rx1, rz1])
            b2 = jnp.concatenate([rx2, rz2])
            bs = jnp.stack([(dj * b1)[permj], (dj * b2)[permj]], axis=1)
            normb = jnp.stack([_inf_norm(b1), _inf_norm(b2)])
            tol = ir_abstol + ir_reltol * normb  # (2,)

            def unscaled_norm(rs):  # rs (N, 2)
                return jnp.max(jnp.abs(rs / djp[:, None]), axis=0)

            if ir_enable:
                x, e0 = _dd_refsolve2(
                    fac["Kh"], fac["Kl"], fac["Lh"], fac["Ll"],
                    fac["Dh"], fac["Dl"], bs,
                )
                norme0 = unscaled_norm(e0)  # (2,)
                ok0 = jnp.isfinite(norme0)

                def cond(c):
                    _, _, norme, i, stop, ok = c
                    live = (~stop) & ok & (norme > tol)
                    return (i < ir_maxiter) & jnp.any(live)

                def body(c):
                    xc, e, norme, i, stop, okc = c
                    live = (~stop) & okc & (norme > tol)
                    dx = _dd_solve2(
                        fac["Lh"], fac["Ll"], fac["Dh"], fac["Dl"], e
                    )
                    xn = xc + dx
                    en = jnp.stack(
                        [
                            _dd_resid(fac["Kh"], fac["Kl"], xn[:, 0],
                                      bs[:, 0]),
                            _dd_resid(fac["Kh"], fac["Kl"], xn[:, 1],
                                      bs[:, 1]),
                        ],
                        axis=1,
                    )
                    normen = unscaled_norm(en)
                    okn = jnp.isfinite(normen)
                    ratio = norme / jnp.where(normen > 0, normen, 1e-300)
                    accept = live & (ratio > 1.0)
                    keep_going = live & (ratio > min(ir_stopratio, 1.2))
                    am = accept[None, :]
                    return (
                        jnp.where(am, xn, xc),
                        jnp.where(am, en, e),
                        jnp.where(accept, normen, norme),
                        i + 1,
                        stop | ~keep_going,
                        jnp.where(live, okn, okc),
                    )

                stop0 = jnp.zeros(2, dtype=bool)
                x, _, norme, nir, _, okr = jax.lax.while_loop(
                    cond, body, (x, e0, norme0, npass_fused, stop0, ok0)
                )
                ok = jnp.all(okr & jnp.isfinite(norme))
            else:
                x = _dd_solve2(
                    fac["Lh"], fac["Ll"], fac["Dh"], fac["Dl"], bs
                )
                nir = jnp.asarray(0)
                ok = jnp.all(jnp.isfinite(x))
            xout = dj[:, None] * x[iperm, :]
            return (
                xout[:n, 0], xout[n:, 0], xout[:n, 1], xout[n:, 1],
                ok, jnp.max(jnp.asarray(nir)),
            )

        _dd_kkt_solve.pair = _dd_kkt_solve_pair
        return factorize, _dd_kkt_solve

    def _refine(fac, b, x0):
        """Iterative refinement against the unregularized K
        (kktsolver_directldl.jl:389-449)."""
        K = fac["K"]
        normb = _inf_norm(b)
        tol = ir_abstol + ir_reltol * normb

        e0 = b - K @ x0
        norme0 = _inf_norm(e0)
        ok0 = jnp.isfinite(norme0)

        def cond(c):
            _, _, norme, i, stop, ok = c
            return (~stop) & ok & (i < ir_maxiter) & (norme > tol)

        def body(c):
            x, e, norme, i, _, _ = c
            dx = _raw_solve(fac, e)
            xn = x + dx
            en = b - K @ xn
            normen = _inf_norm(en)
            okn = jnp.isfinite(normen)
            ratio = norme / jnp.where(normen > 0, normen, 1e-300)
            # Reference semantics (kktsolver_directldl.jl:430-438): stop
            # once a pass improves by less than stop_ratio, accepting the
            # final step only if it improved at all.  With reduced-
            # precision factors convergence is geometric with a smaller
            # per-pass ratio, so the effective threshold is capped at
            # 1.2: each pass still making >20% progress keeps running
            # (max_iter bounds the loop either way), while a user
            # tightening the setting below 1.2 is honored exactly.
            accept = ratio > 1.0
            keep_going = ratio > min(ir_stopratio, 1.2)
            x_out = jnp.where(accept, xn, x)
            e_out = jnp.where(accept, en, e)
            norme_out = jnp.where(accept, normen, norme)
            return (x_out, e_out, norme_out, i + 1, ~keep_going, okn)

        x, _, norme, nir, _, ok = jax.lax.while_loop(
            cond, body, (x0, e0, norme0, 0, False, ok0)
        )
        return x, ok & jnp.isfinite(norme), nir

    def solve(fac, rx, rz):
        """-> (x, z, ok, n_refinement_passes)."""
        b = jnp.concatenate([rx, rz])
        x = _raw_solve(fac, b)
        if ir_enable:
            x, ok, nir = _refine(fac, b, x)
        else:
            ok = jnp.all(jnp.isfinite(x))
            nir = jnp.asarray(0)
        return x[:n], x[n:], ok, nir

    return factorize, solve
