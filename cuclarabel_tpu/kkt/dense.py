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

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _inf_norm(v):
    return jnp.max(jnp.abs(v))


def make_dense_kkt(n: int, m: int, settings, factor_dtype):
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

    def factorize(P, A, Hs):
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
            Kreg = K

        lu, piv = jax.scipy.linalg.lu_factor(Kreg.astype(factor_dtype))
        ok = jnp.all(jnp.isfinite(lu))
        return {"lu": lu, "piv": piv, "K": K}, ok

    def _raw_solve(fac, b):
        x = jax.scipy.linalg.lu_solve(
            (fac["lu"], fac["piv"]), b.astype(factor_dtype)
        )
        return x.astype(jnp.float64)

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
            improved = ratio >= ir_stopratio
            accept = improved | (ratio > 1.0)
            x_out = jnp.where(accept, xn, x)
            e_out = jnp.where(accept, en, e)
            norme_out = jnp.where(accept, normen, norme)
            return (x_out, e_out, norme_out, i + 1, ~improved, okn)

        x, _, norme, _, _, ok = jax.lax.while_loop(
            cond, body, (x0, e0, norme0, 0, False, ok0)
        )
        return x, ok & jnp.isfinite(norme)

    def solve(fac, rx, rz) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b = jnp.concatenate([rx, rz])
        x = _raw_solve(fac, b)
        if ir_enable:
            x, ok = _refine(fac, b, x)
        else:
            ok = jnp.all(jnp.isfinite(x))
        return x[:n], x[n:], ok

    return factorize, solve
