"""Generalized power cone kernels, batched over a padded cone batch.

Behavioral parity with `src/cones/coneops_genpowcone.jl`.  Cones are
padded to (ngp, d1max) / (ngp, d2max) index blocks (layout.py); padded
gather slots point at the cone's own first element and are masked out of
every reduction, and scatters add zeros there.

Primal cone: prod_i s_i^{a_i} >= ||w||, s_i >= 0  (s = (u, w)).
Dual cone:   prod_i (z_i/a_i)^{a_i} >= ||w||, z_i >= 0.
Dual barrier: f*(z) = -log(prod (z_i/a_i)^{2a_i} - ||w||^2)
              - sum (1-a_i) log z_i.

Unlike exp/pow this cone is dual-scaling only
(`coneops_genpowcone.jl:21`), Hs is the rank-3 form
mu*(D + pp' - qq' - rr') and is never densified in the reference; the
dense KKT backend here materializes it directly into the Hs block.
"""

import numpy as np
import jax.numpy as jnp

from . import nonsymmetric as ns
from .nonsymmetric import logsafe


def _m1(layout):
    return jnp.asarray(layout.gp_mask1, jnp.float64)


def _m2(layout):
    return jnp.asarray(layout.gp_mask2, jnp.float64)


def _gather(layout, v):
    """Padded (ngp, d1max), (ngp, d2max) views of an (m,) vector."""
    return v[layout.gp_idx1], v[layout.gp_idx2]


def _scatter_add(layout, full, vals1, vals2):
    """Accumulate padded per-cone values into an (m,) vector; padding
    contributes zero (padded indices alias the cone's first element)."""
    full = full.at[layout.gp_idx1].add(vals1 * _m1(layout))
    full = full.at[layout.gp_idx2].add(vals2 * _m2(layout))
    return full


def _phi_dual(layout, u):
    """prod_i (u_i/a_i)^(2 a_i) over masked entries, batched (ngp,)."""
    a = jnp.asarray(layout.gp_alpha)
    terms = 2.0 * a * logsafe(u / jnp.where(a > 0, a, 1.0))
    return jnp.exp(jnp.sum(jnp.where(layout.gp_mask1, terms, 0.0), axis=1))


def _phi_primal(layout, u):
    """prod_i u_i^(2 a_i) over masked entries."""
    a = jnp.asarray(layout.gp_alpha)
    terms = 2.0 * a * logsafe(u)
    return jnp.exp(jnp.sum(jnp.where(layout.gp_mask1, terms, 0.0), axis=1))


def _norm2w(layout, w):
    return jnp.sum(jnp.where(layout.gp_mask2, w * w, 0.0), axis=1)


def _is_primal_feasible(layout, u, w):
    pos = jnp.all(jnp.where(layout.gp_mask1, u > 0, True), axis=1)
    res = _phi_primal(layout, u) - _norm2w(layout, w)
    return pos & (res > 0)


def _is_dual_feasible(layout, u, w):
    pos = jnp.all(jnp.where(layout.gp_mask1, u > 0, True), axis=1)
    res = _phi_dual(layout, u) - _norm2w(layout, w)
    return pos & (res > 0)


def _barrier_dual(layout, u, w):
    a = jnp.asarray(layout.gp_alpha)
    feas = _is_dual_feasible(layout, u, w)
    res = _phi_dual(layout, u) - _norm2w(layout, w)
    val = -logsafe(res) - jnp.sum(
        jnp.where(layout.gp_mask1, (1.0 - a) * logsafe(u), 0.0), axis=1
    )
    return jnp.where(feas, val, ns.BIG)


def _newton_raphson_genpow(layout, norm_r, p, phi):
    """Batched NR for the primal gradient root
    (_newton_raphson_genpowcone, coneops_genpowcone.jl:437-472)."""
    a = jnp.asarray(layout.gp_alpha)
    mask = layout.gp_mask1
    psi = 1.0 / jnp.sum(jnp.where(mask, a * a, 0.0), axis=1)

    nrs = jnp.where(norm_r > 0, norm_r, 1.0)
    denom = jnp.where(phi != norm_r * norm_r, phi - norm_r * norm_r, 1.0)
    x0 = -1.0 / nrs + (
        psi * norm_r + jnp.sqrt((phi / (nrs * nrs) + psi * psi - 1.0) * phi)
    ) / denom

    def f0(x):
        xc = x[:, None]
        t = 2.0 * a * (
            logsafe(xc * nrs[:, None] + (1.0 + a) / jnp.where(a > 0, a, 1.0))
            - logsafe(p)
        )
        return -logsafe(2.0 * x / nrs + x * x) + jnp.sum(
            jnp.where(mask, t, 0.0), axis=1
        )

    def f1(x):
        xc = x[:, None]
        dv = nrs[:, None] * xc + (1.0 + a) / jnp.where(a > 0, a, 1.0)
        t = 2.0 * a * nrs[:, None] / jnp.where(dv != 0, dv, 1.0)
        quad = x * x + 2.0 * x / nrs
        quad = jnp.where(quad != 0, quad, 1.0)
        return -(2.0 * x + 2.0 / nrs) / quad + jnp.sum(
            jnp.where(mask, t, 0.0), axis=1
        )

    return ns.newton_raphson_onesided(x0, f0, f1)


def _gradient_primal(layout, u, w):
    """grad f(s) = (gp, gr) padded (gradient_primal!,
    coneops_genpowcone.jl:393-435)."""
    a = jnp.asarray(layout.gp_alpha)
    us = jnp.where(u != 0, u, 1.0)
    phi = _phi_primal(layout, u)
    norm_r = jnp.sqrt(_norm2w(layout, w))

    big = norm_r > ns.F64EPS
    g1 = _newton_raphson_genpow(layout, jnp.where(big, norm_r, 1.0), u, phi)
    nrs = jnp.where(norm_r > 0, norm_r, 1.0)

    gr = jnp.where(big[:, None], g1[:, None] * w / nrs[:, None], 0.0)
    gp = jnp.where(
        big[:, None],
        -(1.0 + a + a * (g1 * norm_r)[:, None]) / us,
        -(1.0 + a) / us,
    )
    return gp, gr


def _barrier_primal(layout, u, w):
    """f(s) = -f*(-g(s)) - deg (barrier_primal,
    coneops_genpowcone.jl:258-273)."""
    feas = _is_primal_feasible(layout, u, w)
    gp, gr = _gradient_primal(layout, u, w)
    deg = jnp.asarray(layout.gp_dim1, jnp.float64) + 1.0
    val = -_barrier_dual(layout, -gp, -gr) - deg
    return jnp.where(feas, val, ns.BIG)


# ---------------------------------------------------------------------------
# composite-dispatch entry points (called from ops.py)
# ---------------------------------------------------------------------------


def unit_init(layout, z, s):
    """s_i = sqrt(1 + a_i) on the alpha head, w = 0; z = s
    (unit_initialization!, coneops_genpowcone.jl:33-52)."""
    a = jnp.asarray(layout.gp_alpha)
    vals1 = jnp.sqrt(1.0 + a)
    s = _scatter_add(layout, s, vals1, jnp.zeros_like(_m2(layout)))
    z = _scatter_add(layout, z, vals1, jnp.zeros_like(_m2(layout)))
    return z, s


def zero_scaling(layout):
    k, d1 = layout.gp_idx1.shape
    d2 = layout.gp_idx2.shape[1]
    return {
        "gp_grad1": jnp.zeros((k, d1)),
        "gp_grad2": jnp.zeros((k, d2)),
        "gp_d1": jnp.zeros((k, d1)),
        "gp_d2": jnp.zeros(k),
        "gp_p1": jnp.zeros((k, d1)),
        "gp_p2": jnp.zeros((k, d2)),
        "gp_q": jnp.zeros((k, d1)),
        "gp_r": jnp.zeros((k, d2)),
        "gp_mu": jnp.zeros(()),
    }


def copy_s(layout, src, dst):
    """dst[cone ranges] = src[cone ranges] (affine_ds! / offset parity)."""
    s1, s2 = _gather(layout, src)
    return _scatter_add(layout, dst, s1, s2)


def update_scaling(layout, s, z, mu):
    """Dual gradient/Hessian factors at z (update_dual_grad_H,
    coneops_genpowcone.jl:337-389).  Hs = mu*(D + pp' - qq' - rr')."""
    a = jnp.asarray(layout.gp_alpha)
    u, w = _gather(layout, z)
    us = jnp.where(u != 0, u, 1.0)

    phi = _phi_dual(layout, u)
    n2w = _norm2w(layout, w)
    zeta = phi - n2w
    ok = jnp.all(zeta > 0) & jnp.all(jnp.isfinite(zeta))
    zs = jnp.where(zeta > 0, zeta, 1.0)

    tau = 2.0 * a / us
    grad1 = -tau * (phi / zs)[:, None] - (1.0 - a) / us
    grad2 = 2.0 * w / zs[:, None]

    p0 = jnp.sqrt(phi * (phi + n2w) / 2.0)
    p0s = jnp.where(p0 > 0, p0, 1.0)
    p1 = -2.0 * phi / p0s
    q0 = jnp.sqrt(zs * phi / 2.0)
    r1 = 2.0 * jnp.sqrt(zs / jnp.where(phi + n2w > 0, phi + n2w, 1.0))

    d1 = tau * (phi / zs)[:, None] / us + (1.0 - a) / (us * us)
    d2 = 2.0 / zs

    p_1 = (p0 / zs)[:, None] * tau
    p_2 = (p1 / zs)[:, None] * w
    q = (q0 / zs)[:, None] * tau
    r = (r1 / zs)[:, None] * w

    state = {
        "gp_grad1": grad1,
        "gp_grad2": grad2,
        "gp_d1": d1,
        "gp_d2": d2,
        "gp_p1": p_1,
        "gp_p2": p_2,
        "gp_q": q,
        "gp_r": r,
        "gp_mu": jnp.asarray(mu),
    }
    return state, ok


def _segfull(layout):
    seg = np.full(layout.m, -1, dtype=np.int32)
    for i in range(layout.ngp):
        seg[layout.gp_idx1[i][layout.gp_mask1[i]]] = i
        seg[layout.gp_idx2[i][layout.gp_mask2[i]]] = i
    return seg


def add_Hs_dense(layout, state, Hmat):
    """Materialize mu*(D + pp' - qq' - rr') per cone into the dense Hs
    (the reference instead appends sparse expansion rows,
    directldl_datamaps.jl:81-167; dense-KKT backends fold the rank-3
    terms straight into the block)."""
    m = layout.m
    mu = state["gp_mu"]

    dfull = jnp.zeros(m)
    dfull = _scatter_add(
        layout, dfull, state["gp_d1"], jnp.broadcast_to(
            state["gp_d2"][:, None], state["gp_r"].shape
        )
    )

    zero1 = jnp.zeros_like(state["gp_q"])
    zero2 = jnp.zeros_like(state["gp_r"])
    pfull = _scatter_add(layout, jnp.zeros(m), state["gp_p1"], state["gp_p2"])
    qfull = _scatter_add(layout, jnp.zeros(m), state["gp_q"], zero2)
    rfull = _scatter_add(layout, jnp.zeros(m), zero1, state["gp_r"])

    seg = jnp.asarray(_segfull(layout))
    same = (seg[:, None] == seg[None, :]) & (seg >= 0)[:, None]

    rank3 = (
        jnp.outer(pfull, pfull) - jnp.outer(qfull, qfull) - jnp.outer(rfull, rfull)
    )
    return Hmat + mu * (jnp.diag(dfull) + rank3 * same)


def mul_Hs(layout, state, x, y):
    """y = mu*(D + pp' - qq' - rr') x (mul_Hs!,
    coneops_genpowcone.jl:115-139)."""
    x1, x2 = _gather(layout, x)
    m1, m2 = _m1(layout), _m2(layout)
    x1, x2 = x1 * m1, x2 * m2

    coef_p = jnp.sum(state["gp_p1"] * x1, axis=1) + jnp.sum(
        state["gp_p2"] * x2, axis=1
    )
    coef_q = jnp.sum(state["gp_q"] * x1, axis=1)
    coef_r = jnp.sum(state["gp_r"] * x2, axis=1)

    y1 = state["gp_d1"] * x1 - coef_q[:, None] * state["gp_q"] + coef_p[:, None] * state["gp_p1"]
    y2 = state["gp_d2"][:, None] * x2 - coef_r[:, None] * state["gp_r"] + coef_p[:, None] * state["gp_p2"]
    return _scatter_add(layout, y, state["gp_mu"] * y1, state["gp_mu"] * y2)


def combined_ds_shift(layout, state, step_z, step_s, sigma_mu, z, shift):
    """sigma*mu*grad, no 3rd-order correction (combined_ds_shift!,
    coneops_genpowcone.jl:160-178)."""
    return _scatter_add(
        layout, shift, sigma_mu * state["gp_grad1"], sigma_mu * state["gp_grad2"]
    )


def step_length(layout, dz, ds, z, s, alpha, settings):
    zu, zw = _gather(layout, z)
    dzu, dzw = _gather(layout, dz)
    su, sw = _gather(layout, s)
    dsu, dsw = _gather(layout, ds)

    def feasible(al):
        return jnp.all(
            _is_dual_feasible(layout, zu + al * dzu, zw + al * dzw)
        ) & jnp.all(_is_primal_feasible(layout, su + al * dsu, sw + al * dsw))

    return ns.backtrack_alpha(alpha, feasible, settings)


def compute_barrier(layout, z, s, dz, ds, alpha):
    zu, zw = _gather(layout, z + alpha * dz)
    su, sw = _gather(layout, s + alpha * ds)
    return jnp.sum(_barrier_dual(layout, zu, zw)) + jnp.sum(
        _barrier_primal(layout, su, sw)
    )
