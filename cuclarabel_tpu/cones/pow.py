"""3-d power cone kernels, batched over all power cones in the problem.

Behavioral parity with `src/cones/coneops_powcone.jl`; (npow, 3)
vectorized math with per-cone exponent alpha.

Primal cone:  s1^a * s2^(1-a) >= |s3|, s1, s2 >= 0.
Dual cone:    (z1/a)^a * (z2/(1-a))^(1-a) >= |z3|, z1, z2 >= 0.
Dual barrier: f*(z) = -log((z1/a)^(2a) (z2/(1-a))^(2-2a) - z3^2)
              - (1-a) log z1 - a log z2.
"""

import jax.numpy as jnp
import numpy as np

from . import nonsymmetric as ns
from .nonsymmetric import logsafe

DUAL_ONLY = 1  # must match ipm/loop.py


def unit_init(layout):
    """s = z = (sqrt(1+a), sqrt(2-a), 0) (coneops_powcone.jl:36-54)."""
    a = jnp.asarray(layout.pow_alpha)
    s = jnp.stack(
        [jnp.sqrt(1.0 + a), jnp.sqrt(1.0 + (1.0 - a)), jnp.zeros_like(a)], axis=1
    )
    return s, s


def _phi_dual(z, a):
    """(z1/a)^(2a) * (z2/(1-a))^(2-2a) via logs (safe for z > 0)."""
    z1, z2 = z[:, 0], z[:, 1]
    return jnp.exp(2.0 * a * logsafe(z1 / a) + (2.0 - 2.0 * a) * logsafe(z2 / (1.0 - a)))


def _dual_grad_H(z, a):
    """Gradient and Hessian of f*(z), batched
    (update_dual_grad_H, coneops_powcone.jl:408-440)."""
    z1, z2, z3 = z[:, 0], z[:, 1], z[:, 2]
    z1s = jnp.where(z1 != 0, z1, 1.0)
    z2s = jnp.where(z2 != 0, z2, 1.0)
    phi = _phi_dual(z, a)
    psi = phi - z3 * z3
    psis = jnp.where(psi != 0, psi, 1.0)

    gp1 = 2.0 * a * phi / (z1s * psis)
    gp2 = 2.0 * (1.0 - a) * phi / (z2s * psis)
    gp3 = -2.0 * z3 / psis

    H11 = gp1 * gp1 - 2.0 * a * (2.0 * a - 1.0) * phi / (z1s * z1s * psis) + (1.0 - a) / (z1s * z1s)
    H12 = gp1 * gp2 - 4.0 * a * (1.0 - a) * phi / (z1s * z2s * psis)
    H22 = gp2 * gp2 - 2.0 * (1.0 - a) * (1.0 - 2.0 * a) * phi / (z2s * z2s * psis) + a / (z2s * z2s)
    H13 = gp1 * gp3
    H23 = gp2 * gp3
    H33 = gp3 * gp3 + 2.0 / psis
    H = jnp.stack(
        [
            jnp.stack([H11, H12, H13], axis=1),
            jnp.stack([H12, H22, H23], axis=1),
            jnp.stack([H13, H23, H33], axis=1),
        ],
        axis=1,
    )

    g1 = -2.0 * a * phi / (z1s * psis) - (1.0 - a) / z1s
    g2 = -2.0 * (1.0 - a) * phi / (z2s * psis) - a / z2s
    g3 = 2.0 * z3 / psis
    grad = jnp.stack([g1, g2, g3], axis=1)
    return grad, H


def _newton_raphson_powcone(s3, phi, a):
    """Batched NR for the primal-gradient root
    (_newton_raphson_powcone, coneops_powcone.jl:449-478).  s3 = |s3|."""
    s3s = jnp.where(s3 > 0, s3, 1.0)
    denom = jnp.where(phi != s3 * s3, phi - s3 * s3, 1.0)
    x0 = -1.0 / s3s + (2.0 * s3 + jnp.sqrt(phi * phi / (s3s * s3s) + 3.0 * phi)) / denom
    t0 = -2.0 * a * logsafe(a) - 2.0 * (1.0 - a) * logsafe(1.0 - a)

    def f0(x):
        t1 = x * x
        t2 = 2.0 * x / s3s
        return (
            2.0 * a * logsafe(2.0 * a * t1 + (1.0 + a) * t2)
            + 2.0 * (1.0 - a) * logsafe(2.0 * (1.0 - a) * t1 + (2.0 - a) * t2)
            - logsafe(phi)
            - logsafe(t1 + t2)
            - 2.0 * logsafe(t2)
            + t0
        )

    def f1(x):
        t1 = x * x
        t2 = x * 2.0 / s3s
        d1 = jnp.where(a * x + (1.0 + a) / s3s != 0, a * x + (1.0 + a) / s3s, 1.0)
        d2v = (1.0 - a) * x + (2.0 - a) / s3s
        d2 = jnp.where(d2v != 0, d2v, 1.0)
        d3 = jnp.where(t1 + t2 != 0, t1 + t2, 1.0)
        return 2.0 * a * a / d1 + 2.0 * (1.0 - a) * (1.0 - a) / d2 - 2.0 * (x + 1.0 / s3s) / d3

    return ns.newton_raphson_onesided(x0, f0, f1)


def _gradient_primal(s, a):
    """grad f(s) via NR on g3 (gradient_primal, coneops_powcone.jl:288-312)."""
    s1, s2, s3 = s[:, 0], s[:, 1], s[:, 2]
    s1s = jnp.where(s1 != 0, s1, 1.0)
    s2s = jnp.where(s2 != 0, s2, 1.0)
    phi = jnp.exp(2.0 * a * logsafe(s1) + (2.0 - 2.0 * a) * logsafe(s2))

    abs_s3 = jnp.abs(s3)
    big = abs_s3 > ns.F64EPS
    g3_pos = _newton_raphson_powcone(jnp.where(big, abs_s3, 1.0), phi, a)
    g3 = jnp.where(big, jnp.sign(s3) * g3_pos, 0.0)
    g1 = jnp.where(big, -(a * g3 * s3 + 1.0 + a) / s1s, -(1.0 + a) / s1s)
    g2 = jnp.where(
        big, -((1.0 - a) * g3 * s3 + 2.0 - a) / s2s, -(2.0 - a) / s2s
    )
    return jnp.stack([g1, g2, g3], axis=1)


def _is_primal_feasible(s, a):
    s1, s2, s3 = s[:, 0], s[:, 1], s[:, 2]
    ok = (s1 > 0) & (s2 > 0)
    res = jnp.exp(2.0 * a * logsafe(s1) + 2.0 * (1.0 - a) * logsafe(s2)) - s3 * s3
    return ok & (res > 0)


def _is_dual_feasible(z, a):
    z1, z2, z3 = z[:, 0], z[:, 1], z[:, 2]
    ok = (z1 > 0) & (z2 > 0)
    res = _phi_dual(z, a) - z3 * z3
    return ok & (res > 0)


def _barrier_dual(z, a):
    z1, z2, z3 = z[:, 0], z[:, 1], z[:, 2]
    feas = _is_dual_feasible(z, a)
    val = (
        -logsafe(_phi_dual(z, a) - z3 * z3)
        - (1.0 - a) * logsafe(z1)
        - a * logsafe(z2)
    )
    return jnp.where(feas, val, ns.BIG)


def _barrier_primal(s, a):
    """f(s) = -f*(-g(s)) - 3 (coneops_powcone.jl:236-248)."""
    feas = _is_primal_feasible(s, a)
    g = _gradient_primal(s, a)
    mg = -g
    val = (
        logsafe(_phi_dual(mg, a) - mg[:, 2] * mg[:, 2])
        + (1.0 - a) * logsafe(mg[:, 0])
        + a * logsafe(mg[:, 1])
        - 3.0
    )
    return jnp.where(feas, val, ns.BIG)


def _higher_correction(H, z, a, ds, v):
    """Batched 3rd-order correction eta
    (higher_correction!, coneops_powcone.jl:320-404)."""
    u = ns.solve_3x3_sym(H, ds)
    u_ok = jnp.all(jnp.isfinite(u), axis=1)
    u = jnp.where(u_ok[:, None], u, 0.0)

    z1, z2, z3 = z[:, 0], z[:, 1], z[:, 2]
    z1s = jnp.where(z1 != 0, z1, 1.0)
    z2s = jnp.where(z2 != 0, z2, 1.0)
    phi = _phi_dual(z, a)
    psi = phi - z3 * z3
    psis = jnp.where(psi != 0, psi, 1.0)

    gpsi = jnp.stack(
        [2.0 * a * phi / z1s, 2.0 * (1.0 - a) * phi / z2s, -2.0 * z3], axis=1
    )

    Hpsi11 = 2.0 * a * (2.0 * a - 1.0) * phi / (z1s * z1s)
    Hpsi12 = 4.0 * a * (1.0 - a) * phi / (z1s * z2s)
    Hpsi22 = 2.0 * (1.0 - a) * (1.0 - 2.0 * a) * phi / (z2s * z2s)

    u1, u2, u3 = u[:, 0], u[:, 1], u[:, 2]
    v1, v2, v3 = v[:, 0], v[:, 1], v[:, 2]

    dpsi_u = jnp.sum(gpsi * u, axis=1)
    dpsi_v = jnp.sum(gpsi * v, axis=1)

    Hpsi_v = jnp.stack(
        [Hpsi11 * v1 + Hpsi12 * v2, Hpsi12 * v1 + Hpsi22 * v2, -2.0 * v3], axis=1
    )
    u_Hpsi_v = jnp.sum(u * Hpsi_v, axis=1)

    coef = (u_Hpsi_v * psi - 2.0 * dpsi_u * dpsi_v) / (psis**3)
    coef2 = (
        4.0
        * a
        * (2.0 * a - 1.0)
        * (1.0 - a)
        * phi
        * (u1 / z1s - u2 / z2s)
        * (v1 / z1s - v2 / z2s)
        / psis
    )
    inv_psi2 = 1.0 / (psis * psis)

    e1 = (
        coef * gpsi[:, 0]
        - 2.0 * (1.0 - a) * u1 * v1 / (z1s**3)
        + coef2 / z1s
        + Hpsi_v[:, 0] * dpsi_u * inv_psi2
    )
    e2 = (
        coef * gpsi[:, 1]
        - 2.0 * a * u2 * v2 / (z2s**3)
        - coef2 / z2s
        + Hpsi_v[:, 1] * dpsi_u * inv_psi2
    )
    e3 = coef * gpsi[:, 2] + Hpsi_v[:, 2] * dpsi_u * inv_psi2

    Hpsi_u = jnp.stack(
        [Hpsi11 * u1 + Hpsi12 * u2, Hpsi12 * u1 + Hpsi22 * u2, -2.0 * u3], axis=1
    )
    eta = (
        jnp.stack([e1, e2, e3], axis=1) + Hpsi_u * (dpsi_v * inv_psi2)[:, None]
    ) / 2.0
    return jnp.where(u_ok[:, None], eta, 0.0)


# ---------------------------------------------------------------------------
# composite-dispatch entry points (called from ops.py)
# ---------------------------------------------------------------------------


def zero_scaling(layout):
    k = layout.npow
    return {
        "pow_Hs": jnp.zeros((k, 3, 3)),
        "pow_grad": jnp.zeros((k, 3)),
        "pow_H": jnp.zeros((k, 3, 3)),
        "pow_z": jnp.zeros((k, 3)),
    }


def update_scaling(layout, s, z, mu, scaling_flag):
    a = jnp.asarray(layout.pow_alpha)
    zg = z[layout.pow_idx]
    sg = s[layout.pow_idx]
    grad, H = _dual_grad_H(zg, a)

    Hs_dual = mu * H
    zt = _gradient_primal(sg, a)
    Hs_pd = ns.primal_dual_scaling_3x3(sg, zg, grad, zt, H)
    Hs = jnp.where(scaling_flag == DUAL_ONLY, Hs_dual, Hs_pd)

    ok = jnp.all(jnp.isfinite(H)) & jnp.all(jnp.isfinite(Hs))
    state = {"pow_Hs": Hs, "pow_grad": grad, "pow_H": H, "pow_z": zg}
    return state, ok


def add_Hs_dense(layout, state, Hmat):
    idx = layout.pow_idx
    return Hmat.at[idx[:, :, None], idx[:, None, :]].add(state["pow_Hs"])


def mul_Hs(layout, state, x, y):
    xg = x[layout.pow_idx]
    yg = jnp.einsum("kij,kj->ki", state["pow_Hs"], xg)
    return y.at[layout.pow_idx].set(yg)


def combined_ds_shift(layout, state, step_z, step_s, sigma_mu, z, shift):
    a = jnp.asarray(layout.pow_alpha)
    eta = _higher_correction(
        state["pow_H"], state["pow_z"], a, step_s[layout.pow_idx], step_z[layout.pow_idx]
    )
    vals = state["pow_grad"] * sigma_mu - eta
    return shift.at[layout.pow_idx].set(vals)


def step_length(layout, dz, ds, z, s, alpha, settings):
    a = jnp.asarray(layout.pow_alpha)
    zg, dzg = z[layout.pow_idx], dz[layout.pow_idx]
    sg, dsg = s[layout.pow_idx], ds[layout.pow_idx]

    def feasible(al):
        return jnp.all(_is_dual_feasible(zg + al * dzg, a)) & jnp.all(
            _is_primal_feasible(sg + al * dsg, a)
        )

    return ns.backtrack_alpha(alpha, feasible, settings)


def compute_barrier(layout, z, s, dz, ds, alpha):
    a = jnp.asarray(layout.pow_alpha)
    zg = (z + alpha * dz)[layout.pow_idx]
    sg = (s + alpha * ds)[layout.pow_idx]
    return jnp.sum(_barrier_dual(zg, a)) + jnp.sum(_barrier_primal(sg, a))
