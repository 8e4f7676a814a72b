"""Exponential cone kernels, batched over all exp cones in the problem.

Behavioral parity with `src/cones/coneops_expcone.jl`; everything runs
as (nexp, 3)-shaped vectorized math instead of a per-cone loop.

Primal cone:  s3 >= s2*exp(s1/s2), s2, s3 > 0.
Dual cone:    z3 >= -z1*exp(z2/z1 - 1), z3 > 0, z1 < 0.
Dual barrier: f*(z) = -log(z2 - z1 - z1*log(-z3/z1)) - log(-z1) - log(z3).
"""

import jax.numpy as jnp
import numpy as np

from . import nonsymmetric as ns
from .nonsymmetric import logsafe

# fixed interior unit initialization point (coneops_expcone.jl:36-52)
UNIT_PRIMAL = np.array([-1.051383945322714, 0.556409619469370, 1.258967884768947])
UNIT_DUAL = UNIT_PRIMAL.copy()

DUAL_ONLY = 1  # must match ipm/loop.py


def _wright_omega(z):
    """Batched Wright-Omega function: solves w + log(w) = z for z >= 1
    (coneops_expcone.jl:412-468, Serrano thesis Alg. 4)."""
    # Taylor-series init around z = 1 (valid branch z < 1 + pi)
    zm1 = z - 1.0
    w_taylor = (
        1.0
        + 0.5 * zm1
        + (1.0 / 16.0) * zm1**2
        - (1.0 / 192.0) * zm1**3
        - (1.0 / 3072.0) * zm1**4
        + (13.0 / 61440.0) * zm1**5
    )
    # asymptotic-series init for large z
    zs = jnp.maximum(z, 1.0)
    logz = jnp.log(zs)
    zinv = 1.0 / zs
    q = logz * zinv
    w_asym = zs - logz + q
    q = q * zinv
    w_asym = w_asym + q * (logz / 2.0 - 1.0)
    q = q * zinv
    w_asym = w_asym + q * (logz * logz / 3.0 - 1.5 * logz + 1.0)

    w = jnp.where(z < 1.0 + np.pi, w_taylor, w_asym)

    # two Santiago refinement iterations (fixed, unrolled)
    r = z - w - jnp.log(jnp.maximum(w, 1e-300))
    for _ in range(2):
        wp1 = w + 1.0
        t = wp1 * (wp1 + (2.0 * r) / 3.0)
        w = w * (1.0 + (r / wp1) * (t - 0.5 * r) / (t - r))
        r = (2.0 * w * w - 8.0 * w - 1.0) / (72.0 * wp1**6) * r**4
    return w


def _dual_grad_H(z):
    """Gradient and Hessian of f*(z) at z, batched (k,3)
    (update_dual_grad_H, coneops_expcone.jl:370-399)."""
    z1, z2, z3 = z[:, 0], z[:, 1], z[:, 2]
    l = logsafe(-z3 / jnp.where(z1 != 0, z1, -1.0))
    r = -z1 * l - z1 + z2
    rs = jnp.where(r != 0, r, 1.0)
    z1s = jnp.where(z1 != 0, z1, -1.0)
    z3s = jnp.where(z3 != 0, z3, 1.0)
    c2 = 1.0 / rs

    g1 = c2 * l - 1.0 / z1s
    g2 = -c2
    g3 = (c2 * z1 - 1.0) / z3s
    grad = jnp.stack([g1, g2, g3], axis=1)

    H11 = (rs * rs - z1 * rs + l * l * z1 * z1) / (rs * z1s * z1s * rs)
    H12 = -l / (rs * rs)
    H22 = 1.0 / (rs * rs)
    H13 = (z2 - z1) / (rs * rs * z3s)
    H23 = -z1 / (rs * rs * z3s)
    H33 = (rs * rs - z1 * rs + z1 * z1) / (rs * rs * z3s * z3s)
    H = jnp.stack(
        [
            jnp.stack([H11, H12, H13], axis=1),
            jnp.stack([H12, H22, H23], axis=1),
            jnp.stack([H13, H23, H33], axis=1),
        ],
        axis=1,
    )
    return grad, H


def _gradient_primal(s):
    """grad f(s), batched (k,3) (coneops_expcone.jl:288-304)."""
    s1, s2, s3 = s[:, 0], s[:, 1], s[:, 2]
    s2s = jnp.where(s2 != 0, s2, 1.0)
    s3s = jnp.where(s3 != 0, s3, 1.0)
    w = _wright_omega(1.0 - s1 / s2s - logsafe(s2 / s3s))
    wm1 = jnp.where(w != 1.0, w - 1.0, 1.0)
    g1 = 1.0 / (wm1 * s2s)
    g2 = g1 + g1 * logsafe(w * s2 / s3s) - 1.0 / s2s
    g3 = w / ((1.0 - w) * s3s)
    return jnp.stack([g1, g2, g3], axis=1)


def _is_primal_feasible(s):
    s1, s2, s3 = s[:, 0], s[:, 1], s[:, 2]
    ok = (s3 > 0) & (s2 > 0)
    res = s2 * logsafe(s3 / jnp.where(s2 > 0, s2, 1.0)) - s1
    return ok & (res > 0)


def _is_dual_feasible(z):
    z1, z2, z3 = z[:, 0], z[:, 1], z[:, 2]
    ok = (z3 > 0) & (z1 < 0)
    res = z2 - z1 - z1 * logsafe(-z3 / jnp.where(z1 < 0, z1, -1.0))
    return ok & (res > 0)


def _barrier_dual(z):
    """f*(z); +BIG when infeasible (coneops_expcone.jl:219-232)."""
    z1, z2, z3 = z[:, 0], z[:, 1], z[:, 2]
    feas = _is_dual_feasible(z)
    l = logsafe(-z3 / jnp.where(z1 < 0, z1, -1.0))
    val = -logsafe(-z3 * z1) - logsafe(z2 - z1 - z1 * l)
    return jnp.where(feas, val, ns.BIG)


def _barrier_primal(s):
    """f(s) via Wright-Omega; +BIG when infeasible
    (coneops_expcone.jl:236-248)."""
    s1, s2, s3 = s[:, 0], s[:, 1], s[:, 2]
    feas = _is_primal_feasible(s)
    s2s = jnp.where(s2 > 0, s2, 1.0)
    s3s = jnp.where(s3 > 0, s3, 1.0)
    w = _wright_omega(jnp.maximum(1.0 - s1 / s2s - logsafe(s2 / s3s), 1.0))
    wbar = (w - 1.0) * (w - 1.0) / jnp.where(w > 0, w, 1.0)
    val = -logsafe(wbar) - 2.0 * logsafe(s2) - logsafe(s3) - 3.0
    return jnp.where(feas, val, ns.BIG)


def _higher_correction(H, z, ds, v):
    """Batched 3rd-order correction eta at z; u solves H u = ds
    (higher_correction!, coneops_expcone.jl:319-366).  ds = step_s,
    v = step_z."""
    u = ns.solve_3x3_sym(H, ds)
    u_ok = jnp.all(jnp.isfinite(u), axis=1)
    u = jnp.where(u_ok[:, None], u, 0.0)

    z1, z2, z3 = z[:, 0], z[:, 1], z[:, 2]
    z1s = jnp.where(z1 != 0, z1, -1.0)
    z3s = jnp.where(z3 != 0, z3, 1.0)

    gpsi3 = -z1 / z3s
    gpsi1 = logsafe(gpsi3)
    gpsi = jnp.stack([gpsi1, jnp.ones_like(z1), gpsi3], axis=1)

    psi = z1 * gpsi1 - z1 + z2
    psis = jnp.where(psi != 0, psi, 1.0)

    dpsi_u = jnp.sum(gpsi * u, axis=1)
    dpsi_v = jnp.sum(gpsi * v, axis=1)

    u1, u3 = u[:, 0], u[:, 2]
    v1, v3 = v[:, 0], v[:, 2]
    coef = (
        (u1 * (v1 / z1s - v3 / z3s) + u3 * (z1 * v3 / z3s - v1) / z3s) * psi
        - 2.0 * dpsi_u * dpsi_v
    ) / (psis**3)

    eta = coef[:, None] * gpsi
    inv_psi2 = 1.0 / (psis * psis)

    eta1 = eta[:, 0] + (
        (1.0 / psis - 2.0 / z1s) * u1 * v1 / (z1s * z1s)
        - u3 * v3 / (z3s * z3s) / psis
        + dpsi_u * inv_psi2 * (v1 / z1s - v3 / z3s)
        + dpsi_v * inv_psi2 * (u1 / z1s - u3 / z3s)
    )
    eta3 = eta[:, 2] + (
        2.0 * (z1 / psis - 1.0) * u3 * v3 / (z3s**3)
        - (u3 * v1 + u1 * v3) / (z3s * z3s) / psis
        + dpsi_u * inv_psi2 * (z1 * v3 / (z3s * z3s) - v1 / z3s)
        + dpsi_v * inv_psi2 * (z1 * u3 / (z3s * z3s) - u1 / z3s)
    )
    eta = jnp.stack([eta1, eta[:, 1], eta3], axis=1) / 2.0
    return jnp.where(u_ok[:, None], eta, 0.0)


# ---------------------------------------------------------------------------
# composite-dispatch entry points (called from ops.py)
# ---------------------------------------------------------------------------


def zero_scaling(layout):
    k = layout.nexp
    return {
        "exp_Hs": jnp.zeros((k, 3, 3)),
        "exp_grad": jnp.zeros((k, 3)),
        "exp_H": jnp.zeros((k, 3, 3)),
        "exp_z": jnp.zeros((k, 3)),
    }


def update_scaling(layout, s, z, mu, scaling_flag):
    zg = z[layout.exp_idx]
    sg = s[layout.exp_idx]
    grad, H = _dual_grad_H(zg)

    Hs_dual = mu * H
    zt = _gradient_primal(sg)
    Hs_pd = ns.primal_dual_scaling_3x3(sg, zg, grad, zt, H)
    Hs = jnp.where(scaling_flag == DUAL_ONLY, Hs_dual, Hs_pd)

    ok = jnp.all(jnp.isfinite(H)) & jnp.all(jnp.isfinite(Hs))
    state = {"exp_Hs": Hs, "exp_grad": grad, "exp_H": H, "exp_z": zg}
    return state, ok


def add_Hs_dense(layout, state, Hmat):
    idx = layout.exp_idx  # (k, 3)
    return Hmat.at[idx[:, :, None], idx[:, None, :]].add(state["exp_Hs"])


def mul_Hs(layout, state, x, y):
    xg = x[layout.exp_idx]
    yg = jnp.einsum("kij,kj->ki", state["exp_Hs"], xg)
    return y.at[layout.exp_idx].set(yg)


def combined_ds_shift(layout, state, step_z, step_s, sigma_mu, z, shift):
    eta = _higher_correction(
        state["exp_H"], state["exp_z"], step_s[layout.exp_idx], step_z[layout.exp_idx]
    )
    vals = state["exp_grad"] * sigma_mu - eta
    return shift.at[layout.exp_idx].set(vals)


def step_length(layout, dz, ds, z, s, alpha, settings):
    zg, dzg = z[layout.exp_idx], dz[layout.exp_idx]
    sg, dsg = s[layout.exp_idx], ds[layout.exp_idx]

    def feasible(a):
        return jnp.all(_is_dual_feasible(zg + a * dzg)) & jnp.all(
            _is_primal_feasible(sg + a * dsg)
        )

    return ns.backtrack_alpha(alpha, feasible, settings)


def compute_barrier(layout, z, s, dz, ds, alpha):
    zg = (z + alpha * dz)[layout.exp_idx]
    sg = (s + alpha * ds)[layout.exp_idx]
    return jnp.sum(_barrier_dual(zg)) + jnp.sum(_barrier_primal(sg))
