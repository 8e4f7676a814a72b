"""Kernel-level unit tests for the nonsymmetric cones (exp/pow/genpow):
gradients/Hessians against finite differences of the barriers, the
Wright-Omega and Newton-Raphson primal gradients against their defining
identities, the 3rd-order corrections against a numerical third
derivative, and the primal-dual scaling guard activation — mirroring
the reference's symmetric-cone unit coverage (VERDICT round-1 weak #9;
reference internals at coneops_expcone.jl:288-468,
coneops_powcone.jl:288-478, coneops_nonsymmetric_common.jl:82-164)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuclarabel_tpu.cones import exp as ec
from cuclarabel_tpu.cones import genpow as gp
from cuclarabel_tpu.cones import nonsymmetric as ns
from cuclarabel_tpu.cones import pow as pc
from cuclarabel_tpu.cones.api import GenPowerConeT
from cuclarabel_tpu.cones.layout import build_layout

# interior dual points for the exp cone: z1 < 0, z3 > 0, feasibility
Z_EXP = np.array([
    [-1.0, 2.0, 1.5],
    [-0.3, 1.1, 0.7],
    [-2.5, 4.0, 0.2],
])
# interior primal points: s2 > 0, s3 > 0, s2*log(s3/s2) > s1
S_EXP = np.array([
    [-1.0, 1.0, 1.5],
    [-0.2, 0.5, 0.9],
    [-3.0, 2.0, 1.0],
])

ALPHA = 0.6
# pow dual: z1, z2 > 0, (z1/a)^2a (z2/(1-a))^(2-2a) > z3^2
Z_POW = np.array([
    [1.0, 1.2, 0.3],
    [0.5, 2.0, -0.4],
    [2.0, 0.8, 0.9],
])
# pow primal: s1, s2 > 0, s1^a s2^(1-a) > |s3|
S_POW = np.array([
    [1.0, 1.5, 0.4],
    [2.0, 0.7, -0.5],
    [0.9, 0.9, 0.1],
])


def _fd_grad(f, x, h=1e-6):
    """Central-difference gradient of scalar f at batched points (k,d)."""
    g = np.zeros_like(x)
    for j in range(x.shape[1]):
        xp = x.copy(); xp[:, j] += h
        xm = x.copy(); xm[:, j] -= h
        g[:, j] = (np.asarray(f(jnp.asarray(xp))) -
                   np.asarray(f(jnp.asarray(xm)))) / (2 * h)
    return g


def _fd_jac(g, x, h=1e-6):
    """Central-difference Jacobian of vector fn g: (k,d)->(k,d)."""
    k, d = x.shape
    J = np.zeros((k, d, d))
    for j in range(d):
        xp = x.copy(); xp[:, j] += h
        xm = x.copy(); xm[:, j] -= h
        J[:, :, j] = (np.asarray(g(jnp.asarray(xp))) -
                      np.asarray(g(jnp.asarray(xm)))) / (2 * h)
    return J


# ---------------------------------------------------------------- exp

def test_wright_omega_identity():
    z = jnp.asarray(np.linspace(1.0, 40.0, 50))
    w = ec._wright_omega(z)
    np.testing.assert_allclose(
        np.asarray(w + jnp.log(w)), np.asarray(z), rtol=1e-14
    )


def test_exp_dual_gradient_matches_fd():
    grad, H = ec._dual_grad_H(jnp.asarray(Z_EXP))
    g_fd = _fd_grad(ec._barrier_dual, Z_EXP)
    np.testing.assert_allclose(np.asarray(grad), g_fd, rtol=2e-6, atol=1e-8)


def test_exp_dual_hessian_matches_fd():
    grad, H = ec._dual_grad_H(jnp.asarray(Z_EXP))
    J = _fd_jac(lambda z: ec._dual_grad_H(z)[0], Z_EXP)
    np.testing.assert_allclose(np.asarray(H), J, rtol=5e-5, atol=1e-6)
    # symmetry
    np.testing.assert_allclose(np.asarray(H), np.swapaxes(np.asarray(H), 1, 2))


def test_exp_primal_gradient_identities():
    g = np.asarray(ec._gradient_primal(jnp.asarray(S_EXP)))
    # logarithmic homogeneity: <s, grad f(s)> = -nu = -3
    np.testing.assert_allclose((S_EXP * g).sum(axis=1), -3.0, rtol=1e-9)
    # FD of the primal barrier
    g_fd = _fd_grad(ec._barrier_primal, S_EXP)
    np.testing.assert_allclose(g, g_fd, rtol=2e-5, atol=1e-7)
    # conjugacy of LH barriers: f*(-grad f(s)) = -nu - f(s)
    fstar = np.asarray(ec._barrier_dual(jnp.asarray(-g)))
    f = np.asarray(ec._barrier_primal(jnp.asarray(S_EXP)))
    np.testing.assert_allclose(fstar, -3.0 - f, rtol=1e-8)


def test_exp_higher_correction_matches_fd_tensor():
    """eta = 0.5 * D^3 f*(z)[u, v] with H u = ds
    (higher_correction!, coneops_expcone.jl:319-366)."""
    rng = np.random.default_rng(0)
    ds = rng.standard_normal(Z_EXP.shape)
    v = rng.standard_normal(Z_EXP.shape)
    grad, H = ec._dual_grad_H(jnp.asarray(Z_EXP))
    eta = np.asarray(
        ec._higher_correction(H, jnp.asarray(Z_EXP), jnp.asarray(ds),
                              jnp.asarray(v))
    )
    u = np.linalg.solve(np.asarray(H), ds[..., None])[..., 0]
    # numerical D^3 f*[u, v]_i = d/dt [H(z + t v) @ u]_i at t=0
    h = 1e-5
    Hp = np.asarray(ec._dual_grad_H(jnp.asarray(Z_EXP + h * v))[1])
    Hm = np.asarray(ec._dual_grad_H(jnp.asarray(Z_EXP - h * v))[1])
    T_uv = np.einsum("kij,kj->ki", (Hp - Hm) / (2 * h), u)
    np.testing.assert_allclose(eta, 0.5 * T_uv, rtol=5e-4, atol=1e-6)


# ---------------------------------------------------------------- pow

def test_pow_dual_gradient_matches_fd():
    grad, H = pc._dual_grad_H(jnp.asarray(Z_POW), ALPHA)
    g_fd = _fd_grad(lambda z: pc._barrier_dual(z, ALPHA), Z_POW)
    np.testing.assert_allclose(np.asarray(grad), g_fd, rtol=2e-6, atol=1e-8)


def test_pow_dual_hessian_matches_fd():
    grad, H = pc._dual_grad_H(jnp.asarray(Z_POW), ALPHA)
    J = _fd_jac(lambda z: pc._dual_grad_H(z, ALPHA)[0], Z_POW)
    np.testing.assert_allclose(np.asarray(H), J, rtol=5e-5, atol=1e-6)


def test_pow_primal_gradient_identities():
    g = np.asarray(pc._gradient_primal(jnp.asarray(S_POW), ALPHA))
    np.testing.assert_allclose((S_POW * g).sum(axis=1), -3.0, rtol=1e-9)
    fstar = np.asarray(pc._barrier_dual(jnp.asarray(-g), ALPHA))
    f = np.asarray(pc._barrier_primal(jnp.asarray(S_POW), ALPHA))
    np.testing.assert_allclose(fstar, -3.0 - f, rtol=1e-8)


def test_pow_higher_correction_matches_fd_tensor():
    rng = np.random.default_rng(1)
    ds = rng.standard_normal(Z_POW.shape)
    v = rng.standard_normal(Z_POW.shape)
    grad, H = pc._dual_grad_H(jnp.asarray(Z_POW), ALPHA)
    eta = np.asarray(
        pc._higher_correction(H, jnp.asarray(Z_POW), ALPHA,
                              jnp.asarray(ds), jnp.asarray(v))
    )
    u = np.linalg.solve(np.asarray(H), ds[..., None])[..., 0]
    h = 1e-5
    Hp = np.asarray(pc._dual_grad_H(jnp.asarray(Z_POW + h * v), ALPHA)[1])
    Hm = np.asarray(pc._dual_grad_H(jnp.asarray(Z_POW - h * v), ALPHA)[1])
    T_uv = np.einsum("kij,kj->ki", (Hp - Hm) / (2 * h), u)
    np.testing.assert_allclose(eta, 0.5 * T_uv, rtol=5e-4, atol=1e-6)


# ------------------------------------------------------------- genpow

def test_genpow_dual_scaling_is_mu_times_fd_hessian():
    """Dual-only Hs = mu * grad^2 f*(z), reconstructed from the rank-3
    representation (coneops_genpowcone.jl:91-135)."""
    cone = GenPowerConeT([0.3, 0.7], 2)
    layout = build_layout((cone,))
    rng = np.random.default_rng(2)
    z = np.array([1.0, 2.0, 0.2, -0.3])  # u > 0 part dominates ||w||
    s = np.array([1.5, 1.0, 0.1, 0.2])
    mu = 0.37
    state, ok = gp.update_scaling(layout, jnp.asarray(s), jnp.asarray(z),
                                  jnp.asarray(mu))
    assert bool(ok)

    # reconstruct Hs action and compare with mu * FD Hessian of f*
    def fstar(zz):  # zz (k, 4) full dual vectors -> (k,) barrier values
        vals = []
        for row in np.asarray(zz):
            u, w = gp._gather(layout, jnp.asarray(row))
            vals.append(float(gp._barrier_dual(layout, u, w)[0]))
        return np.asarray(vals)

    d = 4
    Hfd = np.zeros((d, d))
    h = 1e-5
    for j in range(d):
        zp = z.copy(); zp[j] += h
        zm = z.copy(); zm[j] -= h
        Hfd[:, j] = (_fd_grad(fstar, zp[None, :], h)
                     - _fd_grad(fstar, zm[None, :], h))[0] / (2 * h)

    got = np.stack([
        np.asarray(gp.mul_Hs(layout, state, jnp.asarray(e), jnp.zeros(d)))
        for e in np.eye(d)
    ], axis=1)
    np.testing.assert_allclose(got, mu * Hfd, rtol=5e-3, atol=1e-5)


def test_genpow_primal_gradient_homogeneity():
    cone = GenPowerConeT([0.3, 0.7], 2)
    layout = build_layout((cone,))
    s = np.array([1.5, 1.0, 0.1, 0.2])
    u, w = gp._gather(layout, jnp.asarray(s))
    gpad, rpad = gp._gradient_primal(layout, u, w)
    g = np.asarray(gp._scatter_add(layout, jnp.zeros(4), gpad, rpad))
    nu = 3.0  # len(alpha) + 1
    np.testing.assert_allclose((s * g).sum(), -nu, rtol=1e-8)


# ------------------------------------ primal-dual scaling guard

def test_pd_scaling_falls_back_on_central_path():
    """On the central path s = -mu * grad f*(z), delta_s = 0 and the
    guards must reject the BFGS update -> Hs = mu * H
    (use_primal_dual_scaling, coneops_nonsymmetric_common.jl:107-164)."""
    z = jnp.asarray(Z_EXP)
    grad, H = ec._dual_grad_H(z)
    mu = 0.25
    s = -mu * grad  # exactly central
    zt = ec._gradient_primal(s)
    Hs = ns.primal_dual_scaling_3x3(s, z, grad, zt, H)
    mu_eff = jnp.sum(s * z, axis=1) / 3.0
    np.testing.assert_allclose(
        np.asarray(Hs), np.asarray(mu_eff[:, None, None] * H),
        rtol=1e-6,
    )


def test_pd_scaling_generic_point_spd():
    """Off the central path the BFGS Hs is used; it must be symmetric
    positive definite and differ from the dual scaling."""
    rng = np.random.default_rng(3)
    z = jnp.asarray(Z_EXP)
    s = jnp.asarray(S_EXP)
    grad, H = ec._dual_grad_H(z)
    zt = ec._gradient_primal(s)
    Hs = np.asarray(ns.primal_dual_scaling_3x3(s, z, grad, zt, H))
    np.testing.assert_allclose(Hs, np.swapaxes(Hs, 1, 2), atol=1e-12)
    eig = np.linalg.eigvalsh(Hs)
    assert (eig > 0).all()
    mu = (np.asarray(s) * np.asarray(z)).sum(axis=1) / 3.0
    assert not np.allclose(Hs, mu[:, None, None] * np.asarray(H))
