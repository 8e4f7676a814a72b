"""Component/unit tests for cone kernels against dense references
(parity with reference test/UnitTests/test_coneops_secondordercone.jl
and test_coneops_psdtrianglecone.jl)."""

import numpy as np
import jax.numpy as jnp

import cuclarabel_tpu as cc
from cuclarabel_tpu.cones import ops as cone_ops
from cuclarabel_tpu.cones import psd as psd_ops
from cuclarabel_tpu.cones.layout import build_layout

rng = np.random.default_rng(242713)


def _soc_interior(n):
    v = rng.standard_normal(n)
    v[0] = np.linalg.norm(v[1:]) + 1.0
    return v


def test_soc_scaling_identities():
    n = 5
    layout = build_layout((cc.SecondOrderConeT(n),))
    s = jnp.asarray(_soc_interior(n))
    z = jnp.asarray(_soc_interior(n))
    mu = float(s @ z)
    state, ok = cone_ops.update_scaling(layout, s, z, mu, 0)
    assert bool(ok)

    # dense W'W from the closed form 2ww' - J (coneops_socone.jl:156-192)
    w = np.asarray(state["soc_w"])
    eta = float(state["soc_eta"][0])
    J = -np.eye(n)
    J[0, 0] = 1.0
    WtW = eta**2 * (2.0 * np.outer(w, w) - J)

    # Hs assembly and mul_Hs must both agree with the dense form
    H = np.asarray(cone_ops.assemble_Hs_dense(layout, state))
    assert np.linalg.norm(H - WtW) < 1e-12
    for _ in range(3):
        x = rng.standard_normal(n)
        y = np.asarray(cone_ops.mul_Hs(layout, state, jnp.asarray(x)))
        assert np.linalg.norm(y - WtW @ x) < 1e-12

    # W and Winv by repeated multiplication: W Winv = I, W'W = WtW
    W = np.zeros((n, n))
    Winv = np.zeros((n, n))
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        W[:, i] = np.asarray(
            cone_ops._soc_mul_W(layout, state["soc_eta"], state["soc_w"], jnp.asarray(e))
        )
        Winv[:, i] = np.asarray(
            cone_ops._soc_mul_Winv(
                layout, state["soc_eta"], state["soc_w"], jnp.asarray(e)
            )
        )
    assert np.linalg.norm(W - W.T) < 1e-12
    assert np.linalg.norm(W @ Winv - np.eye(n)) < 1e-12
    assert np.linalg.norm(W @ W - WtW) < 1e-10

    # lambda = W z = W^{-T} s (NT scaling-point identity)
    lam = np.asarray(state["soc_lam"])
    assert np.linalg.norm(W @ np.asarray(z) - lam) < 1e-10
    assert np.linalg.norm(Winv.T @ np.asarray(s) - lam) < 1e-10


def _rand_psd(r):
    F = rng.standard_normal((r, r))
    return F @ F.T + r * np.eye(r)


def _mat_to_svec_np(M):
    r = M.shape[0]
    out = []
    for j in range(r):
        for i in range(j + 1):
            out.append(M[i, i] if i == j else M[i, j] * np.sqrt(2.0))
    return np.asarray(out)


def test_psd_svec_roundtrip_and_inner_product():
    r = 4
    M = _rand_psd(r)
    v = _mat_to_svec_np(M)
    M2 = np.asarray(psd_ops.svec_to_mat(jnp.asarray(v)[None, :], r))[0]
    assert np.linalg.norm(M2 - M) < 1e-12
    v2 = np.asarray(psd_ops.mat_to_svec(jnp.asarray(M)[None, :, :], r))[0]
    assert np.linalg.norm(v2 - v) < 1e-12
    # svec preserves the Frobenius inner product
    N = _rand_psd(r)
    assert abs(v @ _mat_to_svec_np(N) - np.sum(M * N)) < 1e-10


def test_psd_scaling_identities():
    r = 4
    layout = build_layout((cc.PSDTriangleConeT(r),))
    S = _rand_psd(r)
    Z = _rand_psd(r)
    s = jnp.asarray(_mat_to_svec_np(S))
    z = jnp.asarray(_mat_to_svec_np(Z))
    state, ok = psd_ops.update_scaling(layout, s, z, )
    assert bool(ok)

    R = np.asarray(state[f"psd{r}_R"])[0]
    Rinv = np.asarray(state[f"psd{r}_Rinv"])[0]
    lam = np.asarray(state[f"psd{r}_lam"])[0]

    assert np.linalg.norm(R @ Rinv - np.eye(r)) < 1e-9
    # NT identity: W z = W^{-T} s = Lambda (as matrices:
    # R' Z R = Rinv S Rinv' = diag(lam))
    WZ = R.T @ Z @ R
    WS = Rinv @ S @ Rinv.T
    assert np.linalg.norm(WZ - np.diag(lam)) < 1e-8
    assert np.linalg.norm(WS - np.diag(lam)) < 1e-8

    # Hs action = svec((RR') X (RR'))
    H = np.asarray(
        psd_ops.add_Hs_dense(layout, state, jnp.zeros((layout.m, layout.m)))
    )
    X = _rand_psd(r)
    x = _mat_to_svec_np(X)
    RRt = R @ R.T
    expect = _mat_to_svec_np(RRt @ X @ RRt)
    assert np.linalg.norm(H @ x - expect) < 1e-8
    y = np.asarray(psd_ops.mul_Hs(layout, state, jnp.asarray(x), jnp.zeros(layout.m)))
    assert np.linalg.norm(y - expect) < 1e-8


def test_psd_step_length_matches_dense_eig():
    r = 3
    layout = build_layout((cc.PSDTriangleConeT(r),))
    Z = _rand_psd(r)
    S = _rand_psd(r)
    dZ = rng.standard_normal((r, r))
    dZ = (dZ + dZ.T) / 2
    dS = rng.standard_normal((r, r))
    dS = (dS + dS.T) / 2

    z = jnp.asarray(_mat_to_svec_np(Z))
    s = jnp.asarray(_mat_to_svec_np(S))
    dz = jnp.asarray(_mat_to_svec_np(dZ))
    ds = jnp.asarray(_mat_to_svec_np(dS))
    state, _ = psd_ops.update_scaling(layout, s, z)
    alpha = float(psd_ops.step_length(layout, state, dz, ds, z, s, jnp.asarray(10.0)))

    # brute force: largest a with Z + a dZ >= 0 and S + a dS >= 0
    def maxstep(M, dM):
        lo, hi = 0.0, 10.0
        for _ in range(60):
            mid = (lo + hi) / 2
            if np.linalg.eigvalsh(M + mid * dM)[0] >= 0:
                lo = mid
            else:
                hi = mid
        return lo

    expect = min(maxstep(Z, dZ), maxstep(S, dS))
    assert abs(alpha - expect) < 1e-6


def test_equilibration_bounds():
    """Scalings clipped to [min, max] (parity with reference
    test/UnitTests/test_equilibration_bounds.jl)."""
    from cuclarabel_tpu.equilibration import ruiz_equilibrate
    from cuclarabel_tpu.settings import Settings

    st = Settings()
    P = np.array([[1e-15, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A0 = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    A = np.vstack([-A0, A0])
    b = np.concatenate([-np.array([1.0, 0, 0]), np.array([1.0, 0.7, 0.7])])
    layout = build_layout((cc.NonnegativeConeT(3), cc.NonnegativeConeT(3)))

    for mod in ("tiny_P", "huge_A"):
        Pm, Am = P.copy(), A.copy()
        if mod == "huge_A":
            Pm = np.array([[4.0, 1.0], [1.0, 2.0]])
            Am[0, 0] = 1e15
        _, _, _, _, d, e, c = ruiz_equilibrate(Pm, Am, q, b, layout, st)
        assert d.min() >= st.equilibrate_min_scaling
        assert e.min() >= st.equilibrate_min_scaling
        assert d.max() <= st.equilibrate_max_scaling
        assert e.max() <= st.equilibrate_max_scaling

    # zero A rows: e stays at 1
    _, _, _, _, d, e, c = ruiz_equilibrate(
        np.array([[4.0, 1.0], [1.0, 2.0]]), np.zeros_like(A), q, b, layout, st
    )
    assert np.all(e == 1.0)


def test_cone_collapsing():
    """Parity with test_cones_new_collapsed.jl edge cases."""
    from cuclarabel_tpu.cones.api import cones_collapsed

    # runs of NN + 1d SOC + 1d PSD merge; empties drop
    cones = [
        cc.NonnegativeConeT(2),
        cc.SecondOrderConeT(1),
        cc.ZeroConeT(0),
        cc.PSDTriangleConeT(1),
        cc.SecondOrderConeT(3),
        cc.NonnegativeConeT(0),
        cc.NonnegativeConeT(1),
    ]
    out = cones_collapsed(cones)
    assert out == [
        cc.NonnegativeConeT(4),
        cc.SecondOrderConeT(3),
        cc.NonnegativeConeT(1),
    ]
    # empty cone outside a run is dropped
    assert cones_collapsed([cc.ZeroConeT(2), cc.ZeroConeT(0)]) == [cc.ZeroConeT(2)]
