"""Pallas batched LDL^T kernel tests (interpret mode on CPU; the same
kernels compile to Mosaic on TPU — see kkt/pallas_ldl.py for measured
speedups vs XLA's pivoted LU)."""

import numpy as np
import jax.numpy as jnp

import cuclarabel_tpu  # noqa: F401  (enables x64; kernels must handle it)
from cuclarabel_tpu.kkt.pallas_ldl import ldl_factor_batched, ldl_solve_batched

rng = np.random.default_rng(0)


def _random_kkt_batch(B, n, m):
    Ks = []
    for _ in range(B):
        F = rng.standard_normal((n, n))
        P = F @ F.T + 0.1 * np.eye(n)
        A = rng.standard_normal((m, n))
        H = np.diag(rng.random(m) + 0.5)
        Ks.append(np.block([[P, A.T], [A, -H]]))
    return np.stack(Ks)


def test_factor_reconstructs():
    B, n, m = 5, 9, 7
    N = n + m
    Ks = _random_kkt_batch(B, n, m)
    L, Dinv = ldl_factor_batched(jnp.asarray(Ks, jnp.float32), interpret=True)
    Ln = np.tril(np.asarray(L), -1) + np.eye(N)
    D = 1.0 / np.asarray(Dinv)
    for i in range(B):
        R = Ln[i] @ np.diag(D[i]) @ Ln[i].T
        assert np.abs(R - Ks[i]).max() / np.abs(Ks[i]).max() < 1e-4


def test_solve_matches_numpy():
    B, n, m = 4, 8, 6
    N = n + m
    Ks = _random_kkt_batch(B, n, m)
    K = jnp.asarray(Ks, jnp.float32)
    L, Dinv = ldl_factor_batched(K, interpret=True)
    b = rng.standard_normal((B, N))
    x = np.asarray(
        ldl_solve_batched(L, Dinv, jnp.asarray(b, jnp.float32), interpret=True)
    )
    for i in range(B):
        expect = np.linalg.solve(Ks[i], b[i])
        assert np.abs(x[i] - expect).max() < 1e-2  # f32 substitution
        assert np.abs(Ks[i] @ x[i] - b[i]).max() < 1e-3


def test_inertia_matches_quasidefiniteness():
    B, n, m = 3, 6, 5
    Ks = _random_kkt_batch(B, n, m)
    _, Dinv = ldl_factor_batched(jnp.asarray(Ks, jnp.float32), interpret=True)
    D = 1.0 / np.asarray(Dinv)
    # pivot-free LDL^T of a quasidefinite matrix: n positive, m negative
    assert np.all((D > 0).sum(axis=1) == n)
    assert np.all((D < 0).sum(axis=1) == m)


def test_nonaligned_batch_padding():
    """Batch sizes that don't divide the 128-lane tile are padded."""
    B, n, m = 3, 5, 4
    Ks = _random_kkt_batch(B, n, m)
    L, Dinv = ldl_factor_batched(jnp.asarray(Ks, jnp.float32), interpret=True)
    assert L.shape == (B, n + m, n + m)
    assert Dinv.shape == (B, n + m)
    assert bool(jnp.all(jnp.isfinite(Dinv)))
