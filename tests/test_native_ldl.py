"""Native C++ sparse LDL^T kernel tests: factor/solve against dense
NumPy references on random quasidefinite KKT matrices."""

import numpy as np
import pytest

from cuclarabel_tpu.native import LDLFactor, get_lib, mindeg_ordering

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="no C++ toolchain available"
)

rng = np.random.default_rng(7)


def _dense_to_upper_csc(K):
    n = K.shape[0]
    Ap = [0]
    Ai, Ax = [], []
    for j in range(n):
        for i in range(j + 1):
            if K[i, j] != 0.0 or i == j:
                Ai.append(i)
                Ax.append(K[i, j])
        Ap.append(len(Ai))
    return np.asarray(Ap), np.asarray(Ai), np.asarray(Ax)


def _random_kkt(n, m, density=0.4):
    F = rng.standard_normal((n, n)) * (rng.random((n, n)) < density)
    P = F @ F.T + 0.1 * np.eye(n)
    A = rng.standard_normal((m, n)) * (rng.random((m, n)) < density)
    H = np.diag(rng.random(m) + 0.5)
    K = np.block([[P, A.T], [A, -H]])
    dsigns = np.concatenate([np.ones(n), -np.ones(m)]).astype(np.int64)
    return K, dsigns


def test_factor_solve_quasidefinite():
    n, m = 12, 9
    K, dsigns = _random_kkt(n, m)
    Ap, Ai, Ax = _dense_to_upper_csc(K)
    fac = LDLFactor(n + m, Ap, Ai, dsigns, reg_enable=False)
    assert fac.refactor(Ax)
    for _ in range(3):
        b = rng.standard_normal(n + m)
        x = fac.solve(b)
        assert np.linalg.norm(K @ x - b) < 1e-8 * np.linalg.norm(b)


def test_refactor_reuses_symbolic():
    n, m = 8, 5
    K, dsigns = _random_kkt(n, m)
    Ap, Ai, Ax = _dense_to_upper_csc(K)
    fac = LDLFactor(n + m, Ap, Ai, dsigns)
    assert fac.refactor(Ax)
    # change numeric values, same pattern
    K2 = K.copy()
    K2[n:, n:] -= np.eye(m)  # strengthen -H block
    _, _, Ax2 = _dense_to_upper_csc(K2)
    assert fac.refactor(Ax2)
    b = rng.standard_normal(n + m)
    x = fac.solve(b)
    assert np.linalg.norm(K2 @ x - b) < 1e-8 * np.linalg.norm(b)


def test_dynamic_regularization_rescues_zero_pivot():
    # matrix with a structurally zero D pivot: regularization must bump it
    K = np.array([[1.0, 1.0], [1.0, 1.0]])  # singular
    Ap, Ai, Ax = _dense_to_upper_csc(K)
    dsigns = np.array([1, -1], dtype=np.int64)
    fac = LDLFactor(2, Ap, Ai, dsigns, reg_enable=True, delta=2e-7)
    assert fac.refactor(Ax)
    assert np.isfinite(fac.D).all() and fac.D[1] != 0.0


def test_ldl_signs_match_quasidefiniteness():
    n, m = 6, 4
    K, dsigns = _random_kkt(n, m)
    Ap, Ai, Ax = _dense_to_upper_csc(K)
    fac = LDLFactor(n + m, Ap, Ai, dsigns, reg_enable=False)
    assert fac.refactor(Ax)
    # quasidefinite: inertia = (n, m)
    assert (fac.D > 0).sum() == n
    assert (fac.D < 0).sum() == m


def test_mindeg_ordering_valid_permutation():
    n = 10
    M = rng.random((n, n)) < 0.3
    M = M | M.T
    np.fill_diagonal(M, False)
    Ap = [0]
    Ai = []
    for j in range(n):
        rows = np.nonzero(M[:, j])[0]
        Ai.extend(rows)
        Ap.append(len(Ai))
    perm = mindeg_ordering(n, np.asarray(Ap), np.asarray(Ai))
    assert sorted(perm.tolist()) == list(range(n))
