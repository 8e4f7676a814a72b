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


def test_parallel_refactor_matches_sequential():
    """Level-parallel refactorization (max_threads > 1) is bitwise
    identical to the sequential sweep (per-column arithmetic order is
    unchanged), and chain-like etrees fall back to 1 thread."""
    import scipy.sparse as sp

    from cuclarabel_tpu.native import LDLFactor, get_lib

    if get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    nb, bs_ = 50, 8
    blocks = []
    for _ in range(nb):
        G = rng.standard_normal((bs_, bs_))
        blocks.append(G @ G.T + bs_ * np.eye(bs_))
    K = sp.block_diag(blocks).tocsc()
    n = nb * bs_
    Ku = sp.triu(K).tocsc()
    ds = np.ones(n, dtype=np.int64)
    f1 = LDLFactor(n, Ku.indptr, Ku.indices, ds, max_threads=1)
    f4 = LDLFactor(n, Ku.indptr, Ku.indices, ds, max_threads=4)
    assert f4.nthreads == 4
    assert f1.refactor(Ku.data) and f4.refactor(Ku.data)
    np.testing.assert_array_equal(f1.Lx, f4.Lx)
    np.testing.assert_array_equal(f1.D, f4.D)
    b = rng.standard_normal(n)
    np.testing.assert_array_equal(f1.solve(b), f4.solve(b))

    # chain etree: tridiagonal -> no level parallelism, auto-fallback
    m = 256
    T = sp.diags([4 * np.ones(m), np.ones(m - 1), np.ones(m - 1)],
                 [0, 1, -1]).tocsc()
    Tu = sp.triu(T).tocsc()
    fc = LDLFactor(m, Tu.indptr, Tu.indices,
                   np.ones(m, dtype=np.int64), max_threads=4)
    assert fc.nthreads == 1


def test_max_threads_through_solver():
    """settings.max_threads reaches the native backend without error
    (reference forwards it to multithreaded LDL, settings.jl:108-110)."""
    import cuclarabel_tpu as cc

    P = np.array([[2.0, 0.0], [0.0, 2.0]])
    q = np.array([-1.0, -1.0])
    A = -np.eye(2)
    b = np.zeros(2)
    sol = cc.Solver(P, q, A, b, [cc.NonnegativeConeT(2)],
                    direct_solve_method="qdldl", max_threads=2).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    np.testing.assert_allclose(sol.x, [0.5, 0.5], atol=1e-7)
