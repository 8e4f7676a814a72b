"""The sparse multifrontal refuses dispatches whose memory plan exceeds
the HBM budget (round-2 incident: an oversized N=20001 plan crashed the
v5e worker instead of failing cleanly)."""

import numpy as np
import pytest
import scipy.sparse as sp

import cuclarabel_tpu as cc
from cuclarabel_tpu.sparse_solver import SparseSolver


def _tiny_qp():
    n = 12
    P = sp.diags(np.ones(n)).tocsc()
    A = sp.vstack([sp.eye(n) * -1.0]).tocsc()
    b = np.zeros(n)
    q = -np.ones(n)
    return P, q, A, b, [cc.NonnegativeConeT(n)]


def test_guard_refuses_over_budget(monkeypatch):
    monkeypatch.setenv("CUCLARABEL_SPARSE_HBM_BUDGET", "1000")  # 1 kB
    P, q, A, b, cones = _tiny_qp()
    with pytest.raises(MemoryError, match="device memory"):
        SparseSolver(P, q, A, b, cones)


def test_guard_passes_under_budget(monkeypatch):
    monkeypatch.setenv("CUCLARABEL_SPARSE_HBM_BUDGET", str(int(8e9)))
    P, q, A, b, cones = _tiny_qp()
    sol = SparseSolver(P, q, A, b, cones).solve()
    assert sol.status == cc.SolverStatus.SOLVED
    np.testing.assert_allclose(sol.x, np.ones(12), atol=1e-7)


def test_memory_estimate_monotone():
    """The estimate grows with problem size and is plausibly sized."""
    from cuclarabel_tpu.kkt.sparse_tpu import SparseProblem, make_sparse_tpu_kkt
    from cuclarabel_tpu.cones.layout import build_layout
    from cuclarabel_tpu.settings import Settings

    def est(k):
        n = k * k
        # 2-D grid Laplacian-ish pattern
        rows, cols = [], []
        for i in range(n):
            rows.append(i), cols.append(i)
            if (i + 1) % k:
                rows.append(i), cols.append(i + 1)
            if i + k < n:
                rows.append(i), cols.append(i + k)
        P = sp.coo_matrix(
            (np.ones(len(rows)), (rows, cols)), shape=(n, n)
        ).tocsc()
        A = (-sp.eye(n)).tocsc()
        spp = SparseProblem.from_scipy(P, A)
        layout = build_layout((cc.NonnegativeConeT(n),))
        _, _, bufs = make_sparse_tpu_kkt(n, n, Settings(), layout, spp)
        # reach the plan through the memoized factorize fn's info
        from cuclarabel_tpu.kkt import sparse_tpu as st

        fac, _, _ = make_sparse_tpu_kkt(n, n, Settings(), layout, spp)
        return sum(v.nbytes for v in bufs.values())

    assert est(8) < est(16)
