"""Batch-compaction (staged quorum) solving: BatchSolver with
settings.batch_compaction in (0, 1) runs the batched loop to a quorum,
then resumes stragglers from mid-loop state in a narrower program
(parallel/batch.py make_batch_stage_fns).  No reference counterpart —
the reference solves one problem per process (SURVEY.md §2.9); the
correctness contract here is equivalence with the plain batched path.
"""

import numpy as np
import pytest

import cuclarabel_tpu as cc
from cuclarabel_tpu.parallel.batch import BatchSolver
from cuclarabel_tpu.statuscodes import SolverStatus

from test_batch_sharding import portfolio_batch


def _mixed_qp_batch(B, n, seed=0):
    """Random strictly-convex QPs with a wide conditioning spread so
    iteration counts differ across the batch (compaction is exercised
    only when a straggler tail exists)."""
    rng = np.random.default_rng(seed)
    Ps, qs, As, bs = [], [], [], []
    for i in range(B):
        M = rng.standard_normal((n, n))
        # conditioning ramps across the batch
        scale = 10.0 ** (3.0 * i / max(1, B - 1))
        P = M @ M.T + np.eye(n)
        P[0, 0] *= scale
        Ps.append(P)
        qs.append(rng.standard_normal(n))
        As.append(-np.eye(n))
        bs.append(np.abs(rng.standard_normal(n)) + 0.5)
    cones = [cc.NonnegativeConeT(n)]
    return (np.stack(Ps), np.stack(qs), np.stack(As), np.stack(bs), cones)


def _assert_matches(plain, staged, tol=1e-6):
    assert len(plain) == len(staged)
    for a, c in zip(plain, staged):
        assert a.status == c.status, (a.status, c.status)
        if a.status in (SolverStatus.SOLVED, SolverStatus.ALMOST_SOLVED):
            denom = max(1.0, abs(a.obj_val))
            assert abs(a.obj_val - c.obj_val) < tol * denom
            assert np.allclose(a.x, c.x, atol=1e-5, rtol=1e-5)


def test_staged_matches_plain_qp():
    P, q, A, b, cones = _mixed_qp_batch(16, 8, seed=3)
    plain = BatchSolver(P, q, A, b, cones).solve()
    bs = BatchSolver(P, q, A, b, cones, batch_compaction=0.5)
    staged = bs.solve()
    _assert_matches(plain, staged)
    # the conditioning ramp guarantees a straggler tail: stage 2 must
    # actually have run for this test to mean anything
    assert bs.last_compaction["remainder"] > 0


def test_staged_matches_plain_socp():
    A, qs, bs_, cones = portfolio_batch(B=24, nass=16, seed=1)
    plain = BatchSolver(None, qs, A, bs_, cones).solve()
    bs = BatchSolver(None, qs, A, bs_, cones, batch_compaction=0.6)
    staged = bs.solve()
    _assert_matches(plain, staged)


def test_staged_preserves_certificates():
    # one primal-infeasible problem inside an otherwise-feasible batch:
    # x >= 1 and x <= -1 (as -x >= 1)
    P, q, A, b, cones = _mixed_qp_batch(8, 4, seed=5)
    A = A.copy()
    b = b.copy()
    A[3] = np.vstack([-np.eye(4)[:2], np.eye(4)[:2]])
    b[3] = np.array([-1.0, -1.0, -1.0, -1.0])
    bs = BatchSolver(P, q, A, b, cones, batch_compaction=0.5)
    staged = bs.solve()
    assert staged[3].status in (
        SolverStatus.PRIMAL_INFEASIBLE,
        SolverStatus.ALMOST_PRIMAL_INFEASIBLE,
    )
    for i in (0, 1, 2, 4, 5, 6, 7):
        assert staged[i].status == SolverStatus.SOLVED


def test_staged_warm_start():
    A, qs, bs_, cones = portfolio_batch(B=8, nass=12, seed=2)
    bs = BatchSolver(None, qs, A, bs_, cones, batch_compaction=0.5)
    cold = bs.solve()
    X = np.stack([s.x for s in cold])
    Sv = np.stack([s.s for s in cold])
    Z = np.stack([s.z for s in cold])
    warm = bs.solve(warm_start=(X, Sv, Z))
    assert all(s.status == SolverStatus.SOLVED for s in warm)
    assert max(s.iterations for s in warm) <= max(s.iterations for s in cold)


def test_compaction_setting_validation():
    with pytest.raises(ValueError):
        cc.Settings(batch_compaction=1.0).validate()
    with pytest.raises(ValueError):
        cc.Settings(batch_compaction=-0.1).validate()
    P, q, A, b, cones = _mixed_qp_batch(8, 4)
    with pytest.raises(ValueError):
        BatchSolver(P, q, A, b, cones, batch_compaction=0.5, n_devices=2)


def test_batch_chunking_matches_unchunked():
    """batch_chunk_size splits a wide batch into chunk-wide programs
    (all enqueued before one fence); results must match the monolithic
    program per problem, for both the plain and the compacted
    (chunk x compaction) paths, including a non-divisible tail chunk."""
    import numpy as np

    import cuclarabel_tpu as cc
    from cuclarabel_tpu.parallel import BatchSolver

    rng = np.random.default_rng(9)
    B, n = 40, 8
    A = np.vstack([np.ones((1, n)), -np.eye(n)])
    bs = np.tile(np.concatenate([[1.0], np.zeros(n)]), (B, 1))
    qs = rng.standard_normal((B, n))
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(n)]

    ref = BatchSolver(None, qs, A, bs, cones, batch_chunk_size=0,
                      batch_compaction=0.0).solve()
    # chunk width 16 -> chunks of 16, 16, and a tail of 8 (padded)
    for compaction in (0.0, 0.5):
        slv = BatchSolver(None, qs, A, bs, cones, batch_chunk_size=16,
                          batch_compaction=compaction)
        assert slv._chunk == 16
        sols = slv.solve()
        assert slv.last_compaction.get("chunks") == 3
        for i in range(B):
            assert sols[i].status == cc.SolverStatus.SOLVED
            assert abs(sols[i].obj_val - ref[i].obj_val) < 1e-9, i
            np.testing.assert_allclose(sols[i].x, ref[i].x, atol=1e-8)


def test_batch_chunk_auto_resolution():
    """-1 auto chunks at 4096 only above 4096; explicit widths win."""
    from cuclarabel_tpu.settings import Settings

    s = Settings()
    assert s.resolved_batch_chunk(4096) == 0
    assert s.resolved_batch_chunk(8192) == 4096
    assert Settings(batch_chunk_size=0).resolved_batch_chunk(10**5) == 0
    assert Settings(batch_chunk_size=512).resolved_batch_chunk(1024) == 512
    assert Settings(batch_chunk_size=512).resolved_batch_chunk(512) == 0
