"""precompile(): the reference's precompile.jl analog — every cone
family's standard workload solves, and user signatures are warmed."""

import numpy as np

import cuclarabel_tpu as cc


def test_precompile_families():
    out = cc.precompile(families=("lp", "qp", "socp"))
    assert set(out) == {"lp", "qp", "socp"}
    assert all(t > 0 for t in out.values())


def test_precompile_all_cone_families():
    # one workload per cone family (precompile.jl:50-57 census)
    out = cc.precompile()
    assert set(out) == {"lp", "qp", "socp", "exp", "pow", "genpow", "sdp"}


def test_precompile_signature():
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.vstack([np.ones((1, 2)), -np.eye(2)])
    b = np.array([1.0, 0.0, 0.0])
    cones = [cc.ZeroConeT(1), cc.NonnegativeConeT(2)]
    out = cc.precompile(
        families=(),
        signatures=[lambda: cc.Solver(P, q, A, b, cones)],
    )
    assert "signature_0" in out
