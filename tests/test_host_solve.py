"""host_solve routing policy (Settings.host_solve, round 5).

The policy itself only activates on a TPU-default process (verified
on-chip: warm 3.9 ms routed vs 80.7 ms device path, objectives equal
to 1e-15); these tests pin the resolution logic and the CPU-process
no-op behavior."""

import numpy as np
import pytest

import cuclarabel_tpu as cc
from cuclarabel_tpu.settings import Settings
from cuclarabel_tpu.solver import _host_solve_device


def test_policy_inert_on_cpu_process():
    # conftest pins this process to the CPU backend: routing must be
    # off regardless of the setting (there is nothing to route away
    # from), and solves work normally
    assert _host_solve_device(Settings(), 76) is None
    assert _host_solve_device(Settings(host_solve="on"), 500) is None
    n = 6
    A = np.vstack([np.ones((1, n)), -np.eye(n)])
    b = np.concatenate([[1.0], np.zeros(n)])
    s = cc.Solver(None, np.arange(1.0, n + 1), A, b,
                  [cc.ZeroConeT(1), cc.NonnegativeConeT(n)])
    sol = s.solve()
    assert sol.status == cc.SolverStatus.SOLVED
    assert s.info["linear_solver"]["host_solve"] is False


def test_policy_resolution_rules(monkeypatch):
    import cuclarabel_tpu.solver as sv

    monkeypatch.setattr(sv.jax, "default_backend", lambda: "tpu")

    class _Dev:
        pass

    monkeypatch.setattr(sv.jax, "devices",
                        lambda kind=None: [_Dev()] if kind == "cpu"
                        else [])
    # auto: small N routes, large N does not
    assert _host_solve_device(Settings(), 128) is not None
    assert _host_solve_device(Settings(), 129) is None
    # explicit kkt method opts out of auto
    assert _host_solve_device(
        Settings(kkt_solve_method="pallas"), 76) is None
    # on: any N; off: never
    assert _host_solve_device(Settings(host_solve="on"), 5000) is not None
    assert _host_solve_device(Settings(host_solve="off"), 20) is None


def test_validate_rejects_bad_value():
    with pytest.raises(ValueError, match="host_solve"):
        Settings(host_solve="maybe").validate()
