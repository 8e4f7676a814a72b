"""Precompile story, proven end-to-end (VERDICT r4 #8).

Process A warms the persistent TPU compile cache with the BENCH
config's production shapes (the portfolio-SOCP batch program at B=256
+ the sparse N=3201 grid QP); process B — a FRESH python process —
times its FIRST solve of the same shapes.  The artifact records both,
demonstrating that a shipped cache turns the multi-second (locally) /
multi-minute (remote helper) first compile into a warm dispatch.

Usage:
  python scripts/precompile_e2e.py warm    # process A
  python scripts/precompile_e2e.py timed   # process B (run after A)
  python scripts/precompile_e2e.py         # runs both via subprocess
Writes benchmarks/ab_results/precompile_e2e.json in `timed` / driver
mode.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench_batch_solver():
    import numpy as np

    from __graft_entry__ import _portfolio_socp
    from cuclarabel_tpu.parallel import BatchSolver

    A, qs, bs, cones = _portfolio_socp(nass=32, batch=256, seed=7)
    return BatchSolver(None, qs, A, bs, cones)


def _sparse_grid(k=40):
    import numpy as np
    import scipy.sparse as sp

    import cuclarabel_tpu as cc
    from cuclarabel_tpu.sparse_solver import SparseSolver

    n = k * k
    idx = lambda i, j: i * k + j  # noqa: E731
    rows = []
    for i in range(k):
        for j in range(k):
            if i + 1 < k:
                rows.append((idx(i, j), idx(i + 1, j)))
            if j + 1 < k:
                rows.append((idx(i, j), idx(i, j + 1)))
    L = sp.lil_matrix((len(rows), n))
    for r, (a, b) in enumerate(rows):
        L[r, a] = 1.0
        L[r, b] = -1.0
    P = (L.T @ L + sp.eye(n)).tocsc()
    return SparseSolver(P, np.ones(n), (-sp.eye(n)).tocsc(),
                        np.zeros(n), [cc.NonnegativeConeT(n)])


def run_phase(tag):
    import jax

    t_import = time.perf_counter()
    out = {"backend": jax.default_backend(), "phase": tag}

    t0 = time.perf_counter()
    slv = _bench_batch_solver()
    sols = slv.solve()
    out["bench_b256_first_solve_s"] = round(time.perf_counter() - t0, 2)
    out["bench_b256_n_solved"] = sum(
        1 for s in sols if s.status.name == "SOLVED")

    t0 = time.perf_counter()
    sp_slv = _sparse_grid(40)
    sol = sp_slv.solve()
    out["sparse_n3201_first_solve_s"] = round(time.perf_counter() - t0, 2)
    out["sparse_n3201_status"] = sol.status.name
    out["total_s"] = round(time.perf_counter() - t_import, 2)
    return out


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("warm", "timed"):
        rec = run_phase(mode)
        print(json.dumps(rec))
        sys.exit(0)

    # driver: warm in one subprocess, time in a second fresh one
    env = dict(os.environ)
    here = os.path.abspath(__file__)
    recs = {}
    for phase in ("warm", "timed"):
        t0 = time.time()
        p = subprocess.run([sys.executable, here, phase],
                           capture_output=True, text=True, env=env)
        lines = [ln for ln in p.stdout.splitlines()
                 if ln.startswith("{")]
        recs[phase] = json.loads(lines[-1]) if lines else {
            "error": p.stderr[-2000:]}
        recs[phase]["wall_s"] = round(time.time() - t0, 1)
        print(phase, "->", json.dumps(recs[phase]), flush=True)
    out = {
        "note": (
            "warm = fresh process paying trace+compile (populates the "
            "persistent TPU compile cache); timed = second fresh "
            "process, FIRST solve of the same production shapes via "
            "the shipped cache.  Tracing (pure python) is not cached, "
            "so the timed first-solve = trace + cached-executable "
            "load + run."
        ),
        **{f"{k}_{kk}": vv for k, rec in recs.items()
           for kk, vv in rec.items()},
    }
    path = os.path.join(os.path.dirname(here), "..", "benchmarks",
                        "ab_results", "precompile_e2e.json")
    with open(os.path.normpath(path), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.normpath(path))
