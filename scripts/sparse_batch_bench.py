"""End-to-end BatchSparseSolver throughput: B same-pattern grid QPs
through the full IPM as one vmapped device program, vs the
single-problem SparseSolver latency on the same chip.

Usage: python scripts/sparse_batch_bench.py [k] [B] [cpu]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if "cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import scipy.sparse as sp

    from cuclarabel_tpu.cones import api
    from cuclarabel_tpu.parallel import BatchSparseSolver
    from cuclarabel_tpu.settings import Settings
    from cuclarabel_tpu.sparse_solver import SparseSolver

    args = [a for a in sys.argv[1:] if a.isdigit()]
    k = int(args[0]) if args else 20
    B = int(args[1]) if len(args) > 1 else 64

    rng = np.random.default_rng(0)
    n = k * k
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (k, k))
    P = (sp.kron(sp.eye(k), T) + sp.kron(T, sp.eye(k))
         + sp.eye(n)).tocsc()
    A = sp.vstack([sp.csr_matrix(np.ones((1, n))), -sp.eye(n)]).tocsc()
    qs = rng.standard_normal((B, n))
    lbs = -1.0 - rng.random((B, n))
    bs = np.concatenate([np.ones((B, 1)), -lbs], axis=1)
    cones = [api.ZeroConeT(1), api.NonnegativeConeT(n)]

    t0 = time.perf_counter()
    solver = BatchSparseSolver(P, qs, A, bs, cones)
    t_setup = time.perf_counter() - t0

    t0 = time.perf_counter()
    sols = solver.solve()          # includes compile
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    sols = solver.solve()
    t_warm = time.perf_counter() - t0

    n_solved = sum(s.status.name == "SOLVED" for s in sols)
    iters = [s.iterations for s in sols]
    rmax = 0.0
    for i, s in enumerate(sols):
        rp = np.abs(np.asarray(A @ s.x).ravel() + s.s - bs[i]).max()
        rd = np.abs(
            np.asarray(P @ s.x).ravel() + qs[i]
            + np.asarray(A.T @ s.z).ravel()
        ).max()
        rmax = max(rmax, rp, rd)

    # single-problem latency baseline on the same chip
    single = SparseSolver(P, qs[0], A, bs[0], cones,
                          Settings(presolve_enable=False))
    single.solve()                 # compile
    t0 = time.perf_counter()
    single.solve()
    t_single = time.perf_counter() - t0

    print(json.dumps({
        "k": k, "N_kkt": 2 * n + 1, "B": B,
        "n_solved": n_solved,
        "iter_mean": round(float(np.mean(iters)), 2),
        "setup_s": round(t_setup, 2),
        "first_solve_s": round(t_first, 2),
        "warm_batch_s": round(t_warm, 3),
        "problems_per_s": round(B / t_warm, 2),
        "single_warm_s": round(t_single, 3),
        "batch_speedup": round(B * t_single / t_warm, 1),
        "max_residual_raw": float(rmax),
    }))


if __name__ == "__main__":
    main()
