"""Large sparse QP through SparseSolver (the device multifrontal path).

A k x k grid-Laplacian QP with simplex + bound rows: n = k^2 variables,
m = n + 1 constraints, KKT dimension N = 2n + 1.  At k = 100 this is
N = 20,001 — a (20k)^2 dense KKT would be 3.2 GB per factor copy plus
O(N^3) = 8e12 flops per iteration; the multifrontal path factors it in
O(sum of front^3) with fronts of a few hundred.

Usage: python scripts/sparse_large.py [k] [cpu]
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
    from cuclarabel_tpu.sparse_solver import SparseSolver

    k = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 100
    prec = "float32" if "f32" in sys.argv else "auto"
    rng = np.random.default_rng(0)
    n = k * k
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (k, k))
    P = (sp.kron(sp.eye(k), T) + sp.kron(T, sp.eye(k)) + sp.eye(n)).tocsc()
    q = rng.standard_normal(n)
    A = sp.vstack([sp.csr_matrix(np.ones((1, n))), -sp.eye(n)]).tocsc()
    lb = -1.0 - rng.random(n)
    b = np.concatenate([[1.0], -lb])
    cones = [api.ZeroConeT(1), api.NonnegativeConeT(n)]

    t0 = time.perf_counter()
    solver = SparseSolver(P, q, A, b, cones, kkt_factor_precision=prec)
    t_setup = time.perf_counter() - t0

    t0 = time.perf_counter()
    sol = solver.solve()  # includes compile
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    sol = solver.solve()
    t_warm = time.perf_counter() - t0

    # independent residual check on the ORIGINAL data
    x = sol.x
    s = sol.s
    z = sol.z
    rprim = np.abs(np.asarray(A @ x).ravel() + s - b).max()
    rdual = np.abs(
        np.asarray(P @ x).ravel() + q + np.asarray(A.T @ z).ravel()
    ).max()

    print(json.dumps({
        "k": k,
        "factor_precision": prec,
        "N_kkt": 2 * n + 1,
        "status": sol.status.name,
        "iterations": sol.iterations,
        "obj": round(sol.obj_val, 8),
        "setup_s": round(t_setup, 2),
        "first_solve_s": round(t_first, 2),
        "warm_solve_s": round(t_warm, 3),
        "rprim_raw": float(rprim),
        "rdual_raw": float(rdual),
    }))


if __name__ == "__main__":
    main()
