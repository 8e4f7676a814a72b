"""Fresh remote-compile timing of the sparse multifrontal program
(VERDICT r4 #2 'done' bar): persistent compile cache DISABLED so the
measurement is a true fresh compile on this runtime's helper.

Usage: python scripts/sparse_compile_fresh.py [k]   (N_kkt = 2k^2+1)
Appends a record to benchmarks/ab_results/sparse_compile_r05.json.
"""
import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_compilation_cache", False)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scipy.sparse as sp  # noqa: E402

import cuclarabel_tpu as cc  # noqa: E402
from cuclarabel_tpu.sparse_solver import SparseSolver  # noqa: E402


def grid_qp(k):
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
    return P, np.ones(n), (-sp.eye(n)).tocsc(), np.zeros(n), [
        cc.NonnegativeConeT(n)]


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    P, q, A, b, cones = grid_qp(k)
    t0 = time.time()
    s = SparseSolver(P, q, A, b, cones)
    t_setup = time.time() - t0
    t0 = time.time()
    sol = s.solve()
    t_first = time.time() - t0
    t0 = time.time()
    sol2 = s.solve()
    t_warm = time.time() - t0
    rec = {
        "k": k, "N_kkt": 2 * k * k + 1,
        "backend": jax.default_backend(),
        "persistent_cache": False,
        "setup_s": round(t_setup, 1),
        "fresh_compile_plus_first_solve_s": round(t_first, 1),
        "warm_solve_s": round(t_warm, 2),
        "status": sol.status.name,
        "iterations": sol.iterations,
    }
    print(json.dumps(rec), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "benchmarks", "ab_results",
                        "sparse_compile_r05.json")
    path = os.path.normpath(path)
    recs = []
    if os.path.exists(path):
        with open(path) as f:
            recs = json.load(f)
    recs.append(rec)
    with open(path, "w") as f:
        json.dump(recs, f, indent=1)
