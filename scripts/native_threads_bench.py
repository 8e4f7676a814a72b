"""Multi-thread scaling of the native C++ LDL refactorization.

The reference's performance backend is multithreaded Pardiso
(`ext/directldl_pardiso.jl:1-255`, `max_threads` forwarded via
settings.jl:108-110); this framework's host-side equivalent is the
level-parallel OpenMP refactorization in native/ldl.cpp.  VERDICT r3
noted the repo honors max_threads but published no measured speedup —
this benchmark produces that table.

Problem: grid-Laplacian KKT patterns (the AUG2D structural class) at a
few sizes, nested-dissection ordered; the numeric refactor runs R times
per thread count on an OTHERWISE IDLE host (OpenMP spin-waits thrash
badly under CPU oversubscription — run nothing else).

Usage: python scripts/native_threads_bench.py
Writes benchmarks/ab_results/native_threads.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuclarabel_tpu.native import LDLFactor, get_lib  # noqa: E402
from cuclarabel_tpu.kkt.sparse_symbolic import nested_dissection  # noqa: E402


def grid_kkt(k, seed=0):
    """ND-permuted upper-CSC pattern+values of [[P, A'], [A, -H]] for
    the k x k grid QP (P = 2D Laplacian + I, A = [ones; -I])."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    n = k * k
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (k, k))
    P = (sp.kron(sp.eye(k), T) + sp.kron(T, sp.eye(k)) + sp.eye(n)).tocsc()
    A = sp.vstack([sp.csr_matrix(np.ones((1, n))), -sp.eye(n)]).tocsc()
    m = A.shape[0]
    H = sp.diags(0.5 + rng.random(m))
    K = sp.bmat([[P, A.T], [A, -H]], format="csc")
    N = K.shape[0]
    dsigns = np.concatenate([np.ones(n), -np.ones(m)])

    Kf = K.tocsc()
    nd = nested_dissection(
        N, sp.triu(Kf).tocsc().indptr.astype(np.int64),
        sp.triu(Kf).tocsc().indices.astype(np.int64))
    Kp = Kf[nd][:, nd]
    Ku = sp.triu(Kp).tocsc()
    return N, Ku.indptr.astype(np.int64), Ku.indices.astype(np.int64), \
        np.asarray(Ku.data), dsigns[nd]


def main():
    if get_lib() is None:
        print("native library unavailable")
        return
    out = {"host_cores": os.cpu_count(), "cases": []}
    for k in (40, 70, 100):
        N, Ap, Ai, Ax, ds = grid_kkt(k)
        rows = []
        base = None
        for nt in (1, 2, 4):
            f = LDLFactor(N, Ap, Ai, ds.astype(np.int64), max_threads=nt)
            f.refactor(Ax)
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                f.refactor(Ax)
            dt = (time.perf_counter() - t0) / reps * 1e3
            # correctness: one solve residual
            b = np.arange(1, N + 1, dtype=np.float64) / N
            x = f.solve(b)
            import scipy.sparse as sp

            Ku = sp.csc_matrix((Ax, Ai, Ap), shape=(N, N))
            K = Ku + sp.triu(Ku, 1).T
            res = float(np.abs(K @ x - b).max())
            if base is None:
                base = dt
            rows.append({"threads": nt, "refactor_ms": round(dt, 3),
                         "speedup": round(base / dt, 2),
                         "solve_residual": res})
            print(f"k={k} N={N} threads={nt}: {dt:.2f} ms "
                  f"(x{base/dt:.2f}) res {res:.1e}", flush=True)
        out["cases"].append({"k": k, "N": N, "nnzK": int(Ax.shape[0]),
                             "rows": rows})
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "benchmarks", "ab_results", "native_threads.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
