"""On-chip PSD/chordal evidence (VERDICT r3 #6).

Solves on the real TPU through the public Solver API:
  * a plain PSD-cone problem (nearest-PSD projection class,
    basic_sdp.jl structure at nv=24 -> 300 svec vars);
  * a banded SDP decomposed by chordal decomposition into a clique
    chain (~50 cliques), full compact transform + dual completion
    (sdp_chordal.jl:78-110 behavior class).

Writes benchmarks/ab_results/sdp_tpu.json.

Usage: python scripts/sdp_tpu.py [cpu]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run():
    import jax

    if "cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import cuclarabel_tpu as cc

    out = {"backend": jax.default_backend(), "cases": []}

    def record(name, solver_args, solver_kwargs, check):
        s = cc.Solver(*solver_args, **solver_kwargs)
        ncl = (
            sum(sp_.sntree.n_cliques
                for sp_ in s.chordal_info.spatterns)
            if s.chordal_info is not None else 0
        )
        t0 = time.perf_counter()
        sol = s.solve()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        sol = s.solve()
        warm = time.perf_counter() - t0
        rec = {
            "name": name,
            "status": sol.status.name,
            "iterations": sol.iterations,
            "cold_s": round(cold, 2),
            "warm_s": round(warm, 4),
            "obj": sol.obj_val,
            "r_prim": sol.r_prim,
            "r_dual": sol.r_dual,
            "chordal_cliques": ncl,
        }
        rec.update(check(sol))
        out["cases"].append(rec)
        print(json.dumps(rec), flush=True)

    # ---- plain PSD: project an indefinite matrix onto the PSD cone
    # min ||x - b||^2/2 s.t. mat(x) >= 0; optimum = PSD part of mat(b)
    nv = 24
    rng = np.random.default_rng(0)
    M = rng.standard_normal((nv, nv))
    M = (M + M.T) / 2.0
    sd = nv * (nv + 1) // 2
    # svec(M)
    sv = np.zeros(sd)
    a = 0
    for j in range(nv):
        for i in range(j + 1):
            sv[a] = M[i, j] * (1.0 if i == j else np.sqrt(2.0))
            a += 1
    P = np.eye(sd)
    q = -sv
    A = -np.eye(sd)
    b = np.zeros(sd)
    cones = [cc.PSDTriangleConeT(nv)]
    # exact reference: eigendecomposition projection
    w, V = np.linalg.eigh(M)
    Mplus = (V * np.maximum(w, 0.0)) @ V.T
    ref_obj = 0.5 * np.sum(Mplus * Mplus) - np.sum(Mplus * M)

    def check_psd(sol):
        return {"obj_err_vs_eigh": abs(sol.obj_val - ref_obj)}

    record(f"psd-projection-nv{nv}", (P, q, A, b, cones), {}, check_psd)

    # ---- chordal: banded SDP (clique chain).  nv=52, bw=2 -> ~50
    # cliques after merge; compact decomposition + dual completion.
    # NB the cone rows must touch ONLY the band's svec entries — a row
    # per svec entry (e.g. -I) makes the aggregate sparsity dense and
    # chordal_info comes back None (the round-4 first version of this
    # script had that flaw: its "chordal" case solved the full cone).
    # Variables are the band entries; equalities pin the off-diagonal
    # band to data; the diagonal stays free with a trace objective.
    nv = 52
    bw = 2
    rng = np.random.default_rng(1)
    sd = nv * (nv + 1) // 2
    band_idx, diag_flag = [], []
    a = 0
    for j in range(nv):
        for i in range(j + 1):
            if j - i <= bw:
                band_idx.append(a)
                diag_flag.append(i == j)
            a += 1
    ny = len(band_idx)
    qy = np.zeros(ny)
    rows, bs_ = [], []
    for t in range(ny):
        if diag_flag[t]:
            qy[t] = 0.5 + rng.random()      # tr(C X) on the diagonal
        else:
            r = np.zeros(ny)
            r[t] = 1.0
            rows.append(r)
            bs_.append(0.3 * np.sqrt(2.0) * (0.5 + 0.1 * (t % 5)))
    meq = len(rows)
    Apsd = np.zeros((sd, ny))
    for t, bi in enumerate(band_idx):
        Apsd[bi, t] = -1.0
    A = np.vstack([np.vstack(rows), Apsd])
    b = np.concatenate([np.asarray(bs_), np.zeros(sd)])
    cones = [cc.ZeroConeT(meq), cc.PSDTriangleConeT(nv)]

    def check_chordal(sol):
        # dual completion: returned z must be PSD on the FULL cone
        zmat = np.zeros((nv, nv))
        a = 0
        for j in range(nv):
            for i in range(j + 1):
                v = sol.z[meq + a]
                if i != j:
                    v /= np.sqrt(2.0)
                zmat[i, j] = zmat[j, i] = v
                a += 1
        lam_min = float(np.linalg.eigvalsh(zmat)[0])
        return {"dual_completion_lam_min": lam_min}

    record(
        f"sdp-chordal-banded-nv{nv}",
        (None, qy, A, b, cones),
        dict(chordal_decomposition_enable=True,
             chordal_decomposition_merge_method="clique_graph",
             chordal_decomposition_compact=True,
             chordal_decomposition_complete_dual=True),
        check_chordal,
    )

    # ---- same decomposed SDP through the SPARSE path: chordal
    # decomposition composes with SparseSolver so the clique-sized PSD
    # blocks ride the device multifrontal end-to-end
    import scipy.sparse as sp

    from cuclarabel_tpu.sparse_solver import SparseSolver

    s = SparseSolver(
        None, qy, sp.csc_matrix(A), b, cones,
        chordal_decomposition_enable=True,
        chordal_decomposition_merge_method="clique_graph",
        chordal_decomposition_compact=True,
        chordal_decomposition_complete_dual=True,
    )
    t0 = time.perf_counter()
    sol = s.solve()
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    sol = s.solve()
    warm = time.perf_counter() - t0
    rec = {
        "name": f"sdp-chordal-banded-nv{nv}-sparse-multifrontal",
        "status": sol.status.name,
        "iterations": sol.iterations,
        "cold_s": round(cold, 2),
        "warm_s": round(warm, 4),
        "obj": sol.obj_val,
        "r_prim": sol.r_prim,
        "r_dual": sol.r_dual,
    }
    rec.update(check_chordal(sol))
    out["cases"].append(rec)
    print(json.dumps(rec), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "benchmarks", "ab_results", "sdp_tpu.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    run()
