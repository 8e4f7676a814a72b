"""Arrow-TP per-iteration performance budget (VERDICT r4 #7).

Computes, from the STATIC plan of a problem (cone layout + shapes),
the exact per-IPM-iteration cost model of the block-arrow
tensor-parallel KKT backend (kkt/arrow.py) on a d-device mesh:

  * flops eliminated per device (the A_el' D^{-1} A_el partition),
  * the replicated saddle cost every device repeats,
  * every collective the compiled program executes, with its payload
    bytes (statically known: S/B/C psums at factor, A'w / V'w psums
    per solve, matvec psums per refinement pass),
  * predicted wall time vs d for a given chip model (defaults below
    are v5e: ICI ~45 GB/s per link/direction on the ring, ~1 us
    collective launch latency, effective matmul throughput for the
    f64 elimination products),

and the predicted crossover mesh size / problem shape where TP starts
paying on real multi-chip hardware.  On the virtual CPU mesh used for
CI, collectives cost ~ms on host threads (vs ~us on ICI), so measured
virtual-mesh "speedups" <= 1 say nothing about ICI — this budget is
the honest substitute until real multi-chip hardware is available
(arrow_tp.json carries the virtual-mesh correctness numbers).

Writes benchmarks/ab_results/arrow_tp_budget.json and prints the
docs/performance.md table.

Usage: python scripts/arrow_tp_budget.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---- v5e model constants (override via env for other chips) ----
ICI_BW = float(os.environ.get("TP_ICI_BW_GBS", "45")) * 1e9  # per link/dir
ICI_LAT = float(os.environ.get("TP_ICI_LAT_US", "1.0")) * 1e-6
# effective throughput of the elimination products (A_el' D^-1 A_el):
# f64 on TPU is an 8-pass emulated matmul; f32 with "highest" matmul
# precision is a 6-pass bf16 product.  Calibrated against the round-3
# measurement class (tens-of-Gflop/s-per-ms-scale emulated products).
MM_TFLOPS = float(os.environ.get("TP_MM_TFLOPS", "5.0")) * 1e12  # f32 MXU eff.
MM_TFLOPS_F64 = MM_TFLOPS / 8.0
# replicated elementwise/saddle work rate (VPU-class)
VPU_TFLOPS = 0.5e12
IR_PASSES = 2          # refinement passes per solve (measured mean ~1.4)
SOLVES_PER_ITER = 3    # constant-RHS + affine + combined


def budget(n, m_el, nw, mex, d, f64=True):
    """Per-IPM-iteration budget on d devices.  Returns (seconds,
    breakdown dict).  All collective counts/bytes are exact for the
    compiled arrow program; compute terms are roofline estimates."""
    mm = MM_TFLOPS_F64 if f64 else MM_TFLOPS
    ns = n + nw + mex             # saddle dimension
    wordb = 8 if f64 else 4

    # --- compute, per device ---
    # factorize: AtD (n*m_loc) + Spart (2 n^2 m_loc) + Bpart
    # (2 n nw m_loc) + Cpart (2 nw^2 m_loc)
    m_loc = m_el / d
    f_elim = m_loc * (n + 2 * n * n + 2 * n * nw + 2 * nw * nw)
    # replicated saddle inverse: pivotfree_inv ~ 2 ns^3 (block-Schur
    # recursion does ~2x a single LU's flops in matmuls)
    f_saddle = 2.0 * ns ** 3
    # per solve: local fwd/bwd products 4 n m_loc + saddle matvec
    # 2 ns^2; per refinement pass additionally the distributed matvec
    # (4 n m_loc + 2 ns^2)
    f_solve = (1 + IR_PASSES) * (4 * n * m_loc + 2 * ns * ns) \
        + IR_PASSES * (4 * n * m_loc + 2 * ns * ns)
    f_dev = f_elim + f_solve * SOLVES_PER_ITER
    t_compute = f_dev / mm + f_saddle / mm

    # --- collectives, exact counts ---
    # factorize: psum(S) n^2, psum(B) n*nw, psum(C) nw^2  -> 3 psums
    # solve fwd: psum(A'w) n, psum(V'w) nw                -> 2 psums
    # each IR pass: matvec psums (top n, ext nw) + fwd of the
    # correction solve (n + nw)                           -> 4 psums
    psums_factor = 3 if nw else 1
    bytes_factor = wordb * (n * n + n * nw + nw * nw)
    psums_per_solve = (2 if nw else 1) * (1 + IR_PASSES) \
        + (2 if nw else 1) * IR_PASSES
    bytes_per_solve = wordb * (n + nw) * ((1 + IR_PASSES) + IR_PASSES)
    n_psum = psums_factor + SOLVES_PER_ITER * psums_per_solve
    bytes_psum = bytes_factor + SOLVES_PER_ITER * bytes_per_solve

    # ring all-reduce moves 2(d-1)/d of the payload over each link
    t_ici = (bytes_psum * 2 * (d - 1) / d) / ICI_BW \
        + n_psum * ICI_LAT * (d - 1 if d > 1 else 0)

    return t_compute + (t_ici if d > 1 else 0.0), {
        "d": d, "t_us": round((t_compute + (t_ici if d > 1 else 0)) * 1e6, 1),
        "t_compute_us": round(t_compute * 1e6, 1),
        "t_ici_us": round(t_ici * 1e6, 1) if d > 1 else 0.0,
        "psums_per_iter": int(n_psum),
        "psum_bytes_per_iter": int(bytes_psum),
        "flops_per_device": int(f_dev),
        "flops_saddle_replicated": int(f_saddle),
    }


def plan_of(n, m, cones):
    """Static plan quantities (m_el, nw, mex) for a cone list."""
    from cuclarabel_tpu.cones.api import cones_collapsed
    from cuclarabel_tpu.cones.layout import build_layout
    from cuclarabel_tpu.cones import ops as cone_ops

    layout = build_layout(tuple(cones_collapsed(list(cones))))
    plan = cone_ops.sparse_hs_plan(layout)
    nx = len(plan["socx_rows"])
    ngx = len(plan["gpx_cone"])
    nw = 2 * nx + 3 * ngx
    blk_rows = plan["blk_rows"]
    mex = len(set(int(r) for r in blk_rows)) if len(blk_rows) else 0
    # eliminable rows: everything not explicit (zero rows stay
    # explicit too — they are part of blk/explicit handling in arrow)
    m_el = m - mex
    return m_el, nw, mex


def main():
    import cuclarabel_tpu as cc

    rows = []
    cases = [
        # (label, n, m, cones)
        ("portfolio nass=512", 513,
         1 + 513 + 129,
         [cc.ZeroConeT(1), cc.NonnegativeConeT(513),
          cc.SecondOrderConeT(129)]),
        ("m>>n LP slab", 512, 32768 + 1,
         [cc.ZeroConeT(1), cc.NonnegativeConeT(32768)]),
        ("m>>n LP slab XL", 1024, 262145,
         [cc.ZeroConeT(1), cc.NonnegativeConeT(262144)]),
        ("SOC-heavy", 512, 16384 + 16 * 33,
         [cc.NonnegativeConeT(16384)]
         + [cc.SecondOrderConeT(33) for _ in range(16)]),
    ]
    for label, n, m, cones in cases:
        m_el, nw, mex = plan_of(n, m, cones)
        per_d = []
        t1 = None
        cross = None
        for d in (1, 2, 4, 8, 16):
            t, b = budget(n, m_el, nw, mex, d)
            b["speedup"] = round((t1 / t), 2) if t1 else 1.0
            if t1 is None:
                t1 = t
            if cross is None and d > 1 and t < t1:
                cross = d
            per_d.append(b)
        rows.append({
            "label": label, "n": n, "m": m, "m_el": m_el, "nw": nw,
            "mex": mex, "per_device": per_d,
            "predicted_crossover_d": cross,
        })
        print(f"{label}: n={n} m={m} (el {m_el}, ext {nw}, expl {mex})")
        for b in per_d:
            print(f"  d={b['d']:2d}: {b['t_us']:9.1f} us/iter "
                  f"(compute {b['t_compute_us']:9.1f}, "
                  f"ici {b['t_ici_us']:7.1f}; "
                  f"{b['psums_per_iter']} psums, "
                  f"{b['psum_bytes_per_iter']/1e3:.1f} KB) "
                  f"speedup {b['speedup']}")
    out = {
        "model": {
            "ici_bw_gbs": ICI_BW / 1e9, "ici_lat_us": ICI_LAT * 1e6,
            "mm_tflops_f32": MM_TFLOPS / 1e12,
            "mm_tflops_f64_emulated": MM_TFLOPS_F64 / 1e12,
            "ir_passes": IR_PASSES, "solves_per_iter": SOLVES_PER_ITER,
            "note": (
                "collective counts/bytes are exact for the compiled "
                "arrow program; compute terms are roofline estimates "
                "to be calibrated on real multi-chip hardware"
            ),
        },
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "benchmarks", "ab_results",
                        "arrow_tp_budget.json")
    with open(os.path.normpath(path), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.normpath(path))


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
