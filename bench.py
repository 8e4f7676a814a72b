"""Benchmark: batched portfolio-SOCP solve throughput on one chip.

Headline config from BASELINE.json ("SOCP: portfolio optimization with
SecondOrderCone blocks, batched scenarios").  The reference repository
publishes no benchmark numbers (BASELINE.md), so `vs_baseline` reports
the batching speedup of this framework against its own sequential
single-problem path on the same device — the quantity the TPU-native
design is supposed to win (one fused vmapped device program vs one
dispatch per problem).

Measurement discipline (docs/performance.md): the remote TPU runs the
first executions of a freshly compiled program up to ~2x slow and
throughput swings between processes, so BOTH arms of `vs_baseline` are
measured warm, interleaved, in THIS process — each rep times the
batched program and then a block of sequential solves (>=32 sequential
solves total), and the ratio uses medians across reps.

The KKT backend is the double-float Pallas LDL^T engine
(kkt/pallas_dd.py) — f64-grade factors at VPU speed.  Defaults follow
the committed A/B verdicts (benchmarks/ab_results/): multi-RHS pair
solves off, batch compaction auto (on at the B=4096 secondary figure,
off at the B=256 headline).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "problems/s", "vs_baseline": N, ...}
"""

import json
import time

import numpy as np

V5E_PEAK_BF16_TFLOPS = 197.0   # MXU peak, bf16 (jax-ml scaling book)
V5E_HBM_GBPS = 819.0


def _probe_device(timeout_s=300.0):
    """The tunneled TPU backend can wedge for hours (observed: trivial
    jits hang indefinitely).  Fail fast with a diagnostic instead of
    hanging into the caller's timeout; a healthy tunnel answers a first
    trivial jit in well under a minute."""
    import threading

    ok = [False]

    def attempt():
        import jax
        import jax.numpy as jnp

        x = jnp.ones((8, 8))
        (x @ x).block_until_ready()
        ok[0] = True

    t = threading.Thread(target=attempt, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok[0]:
        import sys

        print(
            f"bench: device backend unresponsive after {timeout_s:.0f}s "
            "(tunnel down?); aborting instead of hanging",
            file=sys.stderr,
        )
        raise SystemExit(3)


def main():
    import jax

    _probe_device()
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from __graft_entry__ import _portfolio_socp
    from cuclarabel_tpu.cones.api import cones_collapsed
    from cuclarabel_tpu.cones.layout import build_layout
    from cuclarabel_tpu.infinity import get_infinity
    from cuclarabel_tpu.ipm.loop import make_solve_fn
    from cuclarabel_tpu.parallel.batch import device_equilibrate
    from cuclarabel_tpu.settings import Settings

    NASS = 32  # assets; KKT dim = n + m = 33 + 50 = 83 per problem
    BATCH = 256
    A, qs, bs, cones = _portfolio_socp(nass=NASS, batch=BATCH, seed=7)
    n, m = qs.shape[1], bs.shape[1]
    N = n + m

    layout = build_layout(tuple(cones_collapsed(cones)))
    # double-float Pallas KKT engine: f64-grade accuracy at f32 VPU
    # speed; the assert below checks every problem reaches the full
    # 1e-8 tolerance (SOLVED), so speed is not bought with accuracy.
    settings = Settings(kkt_solve_method="pallas")
    base = make_solve_fn(layout, settings, n, m, False, jnp.float32,
                         raw=True)

    def solve_one(P, A_, q, b):
        b = jnp.minimum(b, get_infinity())
        return base(device_equilibrate(P, A_, q, b, layout, settings))

    Pz = jnp.zeros((n, n))
    Ad = jnp.asarray(A)
    qd = jnp.asarray(qs)
    bd = jnp.asarray(bs)

    # ---- compile + warm both arms
    batched = jax.jit(jax.vmap(solve_one, in_axes=(None, None, 0, 0)))
    out = batched(Pz, Ad, qd, bd)
    jax.block_until_ready(out)
    statuses = np.asarray(out["status"])
    iters = np.asarray(out["iterations"])
    nir_total = np.asarray(out["ir_count"])
    assert np.all(statuses == 1), f"unsolved problems in bench: {statuses}"

    single = jax.jit(solve_one)
    jax.block_until_ready(single(Pz, Ad, qd[0], bd[0]))
    # warm past the fresh-program slowdown on both programs
    for r in range(2):
        jax.block_until_ready(batched(Pz, Ad, qd * (1.0 - 1e-9 * (r + 1)), bd))
        jax.block_until_ready(single(Pz, Ad, qd[r + 1], bd[r + 1]))

    # ---- interleaved warm measurement: batched rep then a sequential
    # block, alternating within one process (inputs perturbed so no
    # layer memoizes); vs_baseline = median/median of the SAME session
    reps = 5
    seq_block = 8  # 5 * 8 = 40 sequential solves (>= 32)
    rep_s, seq_s = [], []
    si = 0
    for r in range(reps):
        t0 = time.perf_counter()
        out = batched(Pz, Ad, qd * (1.0 + 1e-9 * (r + 1)), bd)
        jax.block_until_ready(out)
        rep_s.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        for _ in range(seq_block):
            o = single(Pz, Ad, qd[si % BATCH] * (1.0 + 1e-9 * si), bd[si % BATCH])
            jax.block_until_ready(o)
            si += 1
        seq_s.append((time.perf_counter() - t0) / seq_block)
    batched_s = float(np.median(rep_s))
    throughput = BATCH / batched_s
    seq_throughput = 1.0 / float(np.median(seq_s))

    # ---- algorithmic FLOP accounting (f64-equivalent useful work)
    # per problem per IPM iteration:
    #   factorization            : 2/3 N^3
    #   base KKT solves          : 3 substitutions of 2 N^2
    #   refinement (nir/iter tot): each pass 1 substitution + 1
    #                              residual matvec = 4 N^2
    #   residual/step matvecs    : ~8 A-products (2 m n) + cone O(m)
    it_mean = float(iters.mean())
    nir_per_iter = float(nir_total.mean()) / max(it_mean, 1.0)
    per_iter = (
        2.0 / 3.0 * N**3
        + 3.0 * 2.0 * N**2
        + nir_per_iter * 4.0 * N**2
        + 8.0 * 2.0 * m * n
    )
    total_flops = BATCH * it_mean * per_iter
    tflops = total_flops / batched_s / 1e12
    # HBM traffic estimate per iteration: dd factor reads K (hi+lo) and
    # writes L (hi+lo): 4 * N^2 * 4 bytes; solves/refinement re-read
    # the factor (and K for residuals) per application
    bytes_per_iter = (
        4 * N * N * 4                          # factor in+out
        + (3 + 2 * nir_per_iter) * 2 * N * N * 4
    )
    hbm_gbps = BATCH * it_mean * bytes_per_iter / batched_s / 1e9
    roofline_pct = max(
        100.0 * tflops / V5E_PEAK_BF16_TFLOPS,
        100.0 * hbm_gbps / V5E_HBM_GBPS,
    )

    # ---- secondary figure: B=4096 through BatchSolver with the auto
    # compaction default (resolves to quorum 0.9 at this width; the
    # committed A/B, benchmarks/ab_results/ab_compaction.json)
    from cuclarabel_tpu.parallel.batch import BatchSolver

    B2 = 4096
    A2, qs2, bs2, cones2 = _portfolio_socp(nass=NASS, batch=B2, seed=11)
    solver2 = BatchSolver(None, qs2, A2, bs2, cones2,
                          kkt_solve_method="pallas")
    sols2 = solver2.solve()  # compile + warm (both stages)
    n_bad = sum(1 for s in sols2 if s.status.name != "SOLVED")
    rep2 = []
    for r in range(3):
        solver2.update_data(q=qs2 * (1.0 + 1e-9 * (r + 1)))
        t0 = time.perf_counter()
        sols2 = solver2.solve()
        rep2.append(time.perf_counter() - t0)
    thr2 = B2 / float(np.median(rep2))

    print(
        json.dumps(
            {
                "metric": (
                    f"portfolio SOCP batch={BATCH} nass={NASS} "
                    f"(mean {it_mean:.1f} IPM iters) solve throughput"
                ),
                "value": round(throughput, 3),
                "unit": "problems/s",
                "vs_baseline": round(throughput / seq_throughput, 3),
                "seq_problems_per_s": round(seq_throughput, 2),
                "tflops": round(tflops, 4),
                "hbm_gbps": round(hbm_gbps, 2),
                "roofline_pct": round(roofline_pct, 3),
                "roofline_note": (
                    "attainment of the binding resource; N=83 batched "
                    "factorizations are VPU/HBM work (MXU cannot tile "
                    "83-wide panels), peaks: 197 bf16 TFLOP/s, 819 GB/s"
                ),
                "ir_per_iter": round(nir_per_iter, 3),
                "ipm_iters_per_s": round(BATCH * it_mean / batched_s, 1),
                "rep_throughputs": [round(BATCH / s, 1) for s in rep_s],
                "b4096": {
                    "value": round(thr2, 1),
                    "unit": "problems/s",
                    "compaction": getattr(solver2, "last_compaction", None),
                    "not_solved": n_bad,
                    "rep_throughputs": [round(B2 / s, 1) for s in rep2],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
