"""Benchmark: batched portfolio-SOCP solve throughput on one chip.

Headline config from BASELINE.json ("SOCP: portfolio optimization with
SecondOrderCone blocks, batched scenarios").  The reference repository
publishes no benchmark numbers (BASELINE.md), so `vs_baseline` reports
the batching speedup of this framework against its own sequential
single-problem path on the same device — the quantity the TPU-native
design is supposed to win (one fused vmapped device program vs one
dispatch per problem).

Round-2: the KKT backend is the double-float Pallas LDL^T engine
(kkt/pallas_dd.py) — f64-grade factors at VPU speed — and the JSON now
carries algorithmic-FLOP accounting: achieved TFLOP/s and roofline
attainment.  The batched-small-matrix regime (N = 83 per problem) is
VPU/bandwidth work by construction — the 128x128 MXU cannot be tiled by
83-wide factorizations — so attainment is additionally reported against
the HBM-bandwidth roofline, the binding resource for this shape.

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

    # ---- batched path
    batched = jax.jit(jax.vmap(solve_one, in_axes=(None, None, 0, 0)))
    out = batched(Pz, Ad, qd, bd)  # compile + warm
    jax.block_until_ready(out)
    statuses = np.asarray(out["status"])
    iters = np.asarray(out["iterations"])
    nir = np.asarray(out["ir_count"])
    assert np.all(statuses == 1), f"unsolved problems in bench: {statuses}"

    # The remote (tunneled) TPU executes the first runs of a freshly
    # compiled program up to ~2x slow; warm past that, then take the
    # median of several reps (inputs perturbed so no layer memoizes).
    for r in range(2):
        jax.block_until_ready(batched(Pz, Ad, qd * (1.0 - 1e-9 * (r + 1)), bd))
    reps = 5
    rep_s = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = batched(Pz, Ad, qd * (1.0 + 1e-9 * (r + 1)), bd)
        jax.block_until_ready(out)
        rep_s.append(time.perf_counter() - t0)
    batched_s = float(np.median(rep_s))
    throughput = BATCH / batched_s

    # ---- sequential baseline (same chip, one dispatch per problem)
    single = jax.jit(solve_one)
    o = single(Pz, Ad, qd[0], bd[0])
    jax.block_until_ready(o)
    nseq = 8
    t0 = time.perf_counter()
    for i in range(nseq):
        o = single(Pz, Ad, qd[i], bd[i])
        jax.block_until_ready(o)
    seq_throughput = nseq / (time.perf_counter() - t0)

    # ---- algorithmic FLOP accounting (f64-equivalent useful work)
    # per problem per IPM iteration:
    #   factorization        : 2/3 N^3
    #   3 refined KKT solves : each 1 + nir substitutions (2 N^2) and
    #                          nir residual matvecs (2 N^2)
    #   residual/step matvecs: ~8 A-products (2 m n) + cone O(m)
    it_mean = float(iters.mean())
    nir_mean = float(nir.mean())
    per_iter = (
        2.0 / 3.0 * N**3
        + 3.0 * ((1 + 2 * nir_mean) * 2.0 * N**2)
        + 8.0 * 2.0 * m * n
    )
    total_flops = BATCH * it_mean * per_iter
    tflops = total_flops / batched_s / 1e12
    # HBM traffic estimate per iteration: dd factor reads K (hi+lo) and
    # writes L (hi+lo): 4 * N^2 * 4 bytes; solves/residuals re-read the
    # factor and K per application
    bytes_per_iter = (
        4 * N * N * 4                       # factor in+out
        + 3 * (1 + 2 * nir_mean) * 2 * N * N * 4
    )
    hbm_gbps = BATCH * it_mean * bytes_per_iter / batched_s / 1e9
    roofline_pct = max(
        100.0 * tflops / V5E_PEAK_BF16_TFLOPS,
        100.0 * hbm_gbps / V5E_HBM_GBPS,
    )

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
                "tflops": round(tflops, 4),
                "hbm_gbps": round(hbm_gbps, 2),
                "roofline_pct": round(roofline_pct, 3),
                "roofline_note": (
                    "attainment of the binding resource; N=83 batched "
                    "factorizations are VPU/HBM work (MXU cannot tile "
                    "83-wide panels), peaks: 197 bf16 TFLOP/s, 819 GB/s"
                ),
                "ir_mean": round(nir_mean, 2),
                "ipm_iters_per_s": round(BATCH * it_mean / batched_s, 1),
                "rep_throughputs": [round(BATCH / s, 1) for s in rep_s],
            }
        )
    )


if __name__ == "__main__":
    main()
