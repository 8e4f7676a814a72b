"""Benchmark: batched portfolio-SOCP solve throughput on one chip.

Headline config from BASELINE.json ("SOCP: portfolio optimization with
SecondOrderCone blocks, batched scenarios").  The reference repository
publishes no benchmark numbers (BASELINE.md), so `vs_baseline` reports
the batching speedup of this framework against its own sequential
single-problem path on the same device — the quantity the TPU-native
design is supposed to win (one fused vmapped device program vs one
dispatch per problem).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "problems/s", "vs_baseline": N}
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from __graft_entry__ import _portfolio_socp
    from cuclarabel_tpu.cones.api import cones_collapsed
    from cuclarabel_tpu.cones.layout import build_layout
    from cuclarabel_tpu.infinity import get_infinity
    from cuclarabel_tpu.ipm.loop import make_solve_fn
    from cuclarabel_tpu.parallel.batch import device_equilibrate
    from cuclarabel_tpu.settings import Settings
    from cuclarabel_tpu.solver import _resolve_factor_dtype

    NASS = 32  # assets; KKT dim = n + m = 33 + 50 = 83 per problem
    BATCH = 256
    A, qs, bs, cones = _portfolio_socp(nass=NASS, batch=BATCH, seed=7)
    n, m = qs.shape[1], bs.shape[1]

    layout = build_layout(tuple(cones_collapsed(cones)))
    # f32 factors + f64 refinement: the throughput configuration; the
    # assert below checks every problem still reaches full 1e-8
    # tolerance (SOLVED), so the speed is not bought with accuracy.
    settings = Settings(kkt_factor_precision="float32")
    factor_dtype = jnp.float32
    base = make_solve_fn(layout, settings, n, m, False, factor_dtype, raw=True)

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
    assert np.all(statuses == 1), f"unsolved problems in bench: {statuses}"

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = batched(Pz, Ad, qd, bd)
        jax.block_until_ready(out)
    batched_s = (time.perf_counter() - t0) / reps
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

    print(
        json.dumps(
            {
                "metric": (
                    f"portfolio SOCP batch={BATCH} nass={NASS} "
                    f"(mean {iters.mean():.1f} IPM iters) solve throughput"
                ),
                "value": round(throughput, 3),
                "unit": "problems/s",
                "vs_baseline": round(throughput / seq_throughput, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
