"""End-to-end batched solve timing: kkt_solve_method inverse vs pallas.

Per-rep input perturbation defeats any result memoization in the remote
execution path.  Usage: python scripts/bench_methods.py [B ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    NASS = 32
    batches = [int(a) for a in sys.argv[1:]] or [256, 4096]

    for B in batches:
        A, qs, bs, cones = _portfolio_socp(nass=NASS, batch=B, seed=7)
        n, m = qs.shape[1], bs.shape[1]
        layout = build_layout(tuple(cones_collapsed(cones)))
        Ad = jnp.asarray(A)
        qd = jnp.asarray(qs)
        bd = jnp.asarray(bs)
        Pz = jnp.zeros((n, n))

        for method in ["inverse", "pallas"]:
            settings = Settings(
                kkt_factor_precision="float32", kkt_solve_method=method
            )
            base = make_solve_fn(layout, settings, n, m, False,
                                 jnp.float32, raw=True)

            def solve_one(P, A_, q, b):
                b = jnp.minimum(b, get_infinity())
                return base(device_equilibrate(P, A_, q, b, layout, settings, has_P=False))

            batched = jax.jit(
                jax.vmap(solve_one, in_axes=(None, None, 0, 0))
            )
            out = batched(Pz, Ad, qd, bd)
            jax.block_until_ready(out)

            reps = 3
            t0 = time.perf_counter()
            for r in range(reps):
                # different data every rep: tiny q perturbation
                out = batched(Pz, Ad, qd * (1.0 + 1e-9 * (r + 1)), bd)
                jax.block_until_ready(out)
            t = (time.perf_counter() - t0) / reps

            iters = np.asarray(out["iterations"])
            statuses = np.asarray(out["status"])
            print(json.dumps({
                "B": B,
                "method": method,
                "t_solve_s": round(t, 4),
                "problems_per_s": round(B / t, 1),
                "iter_mean": round(float(iters.mean()), 2),
                "iter_max": int(iters.max()),
                "n_solved": int((statuses == 1).sum()),
            }), flush=True)


if __name__ == "__main__":
    main()
