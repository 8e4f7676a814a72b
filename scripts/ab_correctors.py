"""Interleaved A/B: Gondzio centrality correctors (K=0/1/2) on the
portfolio-SOCP bench config, end-to-end batched on the current chip.

The corrector trade: each round adds one KKT back-solve per IPM
iteration (factor reused) and cuts the batch's max iteration count
(CPU-measured on this config: mean 8.4 -> 7.2, max 10 -> 9 at K=2).
Whether that wins end-to-end depends on the chip's solve:iteration
cost ratio — measure here, interleaved in one process (see
docs/performance.md for why cross-process TPU numbers are noise).

Usage:  python scripts/ab_correctors.py [batch]
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _portfolio_socp
from cuclarabel_tpu.cones.api import cones_collapsed
from cuclarabel_tpu.cones.layout import build_layout
from cuclarabel_tpu.infinity import get_infinity
from cuclarabel_tpu.ipm import loop as loop_mod
from cuclarabel_tpu.parallel.batch import device_equilibrate
from cuclarabel_tpu.settings import Settings

NASS = 32
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
A, qs, bs, cones = _portfolio_socp(nass=NASS, batch=BATCH, seed=7)
n, m = qs.shape[1], bs.shape[1]
layout = build_layout(tuple(cones_collapsed(cones)))
Pz = jnp.zeros((n, n))
Ad = jnp.asarray(A)
qd = jnp.asarray(qs)
bd = jnp.asarray(bs)


KKT_METHOD = os.environ.get("AB_KKT_METHOD", "pallas")


def build(k_corr):
    settings = Settings(kkt_solve_method=KKT_METHOD,
                        centrality_correctors=k_corr)
    base = loop_mod.make_solve_fn(
        layout, settings, n, m, False, jnp.float32, raw=True
    )

    def solve_one(P, A_, q, b):
        b = jnp.minimum(b, get_infinity())
        return base(device_equilibrate(P, A_, q, b, layout, settings, has_P=False))

    batched = jax.jit(jax.vmap(solve_one, in_axes=(None, None, 0, 0)))
    out = batched(Pz, Ad, qd, bd)  # compile+warm
    jax.block_until_ready(out)
    return batched


variants = [(f"K{k}", build(k)) for k in (0, 1, 2)]
for round_ in range(3):
    for name, f in variants:
        t0 = time.perf_counter()
        for r in range(3):
            out = f(Pz, Ad, qd * (1 + 1e-9 * (r + 1 + round_)), bd)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        iters = np.asarray(out["iterations"]) if isinstance(out, dict) \
            and "iterations" in out else None
        extra = ""
        if iters is not None:
            extra = f" (max_it={iters.max()} mean_it={iters.mean():.2f})"
        print(f"round {round_} {name}: {BATCH/dt:.1f}/s{extra}", flush=True)
