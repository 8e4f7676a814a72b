"""Interleaved A/B: paired (constant+affine in one launch) vs
unpaired KKT solves, portfolio-SOCP bench config on the current chip.

Both variants are compiled up front, then timed interleaved in one
process — the ONLY valid comparison on the tunneled TPU (the first
executions of a fresh program read up to ~2x slow, and cross-process
throughput swings similarly; see docs/performance.md).

Usage:  python scripts/ab_pair.py
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
settings = Settings(kkt_solve_method="pallas")
Pz = jnp.zeros((n, n)); Ad = jnp.asarray(A)
qd = jnp.asarray(qs); bd = jnp.asarray(bs)

import cuclarabel_tpu.kkt.dense as dense_mod
orig_make = dense_mod.make_dense_kkt

def build(pair_enabled):
    def patched(*a, **k):
        f, s = orig_make(*a, **k)
        if not pair_enabled and hasattr(s, "pair"):
            del s.pair
        return f, s
    loop_mod.make_dense_kkt = patched
    base = loop_mod.make_solve_fn(layout, settings, n, m, False, jnp.float32, raw=True)
    def solve_one(P, A_, q, b):
        b = jnp.minimum(b, get_infinity())
        return base(device_equilibrate(P, A_, q, b, layout, settings, has_P=False))
    batched = jax.jit(jax.vmap(solve_one, in_axes=(None, None, 0, 0)))
    out = batched(Pz, Ad, qd, bd)  # compile+warm
    jax.block_until_ready(out)
    return batched

fT = build(True)
fF = build(False)
for round_ in range(3):
    for name, f in (("pair", fT), ("nopair", fF)):
        t0 = time.perf_counter()
        for r in range(3):
            out = f(Pz, Ad, qd * (1 + 1e-9*(r+1+round_)), bd)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"round {round_} {name}: {BATCH/dt:.1f}/s", flush=True)
