"""Interleaved A/B: fused-refine pass count (CUCLARABEL_DD_NPASS) 2 vs 1.

The fused dd solve+refine kernel always runs `npass` solve+residual
rounds with monotone acceptance; measured IR need is ~1.4 passes, so
pass 2 is often computed-then-rejected work.  npass=1 drops one full
substitution chain + dd residual matvec per KKT solve (x3 per IPM
iteration) at the risk of more outer tolerance-loop entries.

Both variants compile up front and time interleaved in one process
(docs/performance.md measurement discipline).

Usage:  python scripts/ab_npass.py [BATCH=4096]
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
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
A, qs, bs, cones = _portfolio_socp(nass=NASS, batch=BATCH, seed=7)
n, m = qs.shape[1], bs.shape[1]
layout = build_layout(tuple(cones_collapsed(cones)))
settings = Settings(kkt_solve_method="pallas")
Pz = jnp.zeros((n, n)); Ad = jnp.asarray(A)
qd = jnp.asarray(qs); bd = jnp.asarray(bs)


def build(npass):
    # pin the env var for the whole build AND the warm-up trace; restore
    # the previous value afterwards even on exception so a later retrace
    # (e.g. shape change) can't silently rebuild with a different npass
    # than the variant's label
    prev = os.environ.get("CUCLARABEL_DD_NPASS")
    os.environ["CUCLARABEL_DD_NPASS"] = str(npass)
    try:
        base = loop_mod.make_solve_fn(layout, settings, n, m, False,
                                      jnp.float32, raw=True)

        def solve_one(P, A_, q, b):
            b = jnp.minimum(b, get_infinity())
            return base(device_equilibrate(P, A_, q, b, layout, settings,
                                           has_P=False))

        batched = jax.jit(jax.vmap(solve_one, in_axes=(None, None, 0, 0)))
        out = batched(Pz, Ad, qd, bd)  # compile+warm
        jax.block_until_ready(out)
    finally:
        if prev is None:
            del os.environ["CUCLARABEL_DD_NPASS"]
        else:
            os.environ["CUCLARABEL_DD_NPASS"] = prev
    st = np.asarray(out["status"])
    it = np.asarray(out["iterations"])
    print(f"npass={npass}: solved {int((st == 1).sum())}/{BATCH} "
          f"iters max {int(it.max())} mean {it.mean():.2f} "
          f"ir_count mean {np.asarray(out['ir_count']).mean():.2f}",
          flush=True)
    return batched


f2 = build(2)
f1 = build(1)
for round_ in range(3):
    for name, f in (("npass2", f2), ("npass1", f1)):
        t0 = time.perf_counter()
        for r in range(3):
            out = f(Pz, Ad, qd * (1 + 1e-9 * (r + 1 + round_)), bd)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"round {round_} {name}: {BATCH/dt:.1f}/s", flush=True)
