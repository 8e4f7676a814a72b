"""Decompose the IPM init (state0) cost at large B.

iterbench measured init (identity-scaling factor + LP init solves +
interior shift) at ~69 ms at B=4096 — 2.4 loop iterations' worth, of
which only ~20 ms is the dd kernels.  This times the pieces as separate
jitted programs at matching shapes and captures an hlo_stats trace of
the full state0 program.

Usage: python scripts/initbench.py [B]
"""

import glob
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _portfolio_socp  # noqa: E402
from cuclarabel_tpu.cones.api import cones_collapsed  # noqa: E402
from cuclarabel_tpu.cones.layout import build_layout  # noqa: E402
from cuclarabel_tpu.infinity import get_infinity  # noqa: E402
from cuclarabel_tpu.ipm.loop import make_solve_fn  # noqa: E402
from cuclarabel_tpu.parallel.batch import device_equilibrate  # noqa: E402
from cuclarabel_tpu.settings import Settings  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
NASS = 32
A, qs, bs, cones = _portfolio_socp(nass=NASS, batch=B, seed=7)
n, m = qs.shape[1], bs.shape[1]
layout = build_layout(tuple(cones_collapsed(cones)))
settings = Settings(kkt_solve_method="pallas")
build = make_solve_fn(layout, settings, n, m, False, jnp.float32,
                      parts=True)

Pz = jnp.zeros((n, n))
Ad = jnp.asarray(A)
qd = jnp.asarray(qs)
bd = jnp.asarray(bs)


def dev_of(P, A_, q, b):
    b = jnp.minimum(b, get_infinity())
    return device_equilibrate(P, A_, q, b, layout, settings, has_P=False)


def sync(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
    return o


def t3(fn, *a):
    sync(fn(*a))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


with jax.default_matmul_precision("highest"):
    devs = jax.jit(jax.vmap(dev_of, in_axes=(None, None, 0, 0)))(
        Pz, Ad, qd, bd)
    jax.block_until_ready(devs)

    f0 = jax.jit(lambda dv: jax.vmap(lambda d: build(d)[0]())(dv))
    print(f"state0 total: {t3(f0, devs):.1f} ms", flush=True)

    # capture a trace of state0 for hlo_stats
    TRACE_DIR = "/tmp/cucl_init_trace"
    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        sync(f0(devs))

    paths = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True),
                   key=os.path.getmtime)
    if paths:
        from xprof.convert import raw_to_tool_data as rttd

        data, _ = rttd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
        out = "/tmp/cucl_init_hlo_stats.json"
        with open(out, "w" if isinstance(data, str) else "wb") as f:
            f.write(data)
        print("wrote", out, flush=True)
