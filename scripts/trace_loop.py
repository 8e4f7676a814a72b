"""Op-level jax.profiler trace of the IPM loop body at large B.

The round-3 methodology that found the f64 dot_general purge: capture a
device trace of CHAIN_K chained loop-body executions, then aggregate
device time per HLO op (xprof's hlo_op_stats) to see where the
non-KKT milliseconds go.

Usage: python scripts/trace_loop.py [B] [CHAIN_K]
Writes the raw trace under /tmp/cucl_trace and prints the top ops.
"""

import glob
import gzip
import json
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
CHAIN_K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
NASS = 32
TRACE_DIR = "/tmp/cucl_trace"

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


with jax.default_matmul_precision("highest"):
    devs = jax.jit(jax.vmap(dev_of, in_axes=(None, None, 0, 0)))(Pz, Ad, qd, bd)
    state0 = jax.jit(lambda dv: jax.vmap(lambda d: build(d)[0]())(dv))(devs)
    jax.block_until_ready(state0)

    @jax.jit
    def chain_body(dv, s):
        vbody = jax.vmap(lambda d, st: build(d)[2](st))
        for _ in range(CHAIN_K):
            s = vbody(dv, s)
        return s

    def sync(s):
        np.asarray(s["iter"][:1])
        return s

    sync(chain_body(devs, state0))   # compile + warm
    sync(chain_body(devs, state0))
    t0 = time.perf_counter()
    sync(chain_body(devs, state0))
    per_iter = (time.perf_counter() - t0) / CHAIN_K * 1e3
    print(f"loop body = {per_iter:.2f} ms/iteration (B={B})", flush=True)

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        sync(chain_body(devs, state0))

# ---- parse: aggregate device time per HLO op via xprof
paths = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True),
               key=os.path.getmtime)
if not paths:
    print("no xplane.pb produced; raw trace dir:", TRACE_DIR)
    sys.exit(0)
path = paths[-1]
print("xplane:", path, flush=True)

from xprof.convert import raw_to_tool_data as rttd  # noqa: E402

names = rttd.xspace_to_tool_names([path])
print("tools:", names, flush=True)
for tool in ("hlo_stats", "hlo_op_stats", "op_profile", "framework_op_stats"):
    if tool not in names:
        continue
    try:
        data, mime = rttd.xspace_to_tool_data([path], tool, {})
    except Exception as e:
        print(f"{tool} failed: {e}")
        continue
    out = f"/tmp/cucl_trace_{tool}.out"
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(out, mode) as f:
        f.write(data)
    print(f"wrote {out} ({mime})", flush=True)
