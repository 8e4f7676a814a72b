"""Time ONE full IPM iteration body in isolation (chained launches) and
decompose it against the isolated kernel costs.

The per-phase profiler (profile_batch.py) times each phase as its own
dispatch; this times the ACTUAL loop body (parts=True of make_solve_fn)
chained CHAIN_K times inside one program — the difference between
(end-to-end / iterations) and this number is init/equilibration/post
overhead, and the difference between this number and the phase sum is
in-body glue (assembly, termination checks, where_trees, transposes).

Usage: python scripts/iterbench.py [B]
"""

import os
import sys
import time

import numpy as np
import jax

if os.environ.get("AB_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
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


def _dispatch_floor_ms():
    tiny = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(tiny(z)[:1])
    t0 = time.perf_counter()
    for _ in range(30):
        np.asarray(tiny(z)[:1])
    return (time.perf_counter() - t0) / 30 * 1e3


# long chains of the unrolled loop body also exceed the remote
# compiler's request-size limit (HTTP 413, 2026-08 tunnel); its
# dispatch floor is ~0.1 ms so chain=1 is accurate there
if os.environ.get("KBENCH_CHAIN"):
    CHAIN_K = int(os.environ["KBENCH_CHAIN"])
else:
    CHAIN_K = 8 if _dispatch_floor_ms() > 2.0 else 1
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


vdev = jax.vmap(dev_of, in_axes=(None, None, 0, 0))

with jax.default_matmul_precision("highest"):
    devs = jax.jit(vdev)(Pz, Ad, qd, bd)
    state0 = jax.jit(
        lambda dv: jax.vmap(lambda d: build(d)[0]())(dv)
    )(devs)
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

    s1 = sync(chain_body(devs, state0))   # compile + warm
    sync(chain_body(devs, state0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(chain_body(devs, state0))
        ts.append((time.perf_counter() - t0) / CHAIN_K * 1e3)
    print(f"iterbench B={B}: loop body = {np.median(ts):.2f} ms/iteration "
          f"(reps {[round(t, 2) for t in ts]})")

    # also time state0 (init: equilibrated factor + init solves)
    f0 = jax.jit(lambda dv: jax.vmap(lambda d: build(d)[0]())(dv))
    jax.block_until_ready(f0(devs))
    t0 = time.perf_counter()
    jax.block_until_ready(f0(devs))
    print(f"init (state0): {1e3 * (time.perf_counter() - t0):.1f} ms")
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(vdev)(Pz, Ad, qd, bd))
    print(f"equilibrate: {1e3 * (time.perf_counter() - t0):.1f} ms")
