"""Mosaic issue-model probes (diff-timed): what does one elementwise
op on a big VMEM-resident operand cost on this chip, and does manual
row-chunking (explicit small tiles per op chain) change it?

Context: the dd factor kernel executes ~25-37 f32 ops per double-float
MAC on (N-j, N-j, 128) windows and attains ~30% of the 3.85 Top/s VPU
issue model; these probes separate arithmetic issue from per-op
memory/addressing overhead.  All figures use two-chain-length
difference timing ((t(3k)-t(k))/2k) — a single chained measurement
through this tunnel carries the ~25-30 ms host-fetch fence divided by
the chain length.

Usage: python scripts/mosaic_probe.py [N] [B]
"""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 83
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
LANES = 128
OPS = 96
CH = 4
_CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
V5E_PEAK = 3.85e12

def kern_chain(x_ref, y_ref, o_ref):
    r = x_ref[...]
    y = y_ref[...]
    for _ in range(OPS // 2):
        r = r * y + y
    o_ref[...] = r

def kern_chain_win(x_ref, y_ref, o_ref):
    o_ref[...] = x_ref[...]
    r = o_ref[3:, 3:, :]
    y = y_ref[3:, 3:, :]
    for _ in range(OPS // 2):
        r = r * y + y
    o_ref[3:, 3:, :] = r

def kern_ilp(x_ref, y_ref, o_ref):
    y = y_ref[...]
    acc = x_ref[...]
    parts = [acc * (1.0 + 0.5 ** (k + 1)) for k in range(4)]
    for _ in range((OPS - 4 - 3) // 8):
        parts = [p * y + y for p in parts]
    o_ref[...] = (parts[0] + parts[1]) + (parts[2] + parts[3])

def make_chunk(rows):
    def kern(x_ref, y_ref, o_ref):
        n = x_ref.shape[0]
        for s in range(0, n, rows):
            e = min(s + rows, n)
            r = x_ref[s:e]
            y = y_ref[s:e]
            for _ in range(OPS // 2):
                r = r * y + y
            o_ref[s:e] = r
    return kern

def bench(kern, name, ops=OPS):
    mat = pl.BlockSpec((N, N, LANES), lambda i: (0, 0, i))
    f = pl.pallas_call(
        kern, grid=(B // LANES,),
        in_specs=[mat, mat], out_specs=mat,
        out_shape=jax.ShapeDtypeStruct((N, N, B), jnp.float32),
        compiler_params=_CP,
    )
    def make(k):
        @jax.jit
        def chain(x, y):
            for _ in range(k):
                x = f(x, y)
            return x
        return chain
    c1, c3 = make(CH), make(3 * CH)
    x = jnp.full((N, N, B), 0.5, jnp.float32)
    y = jnp.full((N, N, B), 0.25, jnp.float32)
    def sync(o):
        np.asarray(o[:1, :1, :1]); return o
    sync(c1(x, y)); sync(c3(x, y))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); sync(c1(x, y))
        t1 = time.perf_counter(); sync(c3(x, y))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (2 * CH))
    dt = float(np.median(ts))
    tot = ops * N * N * B
    print(f"{name}: {dt*1e3:6.2f} ms/launch  {tot/dt/1e12:.2f} Top/s "
          f"({100*tot/dt/V5E_PEAK:.1f}% of VPU f32 issue model)",
          flush=True)

if __name__ == "__main__":
    print(f"mosaic_probe N={N} B={B} backend={jax.default_backend()} "
          f"diff-timed ch={CH}")
    bench(kern_chain, "A dep chain, full tile     ")
    bench(kern_chain_win, "B dep chain, offset-3 win  ")
    bench(kern_ilp, "C 4-stream ILP, full tile  ")
    for r in (8, 16, 32):
        bench(make_chunk(r), f"D dep chain, {r:2d}-row chunks")
