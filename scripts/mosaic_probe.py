"""Mosaic issue-model probes: what does one elementwise op on a big
VMEM-resident operand actually cost on this chip?

Hypotheses tested (for the dd factor kernel's 30% VPU attainment,
VERDICT r4 #1):
  A. dependent elementwise chain, full-tile operands  -> if ~peak,
     Mosaic keeps chains in vregs (fusion); if ~1/3 peak, every op
     round-trips VMEM (2 loads + 1 store per ALU op).
  B. same chain on a misaligned window (rows/cols offset 3)  -> cost of
     sublane misalignment per op.
  C. independent ops (wide ILP), full tile  -> latency vs issue bound.
  D. row-chunked dependent chain (explicit 8-row tiles)  -> can manual
     chunking keep temporaries in registers?

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
OPS = 96  # ops per element per launch
_CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
V5E_PEAK = 3.85e12

def kern_chain(x_ref, y_ref, o_ref):
    r = x_ref[...]
    y = y_ref[...]
    for _ in range(OPS // 2):
        r = r * y + y      # 2 ops per round, dependent
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
    parts = [acc * (1.0 + 0.5 ** (k + 1)) for k in range(4)]  # 4 indep streams
    for _ in range((OPS - 4 - 3) // 8):
        parts = [p * y + y for p in parts]
    r = ((parts[0] + parts[1]) + (parts[2] + parts[3]))
    o_ref[...] = r

def kern_chunk(x_ref, y_ref, o_ref):
    n = x_ref.shape[0]
    for s in range(0, n, 8):
        e = min(s + 8, n)
        r = x_ref[s:e]
        y = y_ref[s:e]
        for _ in range(OPS // 2):
            r = r * y + y
        o_ref[s:e] = r

def bench(kern, name, ops=OPS):
    mat = pl.BlockSpec((N, N, LANES), lambda i: (0, 0, i))
    f = pl.pallas_call(
        kern, grid=(B // LANES,),
        in_specs=[mat, mat], out_specs=mat,
        out_shape=jax.ShapeDtypeStruct((N, N, B), jnp.float32),
        compiler_params=_CP,
    )
    @jax.jit
    def chain(x, y):
        for _ in range(4):
            x = f(x, y)
        return x
    x = jnp.full((N, N, B), 0.5, jnp.float32)
    y = jnp.full((N, N, B), 0.25, jnp.float32)
    r = chain(x, y); np.asarray(r[:1, :1, :1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(x, y)[:1, :1, :1])
        ts.append((time.perf_counter() - t0) / 4)
    dt = np.median(ts)
    tot = ops * N * N * B
    print(f"{name}: {dt*1e3:.2f} ms/launch  {tot/dt/1e12:.2f} Top/s "
          f"({100*tot/dt/V5E_PEAK:.1f}% of VPU peak)", flush=True)

if __name__ == "__main__":
    print(f"mosaic_probe N={N} B={B} backend={jax.default_backend()}")
    bench(kern_chain, "A dependent chain, full tile ")
    bench(kern_chain_win, "B dependent chain, offset-3 win")
    bench(kern_ilp, "C 4-stream ILP, full tile      ")
    bench(kern_chunk, "D 8-row-chunked dependent chain")
