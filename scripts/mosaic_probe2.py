"""Map the VPU issue rate vs operand size: a dependent elementwise
chain on a (R, 128) f32 value, R from 8 (one vreg) to 2048.  If small
values run at the ALU rate and large ones fall off, the falloff size
reveals the register/VMEM boundary Mosaic uses for SSA values."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
OPS = 512

def make(R, ops=OPS, streams=1):
    def kern(x_ref, y_ref, o_ref):
        y = y_ref[...]
        parts = [x_ref[...] * (1.0 + 0.5 ** (k + 1)) for k in range(streams)]
        rounds = (ops - streams - (streams - 1)) // (2 * streams)
        for _ in range(rounds):
            parts = [p * y + y for p in parts]
        r = parts[0]
        for p in parts[1:]:
            r = r + p
        o_ref[...] = r
    real_ops = streams + (streams - 1) + 2 * streams * ((ops - streams - (streams - 1)) // (2 * streams))
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((R, 128), lambda: (0, 0))] * 2,
        out_specs=pl.BlockSpec((R, 128), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        compiler_params=_CP,
    )
    return f, real_ops

def bench(R, streams=1):
    f, real_ops = make(R, streams=streams)
    CH = 32
    @jax.jit
    def chain(x, y):
        for _ in range(CH):
            x = f(x, y)
        return x
    x = jnp.full((R, 128), 0.5, jnp.float32)
    y = jnp.full((R, 128), 0.25, jnp.float32)
    np.asarray(chain(x, y)[:1, :1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(x, y)[:1, :1])
        ts.append((time.perf_counter() - t0) / CH)
    dt = np.median(ts)
    tot = real_ops * R * 128
    print(f"R={R:5d} s={streams}: {dt*1e6:8.1f} us/launch  "
          f"{tot/dt/1e12:.3f} Top/s", flush=True)

print(f"backend={jax.default_backend()}")
for R in (8, 32, 128, 512, 1024, 2048):
    bench(R, 1)
for R in (8, 32, 512):
    bench(R, 4)
