"""A/B: pre-split panel updates in the blocked substitution
(CUCLARABEL_DD_SOLVE_PS).  Run once per env setting (the kernel-body
choice is not part of the impl cache key, so in-process toggling would
collide); diff-timed refine1 + solve figures.
Usage: CUCLARABEL_DD_SOLVE_PS={0,1} python scripts/ab_solve_ps.py"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cuclarabel_tpu.kkt.pallas_dd import (
    dd_ldl_factor, dd_ldl_solve, dd_ldl_solve_refine, split_f64, join_f64)

N, B, CH = 83, 4096, 8
INTERP = jax.default_backend() not in ("tpu", "axon")
rng = np.random.default_rng(0)
n1 = N // 2; m1 = N - n1
A = rng.standard_normal((B, m1, n1))
K = np.zeros((B, N, N))
G = rng.standard_normal((n1, n1)) / np.sqrt(n1)
K[:, :n1, :n1] = G @ G.T
K[:, :n1, n1:] = np.transpose(A, (0, 2, 1))
K[:, n1:, :n1] = A
Hs = 10.0 ** rng.uniform(-4, 4, (B, m1))
K[:, n1:, n1:] = -Hs[:, :, None] * np.eye(m1)
ds = np.concatenate([np.ones(n1), -np.ones(m1)])
b = rng.standard_normal((B, N))
Kh, Kl = split_f64(jnp.moveaxis(jnp.asarray(K), 0, -1))
reg = jnp.broadcast_to(jnp.asarray(ds * 1e-8, jnp.float32)[:, None], (N, B))
bh, bl = split_f64(jnp.moveaxis(jnp.asarray(b), 0, -1))

def _sync(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0][..., :1]); return o

L = _sync(jax.jit(lambda a,b2,r: dd_ldl_factor(a,b2,r,interpret=INTERP))(Kh, Kl, reg))

def make(fn, k):
    @jax.jit
    def f(*args):
        out = None
        b0 = args[-2]
        for _ in range(k):
            out = fn(*args[:-2], b0, args[-1])
            b0 = b0 + (out[0] if isinstance(out, tuple) else out) * jnp.float32(1e-30)
        return out
    return f

tag = os.environ.get("CUCLARABEL_DD_SOLVE_PS", "1")
for name, fn, args in (
    ("solve ", lambda Lh,Ll,Dh,Dl,bh_,bl_: dd_ldl_solve(Lh,Ll,Dh,Dl,bh_,bl_,interpret=INTERP), (*L, bh, bl)),
    ("refine1", lambda Kh_,Kl_,Lh,Ll,Dh,Dl,bh_,bl_: dd_ldl_solve_refine(Kh_,Kl_,Lh,Ll,Dh,Dl,bh_,bl_,npass=1,interpret=INTERP), (Kh, Kl, *L, bh, bl)),
):
    f1, f3 = make(fn, CH), make(fn, 3*CH)
    _sync(f1(*args)); _sync(f3(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); _sync(f1(*args))
        t1 = time.perf_counter(); _sync(f3(*args))
        t2 = time.perf_counter()
        ts.append(((t2-t1)-(t1-t0))/(2*CH)*1e3)
    print(f"SOLVE_PS={tag} {name}: {np.median(ts):6.2f} ms (reps {[round(t,2) for t in ts]})", flush=True)
# accuracy
out = _sync(make(lambda Kh_,Kl_,Lh,Ll,Dh,Dl,bh_,bl_: dd_ldl_solve_refine(Kh_,Kl_,Lh,Ll,Dh,Dl,bh_,bl_,npass=1,interpret=INTERP), 1)(Kh, Kl, *L, bh, bl))
x = np.moveaxis(np.asarray(join_f64(out[0], out[1])), -1, 0)
Kreg = K + (ds * 1e-8) * np.eye(N)
r = b - np.einsum("bij,bj->bi", Kreg, x)
print(f"SOLVE_PS={tag} relres: {np.abs(r).max()/np.abs(b).max():.2e}", flush=True)
