"""Focused diff-timed ps sweep at larger ranks (incremental-cascade
_fused_sub_prods) — picks the DD_FACTOR_PS default.
Usage: python scripts/kbench_ps2.py [N] [B]"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cuclarabel_tpu.kkt.pallas_dd import dd_ldl_factor, dd_ldl_solve, split_f64, join_f64

N = int(sys.argv[1]) if len(sys.argv) > 1 else 83
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
INTERP = jax.default_backend() not in ("tpu", "axon")
CH = 8

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
dsigns = np.concatenate([np.ones(n1), -np.ones(m1)])
b = rng.standard_normal((B, N))
KT = jnp.moveaxis(jnp.asarray(K), 0, -1)
Kh0, Kl0 = split_f64(KT)
reg = jnp.broadcast_to(jnp.asarray(dsigns * 1e-8, jnp.float32)[:, None], (N, B))
bh0, bl0 = split_f64(jnp.moveaxis(jnp.asarray(b), 0, -1))

def _sync(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0][..., :1]); return o

def make(ps, k, psc=0):
    @jax.jit
    def f(Kh, Kl, reg_):
        out = None
        for _ in range(k):
            out = dd_ldl_factor(Kh, Kl, reg_, interpret=INTERP, ps=ps,
                                psc=psc)
            Kh = Kh + out[0] * jnp.float32(1e-30)
        return out
    return f

print(f"kbench_ps2 N={N} B={B} backend={jax.default_backend()}")
Kreg = K + (dsigns * 1e-8) * np.eye(N)
_sw = os.environ.get("KB_VARIANTS", "ps:0,psc:3,psc:4,psc:5,psc:-3,psc:-4,psc:-5")
VARIANTS = [(kv.split(":")[0], int(kv.split(":")[1])) for kv in _sw.split(",")]
for kind, val in VARIANTS:
    ps, psc = (val, 0) if kind == "ps" else (0, val)
    f1, f3 = make(ps, CH, psc), make(ps, 3 * CH, psc)
    L = _sync(f1(Kh0, Kl0, reg)); _sync(f3(Kh0, Kl0, reg))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); _sync(f1(Kh0, Kl0, reg))
        t1 = time.perf_counter(); _sync(f3(Kh0, Kl0, reg))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (2 * CH) * 1e3)
    xh, xl = dd_ldl_solve(*L, bh0, bl0, interpret=INTERP)
    x = np.moveaxis(np.asarray(join_f64(xh, xl)), -1, 0)
    r = b - np.einsum("bij,bj->bi", Kreg, x)
    print(f"{kind}{val:2d}: {np.median(ts):6.2f} ms  "
          f"(reps {[round(t,2) for t in ts]})"
          f"  relres {np.abs(r).max()/np.abs(b).max():.2e}", flush=True)

# ---- refine kernel: whole-array vs chunked residual matvecs
from cuclarabel_tpu.kkt.pallas_dd import dd_ldl_solve_refine

best = make(0, 1, 8)  # any factor; use psc=8 factor for L
L = _sync(best(Kh0, Kl0, reg))

def make_refine(psc, k):
    @jax.jit
    def f(Kh, Kl, Lh, Ll, Dh, Dl, bh, bl):
        out = None
        for _ in range(k):
            out = dd_ldl_solve_refine(Kh, Kl, Lh, Ll, Dh, Dl, bh, bl,
                                      npass=1, interpret=INTERP, psc=psc)
            bh = bh + out[0] * jnp.float32(1e-30)
        return out
    return f

for psc in (0, 4, 8, 16):
    f1, f3 = make_refine(psc, CH), make_refine(psc, 3 * CH)
    _sync(f1(Kh0, Kl0, *L, bh0, bl0)); _sync(f3(Kh0, Kl0, *L, bh0, bl0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); _sync(f1(Kh0, Kl0, *L, bh0, bl0))
        t1 = time.perf_counter(); _sync(f3(Kh0, Kl0, *L, bh0, bl0))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (2 * CH) * 1e3)
    out = _sync(f1(Kh0, Kl0, *L, bh0, bl0))
    x = np.moveaxis(np.asarray(join_f64(out[0], out[1])), -1, 0)
    r = b - np.einsum("bij,bj->bi", Kreg, x)
    print(f"refine1_psc{psc:2d}: {np.median(ts):6.2f} ms  "
          f"(reps {[round(t,2) for t in ts]})"
          f"  relres {np.abs(r).max()/np.abs(b).max():.2e}", flush=True)
