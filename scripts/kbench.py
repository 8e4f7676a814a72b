"""dd-kernel micro-benchmark on the current chip (factor / solve /
fused refine at the bench shape), with compiled accuracy checks.

Each timed figure runs the kernel CHAIN_K times inside one jitted
program with a data dependency between launches, so the ~26 ms
per-dispatch tunnel floor amortizes away and the per-launch time is
real kernel time.  Warm, median of reps.

Usage: python scripts/kbench.py [N] [B]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("AB_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cuclarabel_tpu.kkt.pallas_dd import (  # noqa: E402
    dd_ldl_factor, dd_ldl_solve, dd_ldl_solve_refine, dd_residual,
    split_f64, join_f64,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 83
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
INTERP = jax.default_backend() not in ("tpu", "axon")

# Chained launches only pay when the per-dispatch floor is significant
# next to the ~10-20 ms kernels (the 2026-08 tunnel dispatches in
# ~0.1 ms; the older one took ~26 ms), and long unrolled chains blow
# the remote compiler's request-size limit (HTTP 413).  Probe the floor
# and chain only if it demands it.
def _dispatch_floor_ms():
    tiny = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(tiny(z)[:1])
    t0 = time.perf_counter()
    for _ in range(30):
        np.asarray(tiny(z)[:1])
    return (time.perf_counter() - t0) / 30 * 1e3


if os.environ.get("KBENCH_CHAIN"):
    CHAIN_K = int(os.environ["KBENCH_CHAIN"])
else:
    CHAIN_K = 8 if (not INTERP and _dispatch_floor_ms() > 2.0) else 1

rng = np.random.default_rng(0)
n1 = N // 2
m1 = N - n1
A = rng.standard_normal((B, m1, n1))
K = np.zeros((B, N, N))
for i in range(B):
    G = rng.standard_normal((n1, n1)) / np.sqrt(n1)
    K[i, :n1, :n1] = G @ G.T
K[:, :n1, n1:] = np.transpose(A, (0, 2, 1))
K[:, n1:, :n1] = A
Hs = 10.0 ** rng.uniform(-4, 4, (B, m1))
K[:, n1:, n1:] = -Hs[:, :, None] * np.eye(m1)
dsigns = np.concatenate([np.ones(n1), -np.ones(m1)])
b = rng.standard_normal((B, N))

KT = jnp.moveaxis(jnp.asarray(K), 0, -1)           # (N, N, B)
Kh0, Kl0 = split_f64(KT)
reg = jnp.broadcast_to(
    jnp.asarray(dsigns * 1e-8, jnp.float32)[:, None], (N, B)
)
bh0, bl0 = split_f64(jnp.moveaxis(jnp.asarray(b), 0, -1))


@jax.jit
def chain_factor(Kh, Kl):
    Lh = Ll = Dh = Dl = None
    for _ in range(CHAIN_K):
        Lh, Ll, Dh, Dl = dd_ldl_factor(Kh, Kl, reg, interpret=INTERP)
        # data dependency without changing the value's magnitude class
        Kh = Kh + Lh * jnp.float32(1e-30)
    return Lh, Ll, Dh, Dl


@jax.jit
def chain_solve(Lh, Ll, Dh, Dl, bh, bl):
    xh = xl = None
    for _ in range(CHAIN_K):
        xh, xl = dd_ldl_solve(Lh, Ll, Dh, Dl, bh, bl, interpret=INTERP)
        bh = bh + xh * jnp.float32(1e-30)
    return xh, xl


def make_chain_solve(block):
    @jax.jit
    def f(Lh, Ll, Dh, Dl, bh, bl):
        xh = xl = None
        for _ in range(CHAIN_K):
            xh, xl = dd_ldl_solve(Lh, Ll, Dh, Dl, bh, bl,
                                  interpret=INTERP, block=block)
            bh = bh + xh * jnp.float32(1e-30)
        return xh, xl
    return f


def make_chain_refine(npass, block=None):
    @jax.jit
    def f(Kh, Kl, Lh, Ll, Dh, Dl, bh, bl):
        xh = xl = rh = rl = None
        for _ in range(CHAIN_K):
            xh, xl, rh, rl = dd_ldl_solve_refine(
                Kh, Kl, Lh, Ll, Dh, Dl, bh, bl, npass=npass,
                interpret=INTERP, block=block)
            bh = bh + xh * jnp.float32(1e-30)
        return xh, xl, rh, rl
    return f


@jax.jit
def chain_resid(Kh, Kl, xh, xl, bh, bl):
    rh = rl = None
    for _ in range(CHAIN_K):
        rh, rl = dd_residual(Kh, Kl, xh, xl, bh, bl, interpret=INTERP)
        xh = xh + rh * jnp.float32(1e-30)
    return rh, rl


def _sync(out):
    # block_until_ready can return early through the tunneled remote
    # backend; a host fetch of one element is the only reliable fence
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 1),)])
    return out


def timed(name, fn, *args):
    out = _sync(fn(*args))  # compile + warm
    _sync(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append((time.perf_counter() - t0) / CHAIN_K * 1e3)
    print(f"{name}: {np.median(ts):.2f} ms/launch  (reps {[round(t,2) for t in ts]})",
          flush=True)
    return out


def timed2(name, make_fn, *args):
    """Two-chain-length difference timing: (t(3k) - t(k)) / 2k cancels
    the fixed per-program cost (host fetch ~25-30 ms through this
    tunnel, dispatch) EXACTLY, where dividing one chain's wall time by
    k leaves fetch/k ms of inflation in every per-launch figure."""
    k1, k2 = CHAIN_K, 3 * CHAIN_K
    f1, f2 = make_fn(k1), make_fn(k2)
    out = _sync(f1(*args))
    _sync(f2(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(f1(*args))
        t1 = time.perf_counter()
        _sync(f2(*args))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1e3)
    print(f"{name}: {np.median(ts):.2f} ms/launch  "
          f"(diff-timed, reps {[round(t, 2) for t in ts]})", flush=True)
    return out


print(f"kbench N={N} B={B} backend={jax.default_backend()} chain={CHAIN_K}")
t0 = time.time()
Lh, Ll, Dh, Dl = timed("factor", chain_factor, Kh0, Kl0)
xh, xl = timed("solve ", chain_solve, Lh, Ll, Dh, Dl, bh0, bl0)
timed("resid ", chain_resid, Kh0, Kl0, xh, xl, bh0, bl0)
xr = timed("refine2", make_chain_refine(2), Kh0, Kl0, Lh, Ll, Dh, Dl, bh0, bl0)
xr1 = timed("refine1", make_chain_refine(1), Kh0, Kl0, Lh, Ll, Dh, Dl, bh0, bl0)

# blocked-panel factor sweep: one accumulated rank-p trailing update
# per panel instead of a rank-1 RMW of the trailing matrix per pivot
def make_chain_factor(block, ps=0):
    def make(k):
        @jax.jit
        def f(Kh, Kl, reg_):
            Lh = Ll = Dh = Dl = None
            for _ in range(k):
                Lh, Ll, Dh, Dl = dd_ldl_factor(
                    Kh, Kl, reg_, interpret=INTERP, block=block, ps=ps)
                Kh = Kh + Lh * jnp.float32(1e-30)
            return Lh, Ll, Dh, Dl
        return f
    return make


for blk in (0, 8):
    timed2(f"factor_b{blk}", make_chain_factor(blk), Kh0, Kl0, reg)

# pre-split rank-p factor sweep (_ldl_kernel_ps): hoisted Dekker
# splits + fused rank-p accumulation, ~25.5 issue slots/MAC at p=2 vs
# ~37 for the plain dd chain — with a compiled accuracy check per p
# (EFT layouts must be re-verified per variant on hardware)
for ps in (1, 2, 4, 8, 16):
    Lp = timed2(f"factor_ps{ps}", make_chain_factor(0, ps), Kh0, Kl0, reg)
    xp = _sync(chain_solve(*Lp, bh0, bl0))
    xps = np.moveaxis(np.asarray(join_f64(xp[0], xp[1])), -1, 0)
    Kreg_ = K + (dsigns * 1e-8) * np.eye(N)
    rp = b - np.einsum("bij,bj->bi", Kreg_, xps)
    print(f"  ps{ps} unrefined relres: "
          f"{np.abs(rp).max() / np.abs(b).max():.3e}", flush=True)

# blocked-substitution sweep (panel width): same dd ops reordered —
# short intra-panel steps + one vectorized rank-p update per panel
for blk in (0, 8, 16):
    timed(f"solve_b{blk} ", make_chain_solve(blk), Lh, Ll, Dh, Dl, bh0, bl0)
for blk in (0, 8, 16):
    xrb = timed(f"refine2_b{blk}", make_chain_refine(2, blk),
                Kh0, Kl0, Lh, Ll, Dh, Dl, bh0, bl0)
    if blk:
        xr_b = xrb  # last blocked result for the accuracy check below

# ---- accuracy: compiled relres of the refined solve
for tag, (xh_, xl_, _, _) in (("refine2", xr), ("refine1", xr1)):
    x = np.moveaxis(np.asarray(join_f64(xh_, xl_)), -1, 0)
    Kreg = K + (dsigns * 1e-8) * np.eye(N)
    r = b - np.einsum("bij,bj->bi", Kreg, x)
    # measured against the REGULARIZED operator the factor represents;
    # the refine kernel targets the unregularized K, so allow the
    # 1e-8-regularization gap
    relres = np.abs(r).max() / (np.abs(Kreg).max(1).sum(1) * np.abs(x).max(1) + 1).max()
    print(f"{tag} relres vs K+reg: {np.abs(r).max():.3e} (norm-scaled {relres:.3e})")
print(f"total {time.time()-t0:.1f}s")
