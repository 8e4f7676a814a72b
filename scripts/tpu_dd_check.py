"""Compiled-on-TPU check of the dd Pallas engine: accuracy (error-free
transforms must survive Mosaic) + speed at bench shapes.

Usage: python scripts/tpu_dd_check.py [B] [N]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import functools

    from cuclarabel_tpu.kkt import pallas_dd as pdd

    join_f64, split_f64 = pdd.join_f64, pdd.split_f64
    # the building blocks are unjitted by design; jit here
    dd_ldl_factor = jax.jit(functools.partial(pdd.dd_ldl_factor, interpret=False))
    dd_ldl_solve = jax.jit(functools.partial(pdd.dd_ldl_solve, interpret=False))
    dd_residual = jax.jit(functools.partial(pdd.dd_residual, interpret=False))
    from cuclarabel_tpu.kkt.pallas_ldl import ldl_factor_batched, ldl_solve_batched

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 76
    n = N // 2
    m = N - n
    rng = np.random.default_rng(0)

    A = rng.standard_normal((B, m, n))
    Pd = np.einsum("bij,bkj->bik", *(2 * [rng.standard_normal((B, n, n)) / np.sqrt(n)]))
    Hs = 10.0 ** rng.uniform(-4, 4, (B, m))
    K = np.zeros((B, N, N))
    K[:, :n, :n] = Pd
    K[:, :n, n:] = np.transpose(A, (0, 2, 1))
    K[:, n:, :n] = A
    K[:, n:, n:] = -np.einsum("bi,ij->bij", Hs, np.eye(m))
    dsigns = np.concatenate([np.ones(n), -np.ones(m)])
    eps = 1e-8
    b = rng.standard_normal((B, N))

    KT = jnp.moveaxis(jnp.asarray(K), 0, -1)
    Kh, Kl = split_f64(KT)
    regT = jnp.broadcast_to(
        jnp.asarray(dsigns * eps, dtype=jnp.float32)[:, None], (N, B)
    )
    bT = jnp.moveaxis(jnp.asarray(b), 0, -1)
    bh, bl = split_f64(bT)

    # ---- accuracy compiled
    Lh, Ll, Dh, Dl = dd_ldl_factor(Kh, Kl, regT)
    xh, xl = dd_ldl_solve(Lh, Ll, Dh, Dl, bh, bl)
    x = np.moveaxis(np.asarray(join_f64(xh, xl)), -1, 0)
    Kreg = K + (dsigns * eps) * np.eye(N)
    res = b - np.einsum("bij,bj->bi", Kreg, x)
    relres = np.abs(res).max() / np.abs(b).max()
    rh, rl = dd_residual(Kh, Kl, xh, xl, bh, bl)
    r_dd = np.moveaxis(np.asarray(join_f64(rh, rl)), -1, 0)
    r_ref = b - np.einsum("bij,bj->bi", K, x)
    res_err = np.abs(r_dd - r_ref).max()

    # ---- speed
    t_fac, _ = timeit(lambda: dd_ldl_factor(Kh, Kl, regT))
    t_sol, _ = timeit(lambda: dd_ldl_solve(Lh, Ll, Dh, Dl, bh, bl))
    t_res, _ = timeit(lambda: dd_residual(Kh, Kl, xh, xl, bh, bl))

    # f32 pallas baseline
    K32 = jnp.asarray(K + (dsigns * eps) * np.eye(N), dtype=jnp.float32)
    L32, D32 = ldl_factor_batched(K32)
    b32 = jnp.asarray(b, dtype=jnp.float32)
    t_fac32, _ = timeit(lambda: ldl_factor_batched(K32))
    t_sol32, _ = timeit(lambda: ldl_solve_batched(L32, D32, b32))

    # XLA f32 inverse baseline
    with jax.default_matmul_precision("highest"):
        f_inv = jax.jit(lambda M: jnp.linalg.inv(M))
        t_inv, _ = timeit(f_inv, K32)
        # emulated f64 matvec baseline (refinement residual cost today)
        K64 = jnp.asarray(K)
        x64 = jnp.asarray(x)
        f_mv = jax.jit(lambda Kx, xx: jnp.einsum("bij,bj->bi", Kx, xx))
        t_mv64, _ = timeit(f_mv, K64, x64)

    print(json.dumps({
        "B": B, "N": N,
        "dd_relres_direct": float(relres),
        "dd_residual_err": float(res_err),
        "ms_dd_factor": round(t_fac * 1e3, 3),
        "ms_dd_solve": round(t_sol * 1e3, 3),
        "ms_dd_residual": round(t_res * 1e3, 3),
        "ms_f32_factor": round(t_fac32 * 1e3, 3),
        "ms_f32_solve": round(t_sol32 * 1e3, 3),
        "ms_f32_xla_inv": round(t_inv * 1e3, 3),
        "ms_f64_xla_matvec": round(t_mv64 * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
