"""Piecewise profiling of the batched IPM at large B.

Answers VERDICT round-1 weak #1: which per-iteration cost scales with B
and is not the factorization.  Times each phase of the batched solve as
its own jitted program at matching shapes, plus the full end-to-end
solve with per-problem iteration statistics (the vmapped `while_loop`
runs the whole batch until the LAST problem finishes, so the straggler
tail multiplies everything).

Usage:  python scripts/profile_batch.py [B ...]
Prints one JSON line per (B, method) config.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=8):
    """Per-execution time with the completion round-trip amortized:
    the remote runtime's execute/fence round-trip costs ~30 ms per
    BLOCKED dispatch of a non-trivial program (2026-08 tunnel), so a
    fence per rep would swamp ms-scale phases.  Enqueue all reps
    (async dispatch pipelines the round-trips; the device still
    executes them back-to-back) and fence once."""
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

    from __graft_entry__ import _portfolio_socp
    from cuclarabel_tpu.cones import ops as cone_ops
    from cuclarabel_tpu.cones.api import cones_collapsed
    from cuclarabel_tpu.cones.layout import build_layout
    from cuclarabel_tpu.infinity import get_infinity
    from cuclarabel_tpu.ipm.loop import make_solve_fn
    from cuclarabel_tpu.kkt.dense import make_dense_kkt
    from cuclarabel_tpu.parallel.batch import device_equilibrate
    from cuclarabel_tpu.settings import Settings

    NASS = 32
    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [256, 4096]

    for B in batches:
        A, qs, bs, cones = _portfolio_socp(nass=NASS, batch=B, seed=7)
        n, m = qs.shape[1], bs.shape[1]
        N = n + m
        layout = build_layout(tuple(cones_collapsed(cones)))

        Pz = jnp.zeros((n, n))
        Ad = jnp.asarray(A)
        qd = jnp.asarray(qs)
        bd = jnp.asarray(bs)

        methods = [a for a in sys.argv[1:] if a in ("inverse", "pallas")]
        for method in methods or ["inverse", "pallas"]:
            settings = Settings(
                kkt_factor_precision="float32", kkt_solve_method=method
            )
            factor_dtype = jnp.float32

            # ---------- full end-to-end solve
            base = make_solve_fn(layout, settings, n, m, False, factor_dtype,
                                 raw=True)

            def solve_one(P, A_, q, b):
                b = jnp.minimum(b, get_infinity())
                return base(device_equilibrate(P, A_, q, b, layout, settings, has_P=False))

            batched = jax.jit(jax.vmap(solve_one, in_axes=(None, None, 0, 0)))
            t_solve, out = timeit(batched, Pz, Ad, qd, bd)
            iters = np.asarray(out["status"] * 0 + out["iterations"])
            statuses = np.asarray(out["status"])
            n_solved = int((statuses == 1).sum())

            # ---------- isolated pieces at matching shapes
            factorize, kkt_solve = make_dense_kkt(n, m, settings, factor_dtype,
                                                  layout)
            key = jax.random.PRNGKey(0)
            # representative Hs: spread diagonal like mid/late IPM
            Hs_diag = 10.0 ** jax.random.uniform(
                key, (B, m), minval=-4.0, maxval=4.0
            )
            Hs = jax.vmap(jnp.diag)(Hs_diag)
            Pb = jnp.zeros((B, n, n))
            Ab = jnp.broadcast_to(Ad, (B, m, n))
            rx = jax.random.normal(key, (B, n), dtype=jnp.float64)
            rz = jax.random.normal(key, (B, m), dtype=jnp.float64)

            with jax.default_matmul_precision("highest"):
                f_fac = jax.jit(jax.vmap(factorize))
                t_fac, (fac, okf) = timeit(f_fac, Pb, Ab, Hs)

                f_solve = jax.jit(jax.vmap(kkt_solve))
                t_kktsolve, sol = timeit(f_solve, fac, rx, rz)

                # f64 refinement matvec
                if "K" in fac:
                    K64 = fac["K"]
                else:  # pallas dd path stores two-float parts
                    K64 = fac["Kh"].astype(jnp.float64) + fac["Kl"].astype(
                        jnp.float64
                    )
                xx = jnp.concatenate([rx, rz], axis=1)
                f_mv64 = jax.jit(lambda K, x: jnp.einsum("bij,bj->bi", K, x))
                t_mv64, _ = timeit(f_mv64, K64, xx)
                f_mv32 = jax.jit(
                    lambda K, x: jnp.einsum(
                        "bij,bj->bi",
                        K.astype(jnp.float32),
                        x.astype(jnp.float32),
                    )
                )
                t_mv32, _ = timeit(f_mv32, K64, xx)

                # cone scaling + Hs assembly
                sS = jnp.abs(jax.random.normal(key, (B, m))) + 0.5
                zS = jnp.abs(jax.random.normal(key, (B, m))) + 0.5
                muB = jnp.ones((B,))

                def scal_fn(s_, z_, mu_):
                    scal, ok = cone_ops.update_scaling(layout, s_, z_, mu_, 0)
                    return cone_ops.assemble_Hs_dense(layout, scal)

                f_scal = jax.jit(jax.vmap(scal_fn))
                t_scal, _ = timeit(f_scal, sS, zS, muB)

                # cone step-length search (2 calls per iteration).
                # NB: must be jitted — an eager vmap through the axon
                # tunnel dispatches per-op at ~26 ms each.
                scal_state, _ = jax.jit(jax.vmap(
                    lambda s_, z_, mu_: cone_ops.update_scaling(
                        layout, s_, z_, mu_, 0
                    )
                ))(sS, zS, muB)
                dzS = jax.random.normal(key, (B, m), dtype=jnp.float64)
                dsS = jax.random.normal(key, (B, m), dtype=jnp.float64)

                def sl_fn(st_, dz_, ds_, z_, s_):
                    return cone_ops.step_length(
                        layout, st_, dz_, ds_, z_, s_,
                        jnp.asarray(1.0), settings
                    )

                f_sl = jax.jit(jax.vmap(sl_fn))
                t_sl, _ = timeit(f_sl, scal_state, dzS, dsS, zS, sS)

                # combined ds shift (higher-order correction)
                def shift_fn(st_, dz_, ds_, z_):
                    return cone_ops.combined_ds_shift(
                        layout, st_, dz_, ds_, jnp.asarray(0.1), z_
                    )

                f_shift = jax.jit(jax.vmap(shift_fn))
                t_shift, _ = timeit(f_shift, scal_state, dzS, dsS, zS)

                # residual A-products (f64): the loop's rx/rz matvecs
                def resid_fn(A_, x_, z_):
                    return A_.T @ z_, A_ @ x_

                f_res = jax.jit(jax.vmap(resid_fn, in_axes=(None, 0, 0)))
                t_res, _ = timeit(f_res, Ad, rx, rz)

            rec = {
                "B": B,
                "method": method,
                "N": N,
                "t_solve_s": round(t_solve, 4),
                "problems_per_s": round(B / t_solve, 1),
                "iter_mean": round(float(iters.mean()), 1),
                "iter_max": int(iters.max()),
                "n_solved": n_solved,
                "ms_factorize": round(t_fac * 1e3, 3),
                "ms_kkt_solve_refined": round(t_kktsolve * 1e3, 3),
                "ms_matvec_f64": round(t_mv64 * 1e3, 3),
                "ms_matvec_f32": round(t_mv32 * 1e3, 3),
                "ms_scaling_Hs": round(t_scal * 1e3, 3),
                "ms_step_length": round(t_sl * 1e3, 3),
                "ms_ds_shift": round(t_shift * 1e3, 3),
                "ms_residual_Amv": round(t_res * 1e3, 3),
                "ms_per_iter_total": round(
                    t_solve / max(float(iters.mean()), 1.0) * 1e3, 3
                ),
            }
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
