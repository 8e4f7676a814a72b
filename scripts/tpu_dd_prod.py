"""Production-path check of the dd KKT backend on TPU: the real
make_dense_kkt('pallas') factorize+solve (scaling, stability
permutation, dd refinement), vmapped at bench shapes.

Usage: python scripts/tpu_dd_prod.py [B]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from cuclarabel_tpu.cones.api import NonnegativeConeT, ZeroConeT
    from cuclarabel_tpu.cones.layout import build_layout
    from cuclarabel_tpu.kkt.dense import make_dense_kkt
    from cuclarabel_tpu.settings import Settings

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n, m = 33, 43  # mixed zero + NN rows like the portfolio problem
    meq = 2
    N = n + m
    rng = np.random.default_rng(0)

    A = rng.standard_normal((B, m, n))
    Pd = np.zeros((B, n, n))
    Hs_diag = 10.0 ** rng.uniform(-4, 4, (B, m))
    Hs_diag[:, :meq] = 0.0  # zero-cone rows
    Hs = np.einsum("bi,ij->bij", Hs_diag, np.eye(m))
    rx = rng.standard_normal((B, n))
    rz = rng.standard_normal((B, m))

    layout = build_layout((ZeroConeT(meq), NonnegativeConeT(m - meq)))
    settings = Settings(kkt_solve_method="pallas")
    factorize, solve = make_dense_kkt(n, m, settings, jnp.float32, layout)

    with jax.default_matmul_precision("highest"):
        @jax.jit
        def run(Pb, Ab, Hb, rxb, rzb):
            fac, okf = jax.vmap(factorize)(Pb, Ab, Hb)
            x, z, oks, nir = jax.vmap(solve)(fac, rxb, rzb)
            return x, z, okf & oks, nir

        args = tuple(jnp.asarray(a) for a in (Pd, A, Hs, rx, rz))
        x, z, ok, nir = run(*args)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run(*args)
            jax.block_until_ready(out)
        t = (time.perf_counter() - t0) / reps

    x = np.asarray(x)
    z = np.asarray(z)
    # residual vs the UNregularized K (production refinement target)
    K = np.zeros((B, N, N))
    K[:, :n, n:] = np.transpose(A, (0, 2, 1))
    K[:, n:, :n] = A
    K[:, n:, n:] = -Hs
    sol = np.concatenate([x, z], axis=1)
    b = np.concatenate([rx, rz], axis=1)
    res = b - np.einsum("bij,bj->bi", K, sol)
    rel = np.abs(res).max(axis=1) / np.abs(b).max(axis=1)
    print(json.dumps({
        "B": B, "N": N,
        "relres_median": float(np.median(rel)),
        "relres_p99": float(np.quantile(rel, 0.99)),
        "relres_max": float(rel.max()),
        "nir_mean": float(np.asarray(nir).mean()),
        "nir_max": int(np.asarray(nir).max()),
        "ok_all": bool(np.asarray(ok).all()),
        "ms_factor_plus_3solve": round(t * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
