"""On-chip A/B: monolithic vs chunked wide-batch programs
(VERDICT r4 #3 / settings.batch_chunk_size).

Round-4 curve: device-side throughput peaks at B=4096 (10.2k/s) and a
monolithic B=8192 program REGRESSES to 9.1k/s.  This measures the
chunked path (chunk-wide programs all enqueued before one fence) at
B=8192/16384 against the monolithic program, same protocol as
batch_scaling_r04 (raw fused loop, pipelined, completion fence only).

Usage: python scripts/batch_chunk_ab.py [B ...]
Writes benchmarks/ab_results/batch_chunk_r05.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _portfolio_socp  # noqa: E402
from cuclarabel_tpu.statuscodes import SolverStatus  # noqa: E402

SOLVED = int(SolverStatus.SOLVED)


def main():
    widths = [int(a) for a in sys.argv[1:]] or [8192, 16384]
    from cuclarabel_tpu.cones.api import cones_collapsed
    from cuclarabel_tpu.cones.layout import build_layout
    from cuclarabel_tpu.infinity import get_infinity
    from cuclarabel_tpu.ipm.loop import make_solve_fn
    from cuclarabel_tpu.parallel.batch import device_equilibrate
    from cuclarabel_tpu.settings import Settings

    NASS = 32
    CHUNK = 4096
    rows = []
    for B in widths:
        A, qs, bs, cones = _portfolio_socp(nass=NASS, batch=B, seed=7)
        n, m = qs.shape[1], bs.shape[1]
        layout = build_layout(tuple(cones_collapsed(cones)))
        settings = Settings(kkt_solve_method="pallas")
        base = make_solve_fn(layout, settings, n, m, False, jnp.float32,
                             raw=True)

        def solve_one(P, A_, q, b):
            b = jnp.minimum(b, get_infinity())
            return base(device_equilibrate(P, A_, q, b, layout, settings,
                                           has_P=False))

        batched = jax.jit(jax.vmap(solve_one, in_axes=(None, None, 0, 0)))
        Pz = jnp.zeros((n, n))
        Ad = jnp.asarray(A)
        qd = jnp.asarray(qs)
        bd = jnp.asarray(bs)

        def fence(out):
            np.asarray(out["status"][:1])

        # --- monolithic
        out = batched(Pz, Ad, qd, bd)
        fence(out)
        st = np.asarray(out["status"])
        n_bad_mono = int((st != SOLVED).sum())

        # --- chunked (pure slices; all chunks enqueued, one fence)
        def run_chunked(scale):
            outs = []
            for i in range(0, B, CHUNK):
                outs.append(batched(Pz, Ad, qd[i:i + CHUNK] * scale,
                                    bd[i:i + CHUNK]))
            fence(outs[-1])
            return outs

        outs = run_chunked(1.0)
        n_bad_ch = int(sum(
            (np.asarray(o["status"]) != SOLVED).sum() for o in outs))

        # warm + interleaved diff measurement
        t_mono, t_ch = [], []
        for r in range(3):
            s = 1.0 + 1e-9 * (r + 1)
            t0 = time.perf_counter()
            fence(batched(Pz, Ad, qd * s, bd))
            t_mono.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_chunked(s + 1e-10)
            t_ch.append(time.perf_counter() - t0)
        mono = B / float(np.median(t_mono))
        ch = B / float(np.median(t_ch))
        row = {
            "B": B, "chunk": CHUNK,
            "monolithic_problems_per_s": round(mono, 1),
            "chunked_problems_per_s": round(ch, 1),
            "speedup": round(ch / mono, 3),
            "not_solved_monolithic": n_bad_mono,
            "not_solved_chunked": n_bad_ch,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "artifact": (
            "monolithic vs chunked (batch_chunk_size) wide-batch "
            "programs, portfolio SOCP nass=32, raw fused loop, "
            "completion fence only"
        ),
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "benchmarks", "ab_results",
                        "batch_chunk_r05.json")
    with open(os.path.normpath(path), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote batch_chunk_r05.json", flush=True)


if __name__ == "__main__":
    main()
