"""Interleaved A/B: batch compaction (quorum exit + straggler resume)
on the portfolio-SOCP bench config, end-to-end on the current chip.

The compaction trade: the fused batched loop runs every problem to the
batch's MAX iteration count (4096-problem batches measured max 12 vs
mean 8.6); a quorum exit stops the wide program once >= f of the batch
is finished, and the stragglers resume from mid-loop state in a
power-of-two-wide stage 2.  Costs: one extra dispatch (~26 ms through
the tunnel), one extra host round-trip, one extra compiled program.
Wins when B * tail-iterations * per-iter cost exceeds that overhead.

Usage:  python scripts/ab_compaction.py [batch] [quorum...]
"""

import os
import sys
import time

import numpy as np
import jax

if os.environ.get("AB_FORCE_CPU"):
    # sitecustomize presets JAX_PLATFORMS=axon; only the config call
    # actually pins CPU (see CLAUDE.md environment facts)
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _portfolio_socp
from cuclarabel_tpu.parallel.batch import BatchSolver

NASS = 32
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
QUORUMS = [float(a) for a in sys.argv[2:]] or [0.75, 0.9]
KKT_METHOD = os.environ.get("AB_KKT_METHOD", "pallas")

A, qs, bs, cones = _portfolio_socp(nass=NASS, batch=BATCH, seed=7)


def build(quorum):
    solver = BatchSolver(
        None, qs, A, bs, cones,
        kkt_solve_method=KKT_METHOD,
        batch_compaction=quorum,
    )
    out = solver.solve()  # compile + warm (incl. stage 2 shape, if any)
    bad = sum(1 for s in out if s.status.name not in ("SOLVED",))
    if bad:
        print(f"  WARNING quorum={quorum}: {bad}/{BATCH} not SOLVED",
              flush=True)
    return solver


variants = [("off", build(0.0))] + [
    (f"q{q}", build(q)) for q in QUORUMS
]
for round_ in range(3):
    for name, solver in variants:
        t0 = time.perf_counter()
        reps = 3
        for r in range(reps):
            solver.update_data(q=qs * (1 + 1e-9 * (r + 1 + round_)))
            out = solver.solve()
        dt = (time.perf_counter() - t0) / reps
        iters = np.array([s.iterations for s in out])
        comp = getattr(solver, "last_compaction", None)
        extra = f" max_it={iters.max()} mean_it={iters.mean():.2f}"
        if comp:
            extra += (f" stage1_it={comp['stage1_iterations']}"
                      f" rem={comp['remainder']}")
        nbad = int(np.sum([s.status.name != "SOLVED" for s in out]))
        if nbad:
            extra += f" NOT_SOLVED={nbad}"
        print(f"round {round_} {name}: {BATCH/dt:.1f}/s{extra}", flush=True)
