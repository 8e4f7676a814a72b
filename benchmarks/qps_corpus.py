"""QPS-format corpus plumbing: export the transcribed Maros-Meszaros
members as .qps files, load/solve any QPS file, and generate large
MM-style grid QPs with exact references.

The real Maros-Meszaros archive cannot be vendored (no network in this
environment), so the corpus has three tiers:

  1. transcribed real members (benchmarks/maros.py) — exported to QPS
     so the READER is exercised against problems with published optima;
  2. any user-supplied QPS directory (`benchmarks/suite.py --maros
     <dir>`) — the standard MM distribution loads unchanged;
  3. MM-style large equality-constrained grid QPs (AUG2D's problem
     class: expanded-system formulation of a 2-D PDE) generated AS QPS
     text, whose exact optimum follows from one sparse KKT solve — so
     10^2..10^3-variable members route through SparseSolver with a
     1e-6-checkable reference even without the archive files.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cuclarabel_tpu as cc
from cuclarabel_tpu.qps import (
    QPSProblem, load_qps, parse_qps, qps_objective, to_clarabel, write_qps,
)


def maros_to_qps(p) -> QPSProblem:
    """benchmarks/maros.py MarosProblem (conic form) -> QPSProblem.

    Zero-cone rows become E rows; nonnegative rows a'x + s = b become
    L rows (a'x <= b).  Variable bounds stay encoded as rows; QPS
    default bounds are overridden to free."""
    import scipy.sparse as sp

    n = p.q.shape[0]
    meq = 0
    for c in p.cones:
        if isinstance(c, cc.ZeroConeT):
            meq += c.dim
    m = p.b.shape[0]
    rl = np.where(np.arange(m) < meq, p.b, -np.inf)
    ru = p.b.copy()
    return QPSProblem(
        name=p.name,
        c0=p.obj_const,
        c=p.q.copy(),
        Q=sp.csc_matrix(p.P),
        A=sp.csc_matrix(p.A),
        rl=rl,
        ru=ru,
        lb=np.full(n, -np.inf),
        ub=np.full(n, np.inf),
        col_names=[f"X{j+1}" for j in range(n)],
        row_names=[f"R{i+1}" for i in range(m)],
    )


def export_transcribed(outdir: str):
    """Write every transcribed member as a .qps file."""
    from benchmarks.maros import PROBLEMS

    os.makedirs(outdir, exist_ok=True)
    paths = []
    for make in PROBLEMS:
        p = make()
        qp = maros_to_qps(p)
        path = os.path.join(outdir, f"{p.name}.qps")
        write_qps(qp, path)
        paths.append((path, p.obj_golden))
    return paths


def make_grid_qp_qps(k: int, name: str = None) -> str:
    """AUG2D-class member: min (1/2)||x - t||^2 over edge variables of a
    k x k grid, subject to node flow-balance equalities — the
    'expanded system formulation of a 2-D PDE' structure of MM's AUG2D
    family, with a deterministic target t.  Returns QPS text.

    Being equality-constrained and strictly convex, the exact optimum
    is one sparse KKT solve (grid_qp_reference)."""
    nb = _grid_build(k)
    lines = [f"NAME          {name or f'GRIDQ{k}'}", "ROWS", " N  OBJ"]
    for i in range(nb["m"]):
        lines.append(f" E  C{i+1}")
    lines.append("COLUMNS")
    cols = nb["cols"]
    t = nb["t"]
    for j in range(nb["n"]):
        lines.append(f"    E{j+1}  OBJ  {float(-t[j])!r}")
        for (i, v) in cols[j]:
            lines.append(f"    E{j+1}  C{i+1}  {float(v)!r}")
    lines.append("RHS")
    lines.append(f"    RHS  OBJ  {-(0.5 * float(t @ t))!r}")
    for i, v in enumerate(nb["b"]):
        if v != 0.0:
            lines.append(f"    RHS  C{i+1}  {float(v)!r}")
    lines.append("BOUNDS")
    for j in range(nb["n"]):
        lines.append(f" FR BND  E{j+1}")
    lines.append("QUADOBJ")
    for j in range(nb["n"]):
        lines.append(f"    E{j+1}  E{j+1}  1.0")
    lines.append("ENDATA")
    return "\n".join(lines) + "\n"


def _grid_build(k: int):
    """Edge-incidence structure of a k x k grid with deterministic
    target and supplies."""
    idx = lambda r, c: r * k + c
    edges = []
    for r in range(k):
        for c in range(k):
            if c + 1 < k:
                edges.append((idx(r, c), idx(r, c + 1)))
            if r + 1 < k:
                edges.append((idx(r, c), idx(r + 1, c)))
    n = len(edges)
    m = k * k - 1  # drop the last node row (incidence is rank m)
    cols = [[] for _ in range(n)]
    for j, (u, v) in enumerate(edges):
        if u < m:
            cols[j].append((u, 1.0))
        if v < m:
            cols[j].append((v, -1.0))
    # deterministic target + balanced supplies
    t = np.sin(0.7 * np.arange(1, n + 1)) * 2.0
    b = np.cos(1.3 * np.arange(1, m + 1))
    return {"n": n, "m": m, "cols": cols, "t": t, "b": b}


def grid_qp_reference(k: int) -> float:
    """Exact optimum of make_grid_qp_qps(k) via one sparse KKT solve."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    nb = _grid_build(k)
    n, m = nb["n"], nb["m"]
    rows, colsj, vals = [], [], []
    for j, entries in enumerate(nb["cols"]):
        for (i, v) in entries:
            rows.append(i)
            colsj.append(j)
            vals.append(v)
    A = sp.coo_matrix((vals, (rows, colsj)), shape=(m, n)).tocsc()
    t, b = nb["t"], nb["b"]
    KKT = sp.bmat([[sp.eye(n), A.T], [A, None]], format="csc")
    rhs = np.concatenate([t, b])
    sol = spla.spsolve(KKT, rhs)
    x = sol[:n]
    return float(0.5 * x @ x - t @ x + 0.5 * t @ t)


def solve_qps_text(text: str, name: str = "", force_sparse=None,
                   settings=None):
    """Parse QPS text, route to the dense or sparse solver, return a
    result record (name, status, objective in the QPS problem's own
    units, iterations, solve seconds)."""
    import time

    import scipy.sparse as sp

    p = parse_qps(text, name_hint=name)
    P, q, A, b, cones, sgn_c0 = to_clarabel(p)
    n = q.shape[0]
    use_sparse = force_sparse if force_sparse is not None else (n > 64)
    t0 = time.perf_counter()
    if use_sparse:
        from cuclarabel_tpu.sparse_solver import SparseSolver

        sol = SparseSolver(P, q, A, b, cones, settings=settings).solve()
    else:
        sol = cc.Solver(
            np.asarray(P.todense()), q, np.asarray(A.todense()), b, cones,
            settings=settings,
        ).solve()
    dt = time.perf_counter() - t0
    return {
        "name": p.name,
        "n": n,
        "m": int(b.shape[0]),
        "status": sol.status.name,
        "obj": qps_objective(sgn_c0, sol.obj_val),
        "iterations": sol.iterations,
        "r_prim": float(sol.r_prim),
        "r_dual": float(sol.r_dual),
        "solve_s": round(dt, 4),
        "path": "sparse" if use_sparse else "dense",
    }


def run_qps_dir(dirpath: str, settings=None):
    """Solve every .qps/.QPS file in a directory (the MM archive layout)."""
    results = []
    for fn in sorted(os.listdir(dirpath)):
        if not fn.lower().endswith(".qps"):
            continue
        with open(os.path.join(dirpath, fn)) as f:
            text = f.read()
        results.append(solve_qps_text(text, name=fn, settings=settings))
    return results


if __name__ == "__main__":
    import json
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")
    with tempfile.TemporaryDirectory() as d:
        for path, golden in export_transcribed(d):
            with open(path) as f:
                rec = solve_qps_text(f.read(), name=os.path.basename(path),
                                     force_sparse=False)
            rec["obj_golden"] = golden
            rec["obj_err"] = abs(rec["obj"] - golden)
            print(json.dumps(rec))
    for k in (8, 16):
        rec = solve_qps_text(make_grid_qp_qps(k))
        rec["obj_golden"] = grid_qp_reference(k)
        rec["obj_err"] = abs(rec["obj"] - rec["obj_golden"])
        print(json.dumps(rec))
