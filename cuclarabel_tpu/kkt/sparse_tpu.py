"""Sparse KKT backend on device: assembly datamaps + multifrontal LDL^T.

The sparse analog of kkt/dense.py, mirroring the reference's sparse
pipeline: two-pass CSC assembly with structural diagonal
(`directldl_kkt_assembly.jl:15-175`), O(nnz) in-place value updates via
precomputed index maps (`directldl_datamaps.jl:170-213`), QDLDL-style
factorization with static + dynamic signed regularization
(`kktsolver_directldl.jl:247-310`, `directldl_qdldl.jl:18-25`) and
iterative refinement against the unregularized operator
(`kktsolver_directldl.jl:389-449`) — with the numeric factorization
running ON DEVICE as the level-scheduled batched multifrontal of
kkt/sparse_device.py.

v1 restriction: Hs must be diagonal (Zero/Nonnegative cones), i.e. the
LP/QP class.  SOC rank-2 / GenPow rank-3 expansion columns
(`directldl_datamaps.jl:8-167`) are the planned extension.
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sparse_device import (
    SparseDeviceLDL,
    _split_wide_supernodes,
    _value_permutation,
    build_numeric_plan,
    factor as mf_factor,
    solve as mf_solve,
)
from .sparse_symbolic import analyze


def _inf_norm(v):
    return jnp.max(jnp.abs(v))


@dataclasses.dataclass
class SparseProblem:
    """Static sparsity metadata of one problem (host numpy only).

    P: upper-triangle COO of the objective (rows <= cols);
    A: COO of the constraint matrix."""

    n: int
    m: int
    P_rows: np.ndarray
    P_cols: np.ndarray
    A_rows: np.ndarray
    A_cols: np.ndarray

    @classmethod
    def from_scipy(cls, P, A):
        import scipy.sparse as sp

        n = A.shape[1]
        m = A.shape[0]
        if P is not None:
            Pu = sp.triu(sp.csc_matrix(P)).tocoo()
            pr, pc = Pu.row.astype(np.int64), Pu.col.astype(np.int64)
        else:
            pr = pc = np.zeros(0, dtype=np.int64)
        Ac = sp.coo_matrix(A)
        return cls(n=n, m=m, P_rows=pr, P_cols=pc,
                   A_rows=Ac.row.astype(np.int64),
                   A_cols=Ac.col.astype(np.int64))

    def P_vals(self, P):
        import scipy.sparse as sp

        if P is None:
            return np.zeros(0)
        Pu = sp.triu(sp.csc_matrix(P)).tocoo()
        return np.asarray(Pu.data, dtype=np.float64)

    def A_vals(self, A):
        import scipy.sparse as sp

        return np.asarray(sp.coo_matrix(A).data, dtype=np.float64)


def make_sparse_tpu_kkt(n: int, m: int, settings, layout,
                        sp_prob: SparseProblem, max_width: int = 32):
    """(factorize, solve) over sparse values:

    factorize(Pv, Av, hs_diag) -> (fac, ok)
    solve(fac, rx, rz) -> (x, z, ok, nir)
    """
    N = n + m
    eps_const = settings.static_regularization_constant
    eps_prop = settings.static_regularization_proportional
    reg_enable = settings.static_regularization_enable
    dyn_enable = settings.dynamic_regularization_enable
    dyn_eps = settings.dynamic_regularization_eps
    dyn_delta = settings.dynamic_regularization_delta
    ir_enable = settings.iterative_refinement_enable
    ir_reltol = settings.iterative_refinement_reltol
    ir_abstol = settings.iterative_refinement_abstol
    ir_maxiter = settings.iterative_refinement_max_iter
    ir_stopratio = settings.iterative_refinement_stop_ratio

    # ---- K upper pattern + datamaps (host) --------------------------
    # entries: P upper at (i, j); A at (c, n + r); structural diagonal
    coords = {}

    def slot(i, j):
        key = (int(i), int(j))
        if key not in coords:
            coords[key] = len(coords)
        return coords[key]

    p_map = np.asarray(
        [slot(i, j) for i, j in zip(sp_prob.P_rows, sp_prob.P_cols)],
        dtype=np.int64,
    )
    a_map = np.asarray(
        [slot(c, n + r) for r, c in zip(sp_prob.A_rows, sp_prob.A_cols)],
        dtype=np.int64,
    )
    diag_map = np.asarray([slot(i, i) for i in range(N)], dtype=np.int64)
    nnzK = len(coords)

    # CSC-ordered pattern + permutation of the temp slots
    items = sorted(coords.items(), key=lambda kv: (kv[0][1], kv[0][0]))
    reorder = np.zeros(nnzK, dtype=np.int64)
    for new, ((i, j), old) in enumerate(items):
        reorder[old] = new
    p_map = reorder[p_map] if p_map.size else p_map
    a_map = reorder[a_map]
    diag_map = reorder[diag_map]
    rows_u = np.asarray([ij[0] for ij, _ in items], dtype=np.int64)
    cols_u = np.asarray([ij[1] for ij, _ in items], dtype=np.int64)
    Ap = np.zeros(N + 1, dtype=np.int64)
    np.add.at(Ap, cols_u + 1, 1)
    Ap = np.cumsum(Ap)
    Ai = rows_u

    dsigns = np.concatenate([np.ones(n), -np.ones(m)])

    # symbolic plan (AMD + supernodes + levels) with panel cap
    sym = analyze(N, Ap, Ai)
    sym = _split_wide_supernodes(sym, max_width)
    plan = build_numeric_plan(sym, dsigns)
    kmap = _value_permutation(N, Ap, Ai, sym)

    # full-pattern triplets for the refinement matvec (both triangles)
    off = rows_u != cols_u
    full_rows = np.concatenate([rows_u, cols_u[off]])
    full_cols = np.concatenate([cols_u, rows_u[off]])
    full_src = np.concatenate(
        [np.arange(nnzK, dtype=np.int64), np.nonzero(off)[0]]
    )

    j_pmap = jnp.asarray(p_map)
    j_amap = jnp.asarray(a_map)
    j_dmap = jnp.asarray(diag_map)
    j_kmap = jnp.asarray(kmap)
    j_frows = jnp.asarray(full_rows)
    j_fcols = jnp.asarray(full_cols)
    j_fsrc = jnp.asarray(full_src)
    j_dsigns = jnp.asarray(dsigns)

    def _kmv(Kv, x):
        return jax.ops.segment_sum(
            Kv[j_fsrc] * x[j_fcols], j_frows, num_segments=N
        )

    def factorize(Pv, Av, hs_diag):
        Kv = jnp.zeros(nnzK, dtype=jnp.float64)
        if p_map.size:
            Kv = Kv.at[j_pmap].add(Pv)
        Kv = Kv.at[j_amap].add(Av)
        Kv = Kv.at[j_dmap].add(
            jnp.concatenate([jnp.zeros(n), -hs_diag])
        )
        if reg_enable:
            eps = eps_const + eps_prop * _inf_norm(Kv[j_dmap])
            Kv_f = Kv.at[j_dmap].add(j_dsigns * eps)
        else:
            Kv_f = Kv
        fac_mf, ok = mf_factor(
            plan, Kv_f[j_kmap], reg_enable=dyn_enable, eps=dyn_eps,
            delta=dyn_delta,
        )
        return {"mf": fac_mf, "Kv": Kv}, ok

    def _raw(fac, bvec):
        return mf_solve(plan, fac["mf"], bvec)

    def solve(fac, rx, rz) -> Tuple[jnp.ndarray, ...]:
        b = jnp.concatenate([rx, rz])
        x = _raw(fac, b)
        if not ir_enable:
            return x[:n], x[n:], jnp.all(jnp.isfinite(x)), jnp.asarray(0)

        Kv = fac["Kv"]
        normb = _inf_norm(b)
        tol = ir_abstol + ir_reltol * normb
        e0 = b - _kmv(Kv, x)
        norme0 = _inf_norm(e0)
        ok0 = jnp.isfinite(norme0)

        def cond(c):
            _, _, norme, i, stop, ok = c
            return (~stop) & ok & (i < ir_maxiter) & (norme > tol)

        def body(c):
            xc, e, norme, i, _, _ = c
            dx = _raw(fac, e)
            xn = xc + dx
            en = b - _kmv(Kv, xn)
            normen = _inf_norm(en)
            okn = jnp.isfinite(normen)
            ratio = norme / jnp.where(normen > 0, normen, 1e-300)
            accept = ratio > 1.0
            keep = ratio > min(ir_stopratio, 1.2)
            return (
                jnp.where(accept, xn, xc),
                jnp.where(accept, en, e),
                jnp.where(accept, normen, norme),
                i + 1, ~keep, okn,
            )

        x, _, norme, nir, _, okr = jax.lax.while_loop(
            cond, body, (x, e0, norme0, 0, False, ok0)
        )
        return x[:n], x[n:], okr & jnp.isfinite(norme), nir

    return factorize, solve
