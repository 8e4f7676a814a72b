"""Device-side sparse LDL^T: level-scheduled batched multifrontal.

The TPU-native sparse direct solver (SURVEY.md §2.6 "TPU-native
equivalents required"; the reference's counterpart is the QDLDL
backend, directldl_qdldl.jl:10-96).  Design:

  * host symbolic analysis (sparse_symbolic.py) produces supernodes and
    a level schedule; all supernodes of one level are independent;
  * the numeric phase runs one jitted program: per level, the frontal
    matrices are assembled by STATIC scatter-adds (precomputed flat
    index maps over the K values and the child-update buffer), then a
    batched dense partial-LDL^T with signed dynamic regularization
    (QDLDL semantics, directldl_qdldl.jl:18-25) eliminates the panel
    columns, and the Schur updates are written back to the flat update
    buffer;
  * triangular solves walk the levels with static gather/scatter-add.

Supernode widths are capped (panel splitting in the symbolic phase
caller) so the unrolled elimination stays compile-friendly; fronts in a
level are padded to the level's max (identity columns eliminate as
no-ops).  Everything data-dependent is per-value only — the whole
control structure is baked at trace time, which is exactly what XLA
wants.
"""

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .sparse_symbolic import SymbolicPlan, analyze


@dataclasses.dataclass
class _LevelPlan:
    """Blocked-front layout: per level the device holds the PANEL
    Fp (k, fmax, wmax) — all rows of the columns being eliminated —
    and the trailing block F22 (k, rmax, rmax); the F12 mirror of a
    full square front is never materialized (the elimination reads
    only the panel; the Schur update is L21 D L21^T from the panel)."""

    snodes: np.ndarray      # snode ids in this level (k,)
    wmax: int               # padded panel width
    fmax: int               # padded front size (wmax + rmax)
    # assembly: K values -> panel / F22 slots
    kp_src: np.ndarray      # indices into Kv
    kp_dst: np.ndarray      # flat indices into (k, fmax, wmax)
    k2_src: np.ndarray
    k2_dst: np.ndarray      # flat indices into (k, rmax, rmax)
    # assembly: child update buffer -> panel / F22 slots
    up_src: np.ndarray      # indices into ubuf
    up_dst: np.ndarray
    u2_src: np.ndarray
    u2_dst: np.ndarray
    # per-front-column global column id (or -1 padding)
    col_gid: np.ndarray     # (k, wmax)
    dsign: np.ndarray       # (k, wmax) signs for regularization
    # update write-back: F22 slots -> ubuf positions
    w_src: np.ndarray       # flat indices into (k, rmax, rmax)
    w_dst: np.ndarray       # indices into ubuf
    # solve maps: global row index per front slot (k, fmax); padding -> N
    gidx: np.ndarray

    @property
    def rmax(self) -> int:
        return self.fmax - self.wmax


@dataclasses.dataclass
class NumericPlan:
    sym: SymbolicPlan
    levels: List[_LevelPlan]
    ubuf_size: int
    N: int

    def device_arrays(self):
        """Index maps as a flat dict of numpy arrays.  These are passed
        into the jitted numeric phase as RUNTIME INPUTS, not baked
        constants: at N ~ 10^4 the maps total tens of MB and baking
        them into the program text OOMs the compiler (observed
        SIGKILLed remote compile at a 9 MB MLIR module)."""
        bufs = {"perm": self.sym.perm, "iperm": self.sym.iperm}
        for i, lp in enumerate(self.levels):
            bufs[f"l{i}_kpsrc"] = lp.kp_src
            bufs[f"l{i}_kpdst"] = lp.kp_dst
            bufs[f"l{i}_k2src"] = lp.k2_src
            bufs[f"l{i}_k2dst"] = lp.k2_dst
            bufs[f"l{i}_upsrc"] = lp.up_src
            bufs[f"l{i}_updst"] = lp.up_dst
            bufs[f"l{i}_u2src"] = lp.u2_src
            bufs[f"l{i}_u2dst"] = lp.u2_dst
            bufs[f"l{i}_wsrc"] = lp.w_src
            bufs[f"l{i}_wdst"] = lp.w_dst
            bufs[f"l{i}_gidx"] = lp.gidx
            bufs[f"l{i}_cg"] = np.where(lp.col_gid < 0, self.N, lp.col_gid)
            bufs[f"l{i}_dsign"] = lp.dsign
            bufs[f"l{i}_pad"] = (lp.col_gid < 0).astype(np.float64)
        return bufs


def build_numeric_plan(sym: SymbolicPlan, dsigns: np.ndarray) -> NumericPlan:
    """dsigns: (N,) quasidefinite signs in the ORIGINAL ordering."""
    N = sym.N
    ds_perm = np.asarray(dsigns, dtype=np.float64)[sym.perm]

    # global front-local index lookup per snode
    sn_front: List[np.ndarray] = []
    sn_pos = {}  # (snode, global idx) -> local slot
    for s in range(sym.ns):
        c0, c1 = int(sym.sn_starts[s]), int(sym.sn_starts[s + 1])
        idx = np.concatenate([
            np.arange(c0, c1, dtype=np.int64), sym.sn_rows[s]
        ])
        sn_front.append(idx)
        for t, g in enumerate(idx):
            sn_pos[(s, int(g))] = t

    col2sn = np.zeros(N, dtype=np.int64)
    for s in range(sym.ns):
        col2sn[sym.sn_starts[s]: sym.sn_starts[s + 1]] = s

    # update-buffer offsets
    uoff = np.zeros(sym.ns + 1, dtype=np.int64)
    for s in range(sym.ns):
        uoff[s + 1] = uoff[s] + len(sym.sn_rows[s]) ** 2
    ubuf_size = int(uoff[-1])

    # group K entries by owning snode (snode of the row index = min)
    Ap, Ai = sym.Ap, sym.Ai
    ent_by_sn: List[List] = [[] for _ in range(sym.ns)]
    for j in range(N):
        for p in range(Ap[j], Ap[j + 1]):
            i = int(Ai[p])          # i <= j
            s = int(col2sn[i])
            ent_by_sn[s].append((p, i, j))

    level_plans: List[_LevelPlan] = []
    for lev_sns in sym.levels:
        k = len(lev_sns)
        widths = [sym.front_width(int(s)) for s in lev_sns]
        rlens = [len(sym.sn_rows[int(s)]) for s in lev_sns]
        wmax = max(widths)
        rmax = max(rlens) if rlens else 0
        fmax = wmax + rmax

        rmax = fmax - wmax
        kp_src, kp_dst = [], []
        k2_src, k2_dst = [], []
        up_src, up_dst = [], []
        u2_src, u2_dst = [], []
        w_src, w_dst = [], []
        col_gid = np.full((k, wmax), -1, dtype=np.int64)
        dsign = np.ones((k, wmax), dtype=np.float64)
        gidx = np.full((k, fmax), N, dtype=np.int64)

        for fi, s in enumerate(int(x) for x in lev_sns):
            w = sym.front_width(s)
            r = len(sym.sn_rows[s])
            c0 = int(sym.sn_starts[s])
            # local slot of global g within the PADDED front
            def slot(g):
                t = sn_pos[(s, int(g))]
                return t if t < w else wmax + (t - w)

            front_ids = sn_front[s]
            for t, g in enumerate(front_ids):
                gidx[fi, slot(g)] = int(g)
            col_gid[fi, :w] = np.arange(c0, c0 + w)
            dsign[fi, :w] = ds_perm[c0: c0 + w]

            base_p = fi * fmax * wmax
            base_2 = fi * rmax * rmax

            def emit(src, li, lj, psrc, pdst, s2src, s2dst):
                """Route one (row li, col lj) slot: panel if the column
                is eliminated here, F22 if both are trailing rows; the
                F12 mirror (panel row, trailing col) is never read by
                the blocked elimination and is dropped."""
                if lj < wmax:
                    psrc.append(src)
                    pdst.append(base_p + li * wmax + lj)
                elif li >= wmax:
                    s2src.append(src)
                    s2dst.append(base_2 + (li - wmax) * rmax
                                 + (lj - wmax))

            # K entries (both mirrors so the panel's diagonal block is
            # held full-symmetric, as the rank-1 elimination expects)
            for (p, i, j) in ent_by_sn[s]:
                li, lj = slot(i), slot(j)
                emit(p, li, lj, kp_src, kp_dst, k2_src, k2_dst)
                if li != lj:
                    emit(p, lj, li, kp_src, kp_dst, k2_src, k2_dst)
            # children updates (vectorized: these maps are r^2-sized and
            # dominate host planning time/memory at large N)
            for c in np.nonzero(sym.sn_parent == s)[0]:
                rows_c = sym.sn_rows[int(c)]
                rc = len(rows_c)
                slots = np.asarray([slot(g) for g in rows_c],
                                   dtype=np.int64)
                csrc = int(uoff[c]) + np.arange(rc * rc, dtype=np.int64)
                dst_li = np.repeat(slots, rc)
                dst_lj = np.tile(slots, rc)
                in_panel = dst_lj < wmax
                in_f22 = (~in_panel) & (dst_li >= wmax)
                up_src.append(csrc[in_panel])
                up_dst.append(base_p + dst_li[in_panel] * wmax
                              + dst_lj[in_panel])
                u2_src.append(csrc[in_f22])
                u2_dst.append(base_2 + (dst_li[in_f22] - wmax) * rmax
                              + (dst_lj[in_f22] - wmax))
            # update write-back (F22 after the Schur update)
            rr = np.arange(r, dtype=np.int64)
            w_src.append(
                (base_2 + rr[:, None] * rmax + rr[None, :]).ravel()
            )
            w_dst.append(int(uoff[s]) + np.arange(r * r, dtype=np.int64))

        def _cat(parts):
            return (
                np.concatenate(parts) if parts
                else np.zeros(0, dtype=np.int64)
            )

        level_plans.append(_LevelPlan(
            snodes=np.asarray(lev_sns, dtype=np.int64),
            wmax=wmax, fmax=fmax,
            kp_src=np.asarray(kp_src, dtype=np.int64),
            kp_dst=np.asarray(kp_dst, dtype=np.int64),
            k2_src=np.asarray(k2_src, dtype=np.int64),
            k2_dst=np.asarray(k2_dst, dtype=np.int64),
            up_src=_cat(up_src),
            up_dst=_cat(up_dst),
            u2_src=_cat(u2_src),
            u2_dst=_cat(u2_dst),
            col_gid=col_gid, dsign=dsign,
            w_src=_cat(w_src),
            w_dst=_cat(w_dst),
            gidx=gidx,
        ))

    return NumericPlan(sym=sym, levels=level_plans,
                       ubuf_size=ubuf_size, N=N)


# ---------------------------------------------------------------------
# numeric phase (jittable)
# ---------------------------------------------------------------------

def factor(plan: NumericPlan, Kv, bufs, *, reg_enable=True, eps=1e-13,
           delta=2e-7):
    """Kv: (nnz,) values of the permuted upper pattern; bufs: the
    device-resident index maps from plan.device_arrays().  Returns
    (fac, ok): fac holds per-level factored fronts + global Dinv."""
    N = plan.N
    ubuf = jnp.zeros(plan.ubuf_size, dtype=Kv.dtype)
    Dinv = jnp.zeros(N + 1, dtype=Kv.dtype)
    fronts_out = []
    ok = jnp.asarray(True)

    for i, lp in enumerate(plan.levels):
        k, fmax, wmax = lp.col_gid.shape[0], lp.fmax, lp.wmax
        rmax = fmax - wmax
        # assemble the panel (all rows x eliminated columns) and the
        # trailing F22 block; the F12 mirror is never materialized
        Fp = jnp.zeros(k * fmax * wmax, dtype=Kv.dtype)
        Fp = Fp.at[bufs[f"l{i}_kpdst"]].add(Kv[bufs[f"l{i}_kpsrc"]])
        if lp.up_src.size:
            Fp = Fp.at[bufs[f"l{i}_updst"]].add(ubuf[bufs[f"l{i}_upsrc"]])
        Fp = Fp.reshape(k, fmax, wmax)
        # identity-pad the unused column slots
        if (lp.col_gid < 0).any():
            Fp = Fp + (
                bufs[f"l{i}_pad"][:, None, :]
                * jnp.eye(fmax, wmax, dtype=Kv.dtype)
            ).astype(Kv.dtype)

        # masked fori_loop elimination restricted to the panel: each
        # rank-1 update touches (k, fmax, wmax) instead of the full
        # square front; constant IR per level so deep level schedules
        # stay compile-friendly
        dsign = bufs[f"l{i}_dsign"].astype(Kv.dtype)
        gtw = jnp.arange(wmax)

        def elim_body(j, carry):
            Fp, ok = carry
            dj = Fp[:, j, j]
            if reg_enable:
                bad = (dj == 0.0) | (dsign[:, j] * dj < eps)
                dj = jnp.where(bad, dsign[:, j] * delta, dj)
            ok = ok & jnp.all(dj != 0.0)
            dinv = 1.0 / dj
            col = Fp[:, :, j]                      # (k, fmax)
            lcol = col * dinv[:, None]
            gt = (gtw > j).astype(Kv.dtype)
            Fp = Fp - col[:, :, None] * (lcol[:, :wmax] * gt)[:, None, :]
            newcol = lcol.at[:, j].set(dj)  # D kept on the diagonal slot
            Fp = Fp.at[:, :, j].set(newcol)
            return Fp, ok

        Fp, ok = jax.lax.fori_loop(0, wmax, elim_body, (Fp, ok))
        # write D^{-1} for the real columns
        cg = bufs[f"l{i}_cg"]
        dvals = 1.0 / Fp[:, gtw, gtw]
        Dinv = Dinv.at[cg.ravel()].set(dvals.ravel())
        if rmax:
            # Schur complement in ONE batched matmul (MXU work; the
            # old full-front path did this as wmax rank-1 VPU sweeps):
            # F22 -= L21 D L21^T with L21 = panel rows, D = panel diag
            F2 = jnp.zeros(k * rmax * rmax, dtype=Kv.dtype)
            if lp.k2_src.size:
                F2 = F2.at[bufs[f"l{i}_k2dst"]].add(
                    Kv[bufs[f"l{i}_k2src"]]
                )
            if lp.u2_src.size:
                F2 = F2.at[bufs[f"l{i}_u2dst"]].add(
                    ubuf[bufs[f"l{i}_u2src"]]
                )
            F2 = F2.reshape(k, rmax, rmax)
            L21 = Fp[:, wmax:, :]                  # (k, rmax, wmax)
            d = Fp[:, gtw, gtw]                    # (k, wmax)
            F2 = F2 - jnp.einsum(
                "krw,kw,ksw->krs", L21, d, L21,
                precision=jax.lax.Precision.HIGHEST,
            )
            if lp.w_src.size:
                ubuf = ubuf.at[bufs[f"l{i}_wdst"]].set(
                    F2.reshape(-1)[bufs[f"l{i}_wsrc"]]
                )
        # keep only the eliminated panel: the solves read it
        # exclusively, and the trailing block just went into ubuf
        fronts_out.append(Fp)

    ok = ok & jnp.all(jnp.isfinite(Dinv))
    return {"fronts": fronts_out, "Dinv": Dinv}, ok


def solve(plan: NumericPlan, fac, b, bufs):
    """Solve K x = b with the factored fronts; b (N,) in ORIGINAL order."""
    N = plan.N
    x = jnp.concatenate([b[bufs["perm"]], jnp.zeros(1, b.dtype)])

    # forward: (L + I) y = b, leaves -> roots.  Per level: a wmax-step
    # substitution on the (k, wmax) diagonal block, then ONE batched
    # matvec applies all trailing-row updates (the old path swept the
    # full (k, fmax) front every step)
    for i, (lp, F) in enumerate(zip(plan.levels, fac["fronts"])):
        k, fmax, wmax = lp.col_gid.shape[0], lp.fmax, lp.wmax
        g = bufs[f"l{i}_gidx"]
        iota = jnp.arange(wmax)
        x1 = x[g[:, :wmax]]                    # (k, wmax)
        L11 = F[:, :wmax, :]

        def fwd_body(j, x1):
            gt = (iota > j).astype(x1.dtype)
            return x1 - (L11[:, :, j] * gt[None, :]) * x1[:, j][:, None]

        x1 = jax.lax.fori_loop(0, wmax, fwd_body, x1)
        cg = bufs[f"l{i}_cg"]
        x = x.at[cg.ravel()].set(x1.ravel())
        if fmax > wmax:
            delta = -jnp.einsum(
                "krw,kw->kr", F[:, wmax:, :], x1,
                precision=jax.lax.Precision.HIGHEST,
            )
            x = x.at[g[:, wmax:].ravel()].add(delta.ravel())

    # diagonal
    x = x * fac["Dinv"]

    # backward: (L + I)' x = y, roots -> leaves
    nlev = len(plan.levels)
    for ir, (lp, F) in enumerate(
        zip(reversed(plan.levels), reversed(fac["fronts"]))
    ):
        i = nlev - 1 - ir
        k, fmax, wmax = lp.col_gid.shape[0], lp.fmax, lp.wmax
        g = bufs[f"l{i}_gidx"]
        iota = jnp.arange(wmax)
        x1 = x[g[:, :wmax]]
        L11 = F[:, :wmax, :]
        if fmax > wmax:
            x2 = x[g[:, wmax:]]
            x1 = x1 - jnp.einsum(
                "krw,kr->kw", F[:, wmax:, :], x2,
                precision=jax.lax.Precision.HIGHEST,
            )

        def bwd_body(jj, x1):
            j = wmax - 1 - jj
            gt = (iota > j).astype(x1.dtype)
            dot = jnp.sum((L11[:, :, j] * gt[None, :]) * x1, axis=1)
            return x1.at[:, j].add(-dot)

        x1 = jax.lax.fori_loop(0, wmax, bwd_body, x1)
        cg = bufs[f"l{i}_cg"]
        x = x.at[cg.ravel()].set(x1.ravel())

    return x[:N][bufs["iperm"]]


# ---------------------------------------------------------------------
# convenience wrapper mirroring native.LDLFactor for tests
# ---------------------------------------------------------------------

class SparseDeviceLDL:
    """Symbolic-once / refactor-many sparse LDL^T running on device.

    Input: upper-triangular CSC (Ap, Ai) pattern with quasidefinite
    dsigns; `refactor(Ax)` then `solve(b)`."""

    def __init__(self, N, Ap, Ai, dsigns, reg_enable=True, eps=1e-13,
                 delta=2e-7, order=None, max_width: int = 32,
                 relax: int = 8):
        self.N = int(N)
        Ap = np.asarray(Ap, dtype=np.int64)
        Ai = np.asarray(Ai, dtype=np.int64)
        sym = analyze(self.N, Ap, Ai, order=order, relax=relax)
        sym = _split_wide_supernodes(sym, max_width)
        self.sym = sym
        self.plan = build_numeric_plan(sym, np.asarray(dsigns))
        self._kmap = _value_permutation(self.N, Ap, Ai, sym)
        self.reg = (bool(reg_enable), float(eps), float(delta))
        self._fac = None
        self._bufs = {
            k_: jnp.asarray(v) for k_, v in
            self.plan.device_arrays().items()
        }

        rb, ee, dd = self.reg
        self._jfactor = jax.jit(
            lambda Kv, bufs: factor(self.plan, Kv, bufs, reg_enable=rb,
                                    eps=ee, delta=dd)
        )
        self._jsolve = jax.jit(
            lambda fac, b, bufs: solve(self.plan, fac, b, bufs)
        )

    def refactor(self, Ax) -> bool:
        Kv = jnp.asarray(np.asarray(Ax, dtype=np.float64)[self._kmap])
        self._fac, ok = self._jfactor(Kv, self._bufs)
        return bool(ok)

    def solve(self, b):
        return np.asarray(self._jsolve(self._fac, jnp.asarray(b),
                                       self._bufs))


def _split_wide_supernodes(sym: SymbolicPlan, max_width: int):
    """Split supernodes wider than max_width into chained panels so the
    unrolled elimination stays bounded.  A panel's rows = remaining
    panel columns + the original rows; its parent is the next panel."""
    new_starts = [0]
    for s in range(sym.ns):
        c0, c1 = int(sym.sn_starts[s]), int(sym.sn_starts[s + 1])
        c = c0
        while c1 - c > max_width:
            c += max_width
            new_starts.append(c)
        new_starts.append(c1)
    new_starts = np.asarray(sorted(set(new_starts)), dtype=np.int64)
    if new_starts.shape[0] == sym.sn_starts.shape[0]:
        return sym

    ns = new_starts.shape[0] - 1
    old_of = np.zeros(ns, dtype=np.int64)
    for t in range(ns):
        old_of[t] = np.searchsorted(sym.sn_starts, new_starts[t],
                                    side="right") - 1
    sn_rows: List[np.ndarray] = []
    for t in range(ns):
        s = int(old_of[t])
        c1_new = int(new_starts[t + 1])
        c1_old = int(sym.sn_starts[s + 1])
        extra = np.arange(c1_new, c1_old, dtype=np.int64)
        sn_rows.append(np.concatenate([extra, sym.sn_rows[s]]))

    sn_parent = np.full(ns, -1, dtype=np.int64)
    col2sn = np.zeros(sym.N, dtype=np.int64)
    for t in range(ns):
        col2sn[new_starts[t]: new_starts[t + 1]] = t
    for t in range(ns):
        if sn_rows[t].shape[0]:
            sn_parent[t] = col2sn[sn_rows[t][0]]

    children: List[List[int]] = [[] for _ in range(ns)]
    for t in range(ns):
        if sn_parent[t] != -1:
            children[sn_parent[t]].append(t)
    level = np.zeros(ns, dtype=np.int64)
    for t in range(ns):
        if children[t]:
            level[t] = 1 + max(level[c] for c in children[t])
    nlev = int(level.max()) + 1 if ns else 0
    levels = [np.nonzero(level == l)[0].astype(np.int64)
              for l in range(nlev)]

    return SymbolicPlan(
        N=sym.N, perm=sym.perm, iperm=sym.iperm, sn_starts=new_starts,
        sn_rows=sn_rows, sn_level=level, sn_parent=sn_parent,
        levels=levels, Ap=sym.Ap, Ai=sym.Ai,
    )


def _value_permutation(N, Ap, Ai, sym: SymbolicPlan):
    """Map original upper-CSC value slots to the permuted pattern's
    slots: kmap[t] = original nz index landing at permuted slot t."""
    # original entries -> permuted (i, j) coordinates
    coords = {}
    for j in range(N):
        for p in range(Ap[j], Ap[j + 1]):
            i = int(Ai[p])
            ni, nj = int(sym.iperm[i]), int(sym.iperm[j])
            a, b = (ni, nj) if ni <= nj else (nj, ni)
            coords[(a, b)] = p
    kmap = np.zeros(sym.Ai.shape[0], dtype=np.int64)
    Pp, Pi = sym.Ap, sym.Ai
    for j in range(N):
        for p in range(Pp[j], Pp[j + 1]):
            kmap[p] = coords[(int(Pi[p]), j)]
    return kmap
