"""Pallas TPU kernels: batched LDL^T KKT engine in double-float (dd)
arithmetic — f64-quality factors at VPU f32 speed.

Why this exists (round-2 profiling, see CLAUDE.md): the batched IPM's
per-iteration cost at large B is dominated by the KKT solve+refinement
chain, not the factorization.  An f32 factor stalls iterative
refinement when cond(K) ~ 1e8 (contraction ~ cond * eps_f32 ~ 1), and
computing refinement residuals with XLA's emulated-f64 einsum costs
~28 ms per matvec at (4096, 76, 76).  Everything here therefore runs in
**two-float ("double-double" over f32, ~2^-48 relative accuracy)**:

  * `dd_ldl_factor`   — pivot-free LDL^T of the regularized
    quasidefinite K, batch-across-lanes layout (N, N, B);
  * `dd_ldl_solve`    — forward/diag/backward substitution;
  * `dd_residual`     — r = b - K x against the dd-stored K, replacing
    the emulated-f64 refinement matvec.

Error-free transformations (Dekker two_prod via 2^12+1 splitting,
Knuth two_sum) are exact under IEEE round-to-nearest f32, which XLA and
Mosaic preserve (no fast-math reassociation); `tests/test_pallas_dd.py`
asserts the achieved accuracy against numpy f64 both in interpret mode
and compiled.

The factorization replicates the numeric semantics of the reference's
QDLDL backend (`src/kktsolvers/direct-ldl/directldl_qdldl.jl:10-96`):
one factorization per IPM iteration of a statically regularized
quasidefinite matrix (no pivoting needed — Vanderbei), all solves
reusing the factor.  Layout note: operands stay in (N, N, B)
lane-major form across the whole IPM iteration so no (B, N, N)
transposes of the factor happen per solve (a 113 MB transpose per call
in the round-1 integration).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# the dd factor kernel holds ~24 MB of (N, N, LANES) hi/lo blocks +
# temporaries per grid step at N~80; raise Mosaic's conservative 16 MB
# scoped-vmem default (v5e has 128 MiB physical VMEM)
_CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
_SPLIT = 4097.0  # 2^12 + 1: Dekker splitting constant for f32


# ---------------------------------------------------------------------
# double-float primitives (exact under IEEE f32 round-to-nearest)
# ---------------------------------------------------------------------

def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """Requires |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _two_prod(a, b):
    p = a * b
    ta = a * _SPLIT
    ah = ta - (ta - a)
    al = a - ah
    tb = b * _SPLIT
    bh = tb - (tb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd_add(ah, al, bh, bl):
    sh, sl = _two_sum(ah, bh)
    sl = sl + (al + bl)
    return _quick_two_sum(sh, sl)


def dd_sub(ah, al, bh, bl):
    return dd_add(ah, al, -bh, -bl)


def dd_mul(ah, al, bh, bl):
    ph, pe = _two_prod(ah, bh)
    pe = pe + (ah * bl + al * bh)
    return _quick_two_sum(ph, pe)


def dd_recip(bh, bl):
    q1 = 1.0 / bh
    # TPU VPU division can be an approximate-reciprocal lowering (~1e-3
    # relative); two plain f32 Newton steps make q1 correctly-rounded-
    # grade before the dd correction squares the remaining error
    q1 = q1 * (2.0 - bh * q1)
    q1 = q1 * (2.0 - bh * q1)
    # r = 1 - q1*b
    ph, pe = dd_mul(q1, jnp.zeros_like(q1), bh, bl)
    rh, rl = dd_add(jnp.ones_like(ph), jnp.zeros_like(ph), -ph, -pe)
    q2 = (rh + rl) * q1
    return _quick_two_sum(q1, q2)


def _dk_split(a):
    """Dekker split of an f32 value into high/low halves (12+12 bits):
    a == h + l exactly, with h and l each representable in 12 bits of
    mantissa so products of halves are exact in f32."""
    t = a * _SPLIT
    h = t - (t - a)
    return h, a - h


def _presplit(wh, wl):
    """(hi, lo) dd pair -> (hi, lo, hi_split_a, hi_split_b) operand
    tuple for _fused_sub_prods.  Hoisting the Dekker split of a rank-1
    factor out of its outer product replaces 8 of the 16 two_prod ops
    per product element with 4 vector ops per factor."""
    h1, h2 = _dk_split(wh)
    return (wh, wl, h1, h2)


def _bcol(t):  # (R, lanes) operand tuple -> (R, 1, lanes)
    return tuple(v[:, None, :] for v in t)


def _brow(t):  # (C, lanes) operand tuple -> (1, C, lanes)
    return tuple(v[None, :, :] for v in t)


def _fused_sub_prods(th, tl, terms):
    """(th, tl) -= sum_t a_t * b_t for pre-split dd operand tuples
    (a, alo, a1, a2) x (b, blo, b1, b2) of mutually-broadcastable
    shapes, in ONE fused accumulation.

    Exactness structure: the hi-word products enter through an exact
    two_sum cascade against the accumulator; every O(2^-24)-relative
    term (the two_prod errors recovered from the pre-split halves, the
    hi*lo cross terms, and the carried lo words) accumulates in plain
    f32, whose own rounding is O(2^-48) relative to the result — the
    same error class as the sloppy dd_mul/dd_sub chain it replaces at
    ~2/3 the VPU issue slots, and one read-modify-write of the
    accumulator per CALL instead of per product."""
    # incremental accumulation: each term's product enters the
    # two_sum cascade immediately, so only O(1) window-sized
    # temporaries are live regardless of len(terms) (a deferred
    # cascade holds every product simultaneously — at rank 16 on an
    # (80, 80, 128) window that is ~50 MB of VMEM temporaries)
    sh = th
    slo = tl
    for (a, al, a1, a2), (b, bl, b1, b2) in terms:
        p = a * b
        err = (((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
               + (a * bl + al * b))
        sh, c = _two_sum(sh, -p)
        slo = slo + (c - err)
    return _quick_two_sum(sh, slo)


def dd_sum_axis0(h, l):
    """Pairwise dd reduction along axis 0 of (k, ...): log2(k) levels of
    vectorized dd_add (tree order also tightens the error bound)."""
    while h.shape[0] > 1:
        k = h.shape[0]
        if k % 2:
            h = jnp.concatenate([h, jnp.zeros_like(h[:1])], axis=0)
            l = jnp.concatenate([l, jnp.zeros_like(l[:1])], axis=0)
            k += 1
        h, l = dd_add(h[: k // 2], l[: k // 2], h[k // 2 :], l[k // 2 :])
    return h[0], l[0]


def dd_sum_axis(h, l, axis):
    """Pairwise dd reduction along an arbitrary axis (removed)."""
    while h.shape[axis] > 1:
        k = h.shape[axis]
        if k % 2:
            pad = [(0, 0)] * h.ndim
            pad[axis] = (0, 1)
            h = jnp.pad(h, pad)
            l = jnp.pad(l, pad)
            k += 1
        h1 = jax.lax.slice_in_dim(h, 0, k // 2, axis=axis)
        h2 = jax.lax.slice_in_dim(h, k // 2, k, axis=axis)
        l1 = jax.lax.slice_in_dim(l, 0, k // 2, axis=axis)
        l2 = jax.lax.slice_in_dim(l, k // 2, k, axis=axis)
        h, l = dd_add(h1, l1, h2, l2)
    return jnp.squeeze(h, axis), jnp.squeeze(l, axis)


# ---------------------------------------------------------------------
# kernels (batch across lanes: operands (N, N, LANES) per grid step)
# ---------------------------------------------------------------------

def _ldl_kernel(n, kh_ref, kl_ref, reg_ref, lh_ref, ll_ref, dh_ref, dl_ref):
    """In-place unrolled dd LDL^T of one (n, n, lanes) batch tile.

    reg_ref (n, lanes) holds the signed static-regularization diagonal
    (dsigns * eps in the scaled space); it is added on load so the
    stored K stays unregularized for residuals."""
    lh_ref[...] = kh_ref[...]
    ll_ref[...] = kl_ref[...]
    # add regularization to the diagonal
    for j in range(n):
        h, l = dd_add(lh_ref[j, j, :], ll_ref[j, j, :], reg_ref[j, :],
                      jnp.zeros_like(reg_ref[j, :]))
        lh_ref[j, j, :] = h
        ll_ref[j, j, :] = l
    for j in range(n):
        djh = lh_ref[j, j, :]
        djl = ll_ref[j, j, :]
        ih, il = dd_recip(djh, djl)
        dh_ref[j, :] = ih
        dl_ref[j, :] = il
        if j + 1 < n:
            # strictly-below-diagonal column only: rows <= j of column j
            # are dead (the solves read L's strict lower triangle and D
            # separately), and the trailing update is confined to the
            # lower-right square — together a ~45% VPU-instruction cut
            # vs full-height column ops (the kernel is issue-bound)
            colh = lh_ref[j + 1 :, j, :]  # (n-j-1, lanes)
            coll = ll_ref[j + 1 :, j, :]
            lch, lcl = dd_mul(colh, coll, ih[None, :], il[None, :])
            lh_ref[j + 1 :, j, :] = lch
            ll_ref[j + 1 :, j, :] = lcl
            # trailing update: a[i, k] -= col[i] * lcol[k], i,k > j
            ph, pe = dd_mul(
                colh[:, None, :], coll[:, None, :],
                lch[None, :, :], lcl[None, :, :],
            )
            uh, ul = dd_sub(
                lh_ref[j + 1 :, j + 1 :, :], ll_ref[j + 1 :, j + 1 :, :],
                ph, pe,
            )
            lh_ref[j + 1 :, j + 1 :, :] = uh
            ll_ref[j + 1 :, j + 1 :, :] = ul


def _ldl_kernel_ps(n, p, kh_ref, kl_ref, reg_ref, lh_ref, ll_ref,
                   dh_ref, dl_ref):
    """Pre-split rank-p dd LDL^T — the round-5 factor kernel.

    Two structural cuts over _ldl_kernel, which spends ~33 VPU issue
    slots + 4 accumulator loads/stores per dd multiply-accumulate of
    the O(n³/3) trailing update:

    1. **Hoisted Dekker splits.**  Both rank-1 factors of a trailing
       update (the unscaled pivot column w and the scaled column l) are
       vectors reused across the whole outer product; splitting them
       ONCE per pivot (4 vector ops each) halves the per-element
       two_prod from 16 ops to 8 (p = a*b plus the 7-op error
       recovery from the pre-split halves).

    2. **Rank-p accumulation with f32 error folding**
       (_fused_sub_prods).  p pivots' products subtract from the
       trailing matrix in one read-modify-write: the hi words go
       through an exact two_sum cascade, all O(2^-24)-relative terms
       sum in plain f32 — p× fewer trailing-matrix RMWs and one
       renormalization per p MACs instead of two dd-op renorms per MAC.

    Within a p-block, pivot j's rank-1 update touches only the block's
    own remaining columns (narrow (rows, <p, lanes) ops through the
    same fused form).  Net issue-slot model: ~37 -> ~25.5 per MAC at
    p=2, ~23.5 at p=4.  Same factorization semantics as _ldl_kernel
    (QDLDL-class static regularization, directldl_qdldl.jl:10-96);
    error class unchanged (tests/test_pallas_dd.py asserts dd-grade
    solves for every p)."""
    lh_ref[...] = kh_ref[...]
    ll_ref[...] = kl_ref[...]
    for j in range(n):
        h, l = dd_add(lh_ref[j, j, :], ll_ref[j, j, :], reg_ref[j, :],
                      jnp.zeros_like(reg_ref[j, :]))
        lh_ref[j, j, :] = h
        ll_ref[j, j, :] = l
    for s in range(0, n, p):
        e = min(s + p, n)
        tail = []  # (pivot j, pre-split unscaled w at rows e:)
        for j in range(s, e):
            djh = lh_ref[j, j, :]
            djl = ll_ref[j, j, :]
            ih, il = dd_recip(djh, djl)
            dh_ref[j, :] = ih
            dl_ref[j, :] = il
            if j + 1 >= n:
                continue
            wh = lh_ref[j + 1 :, j, :]  # unscaled column below the pivot
            wl = ll_ref[j + 1 :, j, :]
            if e < n:
                # unscaled rows e: must be captured BEFORE the scaled
                # store below; ref windows only (value slices lower to
                # unsupported Mosaic gathers)
                tail.append((j, _presplit(lh_ref[e:, j, :],
                                          ll_ref[e:, j, :])))
            lch, lcl = dd_mul(wh, wl, ih[None, :], il[None, :])
            lh_ref[j + 1 :, j, :] = lch
            ll_ref[j + 1 :, j, :] = lcl
            if j + 1 < e:
                # in-block rank-1: A[j+1:, j+1:e] -= w ⊗ l[j+1:e]
                # (scaled entries re-read from the ref post-store)
                lph = lh_ref[j + 1 : e, j, :]
                lpl = ll_ref[j + 1 : e, j, :]
                uh, ul = _fused_sub_prods(
                    lh_ref[j + 1 :, j + 1 : e, :],
                    ll_ref[j + 1 :, j + 1 : e, :],
                    [(_bcol(_presplit(wh, wl)),
                      _brow(_presplit(lph, lpl)))],
                )
                lh_ref[j + 1 :, j + 1 : e, :] = uh
                ll_ref[j + 1 :, j + 1 : e, :] = ul
        if e < n and tail:
            terms = []
            for (j, wsp) in tail:
                lsp = _presplit(lh_ref[e:, j, :], ll_ref[e:, j, :])
                terms.append((_bcol(wsp), _brow(lsp)))
            uh, ul = _fused_sub_prods(lh_ref[e:, e:, :],
                                      ll_ref[e:, e:, :], terms)
            lh_ref[e:, e:, :] = uh
            ll_ref[e:, e:, :] = ul


def _ldl_kernel_psc(n, rows, kh_ref, kl_ref, reg_ref, lh_ref, ll_ref,
                    dh_ref, dl_ref):
    """Pre-split factor kernel with ROW-CHUNKED trailing updates.

    The diff-timed probes (scripts/mosaic_probe.py, round 5) show the
    machine ceiling for dependent elementwise chains on whole
    (83, 83, 128) operands is ~33% of the VPU f32 issue model, while
    the SAME chain processed in 8-row chunks reaches ~54% — Mosaic
    keeps chunk-sized temporaries closer to the register file instead
    of round-tripping every multi-vreg SSA value through VMEM.  This
    kernel therefore applies each pivot's pre-split rank-1 trailing
    update in `rows`-row chunks: the scaled-column factor is one full
    SSA value shared by every chunk (only the ROWS axis is chunked, so
    no value slicing — the Mosaic-gather trap), the unscaled w chunk
    reads straight from the ref (its scaled overwrite is deferred to
    after the chunk loop), and each chunk is a short fused
    read-compute-write."""
    lh_ref[...] = kh_ref[...]
    ll_ref[...] = kl_ref[...]
    for j in range(n):
        h, l = dd_add(lh_ref[j, j, :], ll_ref[j, j, :], reg_ref[j, :],
                      jnp.zeros_like(reg_ref[j, :]))
        lh_ref[j, j, :] = h
        ll_ref[j, j, :] = l
    for j in range(n):
        djh = lh_ref[j, j, :]
        djl = ll_ref[j, j, :]
        ih, il = dd_recip(djh, djl)
        dh_ref[j, :] = ih
        dl_ref[j, :] = il
        if j + 1 >= n:
            continue
        wh = lh_ref[j + 1 :, j, :]  # unscaled column below the pivot
        wl = ll_ref[j + 1 :, j, :]
        lch, lcl = dd_mul(wh, wl, ih[None, :], il[None, :])
        lsp = _brow(_presplit(lch, lcl))  # cols factor, shared
        for s in range(j + 1, n, rows):
            e = min(s + rows, n)
            wq = _bcol(_presplit(lh_ref[s:e, j, :], ll_ref[s:e, j, :]))
            uh, ul = _fused_sub_prods(
                lh_ref[s:e, j + 1 :, :], ll_ref[s:e, j + 1 :, :],
                [(wq, lsp)],
            )
            lh_ref[s:e, j + 1 :, :] = uh
            ll_ref[s:e, j + 1 :, :] = ul
        # deferred scaled store (the chunk loop needed unscaled w)
        lh_ref[j + 1 :, j, :] = lch
        ll_ref[j + 1 :, j, :] = lcl


def _ldl_kernel_psc2(n, rows, kh_ref, kl_ref, reg_ref, lh_ref, ll_ref,
                     dh_ref, dl_ref):
    """_ldl_kernel_psc with PIVOT PAIRS: the chunked trailing update
    applies two pivots' pre-split rank-1 terms in one read-modify-write
    of each chunk — half the trailing-matrix traffic of rank-1 psc.

    Mechanics per pair (j, j+1):
      1. pivot j: recip/scale; the scaled column stashes into row j's
         junk UPPER triangle (so later chunk iterations can re-read it
         from a ref — slicing the SSA value would lower to an
         unsupported Mosaic gather); the lower-triangle store of the
         scaled column is deferred past the tail loop (the chunks read
         the UNSCALED w from the ref).
      2. column j+1 gets pivot j's narrow rank-1 update (rows j+1..),
         making pivot j+1's diagonal and column final.
      3. pivot j+1: recip/scale, stash in row j+1's upper.
      4. rows-chunked rank-2 tail on [j+2.., j+2..] via
         _fused_sub_prods with both pivots' terms.
      5. deferred scaled-column stores for j and j+1.
    Odd n: the last pivot runs the rank-1 psc path."""
    lh_ref[...] = kh_ref[...]
    ll_ref[...] = kl_ref[...]
    for j in range(n):
        h, l = dd_add(lh_ref[j, j, :], ll_ref[j, j, :], reg_ref[j, :],
                      jnp.zeros_like(reg_ref[j, :]))
        lh_ref[j, j, :] = h
        ll_ref[j, j, :] = l
    j = 0
    while j < n:
        if j + 1 >= n:
            # final lone pivot: just the reciprocal (no column below)
            ih, il = dd_recip(lh_ref[j, j, :], ll_ref[j, j, :])
            dh_ref[j, :] = ih
            dl_ref[j, :] = il
            break
        # ---- pivot j
        ih, il = dd_recip(lh_ref[j, j, :], ll_ref[j, j, :])
        dh_ref[j, :] = ih
        dl_ref[j, :] = il
        wjh = lh_ref[j + 1 :, j, :]   # unscaled col j (rows j+1..)
        wjl = ll_ref[j + 1 :, j, :]
        lcjh, lcjl = dd_mul(wjh, wjl, ih[None, :], il[None, :])
        # stash the full scaled col j in row j's junk upper (cols
        # j+1..): later reads slice the REF, never the SSA value
        # (value slicing lowers to an unsupported Mosaic gather)
        lh_ref[j, j + 1 :, :] = lcjh
        ll_ref[j, j + 1 :, :] = lcjl
        # ---- narrow rank-1: column j+1, rows j+1.. (finalizes pivot
        # j+1's diagonal and column); the scalar l_j[j+1] reads from
        # the stash
        uh, ul = _fused_sub_prods(
            lh_ref[j + 1 :, j + 1, :], ll_ref[j + 1 :, j + 1, :],
            [(_presplit(wjh, wjl),
              tuple(v[None, :] for v in _presplit(lh_ref[j, j + 1, :],
                                                  ll_ref[j, j + 1, :])))],
        )
        lh_ref[j + 1 :, j + 1, :] = uh
        ll_ref[j + 1 :, j + 1, :] = ul
        # ---- pivot j+1
        i2h, i2l = dd_recip(lh_ref[j + 1, j + 1, :],
                            ll_ref[j + 1, j + 1, :])
        dh_ref[j + 1, :] = i2h
        dl_ref[j + 1, :] = i2l
        if j + 2 < n:
            w2h = lh_ref[j + 2 :, j + 1, :]  # unscaled col j+1
            w2l = ll_ref[j + 2 :, j + 1, :]
            lc2h, lc2l = dd_mul(w2h, w2l, i2h[None, :], i2l[None, :])
            lh_ref[j + 1, j + 2 :, :] = lc2h
            ll_ref[j + 1, j + 2 :, :] = lc2l
            # ---- chunked rank-2 tail on [j+2.., j+2..]
            lsp_j = _brow(_presplit(lh_ref[j, j + 2 :, :],
                                    ll_ref[j, j + 2 :, :]))
            lsp_2 = _brow(_presplit(lh_ref[j + 1, j + 2 :, :],
                                    ll_ref[j + 1, j + 2 :, :]))
            for s in range(j + 2, n, rows):
                e = min(s + rows, n)
                wq_j = _bcol(_presplit(lh_ref[s:e, j, :],
                                       ll_ref[s:e, j, :]))
                wq_2 = _bcol(_presplit(lh_ref[s:e, j + 1, :],
                                       ll_ref[s:e, j + 1, :]))
                th, tl = _fused_sub_prods(
                    lh_ref[s:e, j + 2 :, :], ll_ref[s:e, j + 2 :, :],
                    [(wq_j, lsp_j), (wq_2, lsp_2)],
                )
                lh_ref[s:e, j + 2 :, :] = th
                ll_ref[s:e, j + 2 :, :] = tl
            # deferred scaled-column stores
            lh_ref[j + 2 :, j + 1, :] = lc2h
            ll_ref[j + 2 :, j + 1, :] = lc2l
        lh_ref[j + 1 :, j, :] = lcjh
        ll_ref[j + 1 :, j, :] = lcjl
        j += 2


def _ldl_kernel_aligned(n, kh_ref, kl_ref, reg_ref, lh_ref, ll_ref,
                        dh_ref, dl_ref):
    """_ldl_kernel with the trailing update's COLUMN offset aligned to
    the 8-sublane tile boundary.

    Mosaic tiles the last two axes (cols, lanes) of the (rows, cols,
    lanes) refs in (8, 128) vregs, so a trailing window starting at
    column j+1 has a sublane offset 7 of 8 pivots — every op on it
    lowers with per-vreg rotates/masks.  This variant widens the window
    to columns c0 = 8*floor((j+1)/8).. and zeroes the first j+1-c0
    entries of the scaled-column factor instead: finalized columns in
    c0..j receive an exactly-zero update (written back unchanged), the
    ops are tile-aligned, and the extra arithmetic is <= 7 columns per
    pivot.  Row offsets are the untiled outer axis — exact slices stay.

    MEASURED NO WIN (round 4, (83, 4096) on v5e): 19.4 ms vs 18.0 ms
    plain — the per-pivot mask generation and <= 7 extra dd columns
    cost more than Mosaic's handling of the sublane offset saves.
    Kept behind CUCLARABEL_DD_ALIGN=1 as the documented experiment
    (same conclusion class as the blocked-panel factor, ab_block.json).
    """
    lanes = kh_ref.shape[-1]
    lh_ref[...] = kh_ref[...]
    ll_ref[...] = kl_ref[...]
    for j in range(n):
        h, l = dd_add(lh_ref[j, j, :], ll_ref[j, j, :], reg_ref[j, :],
                      jnp.zeros_like(reg_ref[j, :]))
        lh_ref[j, j, :] = h
        ll_ref[j, j, :] = l
    for j in range(n):
        djh = lh_ref[j, j, :]
        djl = ll_ref[j, j, :]
        ih, il = dd_recip(djh, djl)
        dh_ref[j, :] = ih
        dl_ref[j, :] = il
        if j + 1 < n:
            c0 = ((j + 1) // 8) * 8
            # rows c0.. of column j give the cols-axis factor of the
            # rank-1 update; entries c0..j are masked to zero so the
            # finalized columns c0..j (and the pivot column) are
            # written back unchanged by the aligned update
            cwh = lh_ref[c0:, j, :]          # (n-c0, lanes)
            cwl = ll_ref[c0:, j, :]
            lwh, lwl = dd_mul(cwh, cwl, ih[None, :], il[None, :])
            if c0 <= j:
                msk = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (n - c0, 1), 0) >= (j + 1 - c0)
                ).astype(cwh.dtype)
                lwh = lwh * msk
                lwl = lwl * msk
            # scaled column store (narrow op; rows axis is untiled)
            lh_ref[j + 1 :, j, :] = lwh[j + 1 - c0 :]
            ll_ref[j + 1 :, j, :] = lwl[j + 1 - c0 :]
            # trailing update on the cols-aligned window
            colh = cwh[j + 1 - c0 :]          # rows j+1.. (exact)
            coll = cwl[j + 1 - c0 :]
            ph, pe = dd_mul(
                colh[:, None, :], coll[:, None, :],
                lwh[None, :, :], lwl[None, :, :],
            )
            uh, ul = dd_sub(
                lh_ref[j + 1 :, c0:, :], ll_ref[j + 1 :, c0:, :],
                ph, pe,
            )
            lh_ref[j + 1 :, c0:, :] = uh
            ll_ref[j + 1 :, c0:, :] = ul


def _ldl_kernel_blocked(n, p, kh_ref, kl_ref, reg_ref, lh_ref, ll_ref,
                        dh_ref, dl_ref):
    """Right-looking dd LDL^T by width-p panels.

    The plain kernel read-modify-writes the whole trailing submatrix
    once per pivot; panels restrict each pivot's rank-1 update to the
    panel's own columns and apply ONE accumulated rank-p update to the
    trailing matrix per panel — p× fewer loads/stores of the O(n²)
    region and p× fewer large-op issues, at identical dd op count
    (the rank-1 terms are summed in a tree before a single subtract,
    a reordering within the same error class)."""
    lh_ref[...] = kh_ref[...]
    ll_ref[...] = kl_ref[...]
    for j in range(n):
        h, l = dd_add(lh_ref[j, j, :], ll_ref[j, j, :], reg_ref[j, :],
                      jnp.zeros_like(reg_ref[j, :]))
        lh_ref[j, j, :] = h
        ll_ref[j, j, :] = l
    for s in range(0, n, p):
        e = min(s + p, n)
        w_cols = []  # unscaled panel columns at rows e: (= l*d), live in SSA
        for j in range(s, e):
            djh = lh_ref[j, j, :]
            djl = ll_ref[j, j, :]
            ih, il = dd_recip(djh, djl)
            dh_ref[j, :] = ih
            dl_ref[j, :] = il
            if j + 1 < n:
                colh = lh_ref[j + 1 :, j, :]  # unscaled, fully updated
                coll = ll_ref[j + 1 :, j, :]
                if e < n:
                    # read the sub-column straight from the ref: slicing
                    # the colh VALUE lowers to an unsupported Mosaic
                    # gather; static ref windows are fine
                    w_cols.append((lh_ref[e:, j, :], ll_ref[e:, j, :]))
                lch, lcl = dd_mul(colh, coll, ih[None, :], il[None, :])
                lh_ref[j + 1 :, j, :] = lch
                ll_ref[j + 1 :, j, :] = lcl
                if j + 1 < e:
                    # rank-1 update restricted to the panel's own
                    # columns; re-read the scaled panel piece from the
                    # ref (value slicing = gather, see above)
                    lph = lh_ref[j + 1 : e, j, :]
                    lpl = ll_ref[j + 1 : e, j, :]
                    ph, pe = dd_mul(
                        colh[:, None, :], coll[:, None, :],
                        lph[None, :, :], lpl[None, :, :],
                    )
                    uh, ul = dd_sub(
                        lh_ref[j + 1 :, j + 1 : e, :],
                        ll_ref[j + 1 :, j + 1 : e, :], ph, pe,
                    )
                    lh_ref[j + 1 :, j + 1 : e, :] = uh
                    ll_ref[j + 1 :, j + 1 : e, :] = ul
        if e < n:
            # one rank-p trailing update: A[e:, e:] -= sum_j w_j ⊗ l_j
            acc_h = acc_l = None
            for idx, j in enumerate(range(s, e)):
                wh, wl = w_cols[idx]
                lhj = lh_ref[e:, j, :]
                llj = ll_ref[e:, j, :]
                ph, pe = dd_mul(wh[:, None, :], wl[:, None, :],
                                lhj[None, :, :], llj[None, :, :])
                if acc_h is None:
                    acc_h, acc_l = ph, pe
                else:
                    acc_h, acc_l = dd_add(acc_h, acc_l, ph, pe)
            uh, ul = dd_sub(lh_ref[e:, e:, :], ll_ref[e:, e:, :],
                            acc_h, acc_l)
            lh_ref[e:, e:, :] = uh
            ll_ref[e:, e:, :] = ul


def _solve_kernel(n, lh_ref, ll_ref, dh_ref, dl_ref, bh_ref, bl_ref,
                  xh_ref, xl_ref):
    """(L+I) D (L+I)^T x = b in dd, in-place substitutions."""
    xh_ref[...] = bh_ref[...]
    xl_ref[...] = bl_ref[...]
    for j in range(1, n):  # forward
        ph, pe = dd_mul(lh_ref[j, :j, :], ll_ref[j, :j, :],
                        xh_ref[:j, :], xl_ref[:j, :])
        sh, sl = dd_sum_axis0(ph, pe)
        h, l = dd_sub(xh_ref[j, :], xl_ref[j, :], sh, sl)
        xh_ref[j, :] = h
        xl_ref[j, :] = l
    h, l = dd_mul(xh_ref[...], xl_ref[...], dh_ref[...], dl_ref[...])
    xh_ref[...] = h
    xl_ref[...] = l
    for j in range(n - 2, -1, -1):  # backward
        ph, pe = dd_mul(lh_ref[j + 1 :, j, :], ll_ref[j + 1 :, j, :],
                        xh_ref[j + 1 :, :], xl_ref[j + 1 :, :])
        sh, sl = dd_sum_axis0(ph, pe)
        h, l = dd_sub(xh_ref[j, :], xl_ref[j, :], sh, sl)
        xh_ref[j, :] = h
        xl_ref[j, :] = l


def _panel_sub_presplit(th, tl, lh_, ll_, xsp, axis):
    """(th, tl) -= contraction of an L panel with a pre-split dd x
    panel over `axis` (1 = forward: x broadcast over rows; 0 =
    backward: x broadcast over cols).  One-side pre-split form: the x
    operand's Dekker halves are shared across the whole panel (see
    _fused_sub_prods), the L element splits inline — ~18 ops/element
    vs 23 for full dd_mul, same error class (per-element
    quick_two_sum renorm + dd tree reduction)."""
    xh_, xl_, x1, x2 = xsp
    if axis == 1:  # x indexed by panel cols -> broadcast over rows
        xb, xlb, x1b, x2b = (v[None, :, :] for v in (xh_, xl_, x1, x2))
    else:  # x indexed by panel rows -> broadcast over cols
        xb, xlb, x1b, x2b = (v[:, None, :] for v in (xh_, xl_, x1, x2))
    l1, l2 = _dk_split(lh_)
    pr = lh_ * xb
    err = (((l1 * x1b - pr) + l1 * x2b + l2 * x1b) + l2 * x2b
           + (lh_ * xlb + ll_ * xb))
    ph, pe = _quick_two_sum(pr, err)
    sh, sl = dd_sum_axis(ph, pe, axis)
    return dd_sub(th, tl, sh, sl)


def _solve_kernel_blocked_ps(n, p, lh_ref, ll_ref, dh_ref, dl_ref,
                             bh_ref, bl_ref, xh_ref, xl_ref):
    """_solve_kernel_blocked with pre-split panel updates (round 5).
    The intra-panel short steps (latency-bound single-sublane ops)
    stay plain; the wide rank-p panel updates — the issue-bound bulk
    — use the one-side pre-split form."""
    xh_ref[...] = bh_ref[...]
    xl_ref[...] = bl_ref[...]
    for s in range(0, n, p):  # forward: (I+L) y = b
        e = min(s + p, n)
        for j in range(s + 1, e):
            ph, pe = dd_mul(lh_ref[j, s:j, :], ll_ref[j, s:j, :],
                            xh_ref[s:j, :], xl_ref[s:j, :])
            sh, sl = dd_sum_axis0(ph, pe)
            h, l = dd_sub(xh_ref[j, :], xl_ref[j, :], sh, sl)
            xh_ref[j, :] = h
            xl_ref[j, :] = l
        if e < n:
            xsp = _presplit(xh_ref[s:e, :], xl_ref[s:e, :])
            h, l = _panel_sub_presplit(
                xh_ref[e:, :], xl_ref[e:, :],
                lh_ref[e:, s:e, :], ll_ref[e:, s:e, :], xsp, axis=1)
            xh_ref[e:, :] = h
            xl_ref[e:, :] = l
    h, l = dd_mul(xh_ref[...], xl_ref[...], dh_ref[...], dl_ref[...])
    xh_ref[...] = h
    xl_ref[...] = l
    for s in reversed(range(0, n, p)):  # backward: (I+L)^T x = y
        e = min(s + p, n)
        if e < n:
            xsp = _presplit(xh_ref[e:, :], xl_ref[e:, :])
            h, l = _panel_sub_presplit(
                xh_ref[s:e, :], xl_ref[s:e, :],
                lh_ref[e:, s:e, :], ll_ref[e:, s:e, :], xsp, axis=0)
            xh_ref[s:e, :] = h
            xl_ref[s:e, :] = l
        for j in range(e - 2, s - 1, -1):
            ph, pe = dd_mul(lh_ref[j + 1 : e, j, :], ll_ref[j + 1 : e, j, :],
                            xh_ref[j + 1 : e, :], xl_ref[j + 1 : e, :])
            sh, sl = dd_sum_axis0(ph, pe)
            h, l = dd_sub(xh_ref[j, :], xl_ref[j, :], sh, sl)
            xh_ref[j, :] = h
            xl_ref[j, :] = l


def _solve_kernel_blocked(n, p, lh_ref, ll_ref, dh_ref, dl_ref, bh_ref,
                          bl_ref, xh_ref, xl_ref):
    """Blocked (L+I) D (L+I)^T x = b: substitution by width-p panels.

    The plain unrolled substitution is a chain of n sequential steps
    whose step-j reduction spans j rows — at n ~ 83 each step's operand
    covers up to ceil(n/8) sublane groups and the whole sweep is
    dependency-latency-bound (measured 11.6% of VPU issue peak,
    docs/performance.md).  Blocking reorders the SAME dd operations:
    inside a width-p panel the step reductions span < p rows (one
    sublane group when p = 8), and each panel's contribution to the
    rows below/above it is applied once as a vectorized rank-p update
    (a (rows, p, lanes) dd product + log2(p) tree levels).  The
    dependency chain becomes n short steps + n/p wide ops.  Bitwise
    reordering only changes the summation tree, staying within the same
    dd error class; the fused refine's monotone-accept IR passes gate
    any per-lane regression exactly as before."""
    xh_ref[...] = bh_ref[...]
    xl_ref[...] = bl_ref[...]
    for s in range(0, n, p):  # forward: (I+L) y = b
        e = min(s + p, n)
        for j in range(s + 1, e):
            ph, pe = dd_mul(lh_ref[j, s:j, :], ll_ref[j, s:j, :],
                            xh_ref[s:j, :], xl_ref[s:j, :])
            sh, sl = dd_sum_axis0(ph, pe)
            h, l = dd_sub(xh_ref[j, :], xl_ref[j, :], sh, sl)
            xh_ref[j, :] = h
            xl_ref[j, :] = l
        if e < n:
            # x[e:] -= L[e:, s:e] @ x[s:e], contraction over the panel
            ph, pe = dd_mul(
                lh_ref[e:, s:e, :], ll_ref[e:, s:e, :],
                xh_ref[s:e, :][None, :, :], xl_ref[s:e, :][None, :, :],
            )
            sh, sl = dd_sum_axis(ph, pe, axis=1)
            h, l = dd_sub(xh_ref[e:, :], xl_ref[e:, :], sh, sl)
            xh_ref[e:, :] = h
            xl_ref[e:, :] = l
    h, l = dd_mul(xh_ref[...], xl_ref[...], dh_ref[...], dl_ref[...])
    xh_ref[...] = h
    xl_ref[...] = l
    for s in reversed(range(0, n, p)):  # backward: (I+L)^T x = y
        e = min(s + p, n)
        if e < n:
            # x[s:e] -= L[e:, s:e]^T @ x[e:], contraction over rows below
            ph, pe = dd_mul(
                lh_ref[e:, s:e, :], ll_ref[e:, s:e, :],
                xh_ref[e:, :][:, None, :], xl_ref[e:, :][:, None, :],
            )
            sh, sl = dd_sum_axis0(ph, pe)
            h, l = dd_sub(xh_ref[s:e, :], xl_ref[s:e, :], sh, sl)
            xh_ref[s:e, :] = h
            xl_ref[s:e, :] = l
        for j in range(e - 2, s - 1, -1):
            ph, pe = dd_mul(lh_ref[j + 1 : e, j, :], ll_ref[j + 1 : e, j, :],
                            xh_ref[j + 1 : e, :], xl_ref[j + 1 : e, :])
            sh, sl = dd_sum_axis0(ph, pe)
            h, l = dd_sub(xh_ref[j, :], xl_ref[j, :], sh, sl)
            xh_ref[j, :] = h
            xl_ref[j, :] = l


# Unrolled kernels past this size explode Mosaic compile memory; below
# it they win on runtime but cost minutes of Python TRACING per
# process (the persistent cache only skips XLA compile, not tracing).
# Env override for experiments: 0 forces the fori_loop variants
# everywhere (constant-size IR, seconds to trace).
UNROLL_MAX = int(os.environ.get("CUCLARABEL_DD_UNROLL_MAX", "96"))

# Substitution panel width for _solve_kernel_blocked (0 disables).
# Default decided by on-chip A/B (benchmarks/ab_results/); per-call
# `block=` overrides for experiments.
DD_BLOCK = int(os.environ.get("CUCLARABEL_DD_BLOCK", "8"))

# Factor panel width for _ldl_kernel_blocked (0 disables).
DD_FACTOR_BLOCK = int(os.environ.get("CUCLARABEL_DD_FACTOR_BLOCK", "0"))

# Pre-split rank-p factor kernel (_ldl_kernel_ps); 0 disables.  Default
# decided by on-chip A/B (benchmarks/ab_results/ab_factor_ps.json).
DD_FACTOR_PS = int(os.environ.get("CUCLARABEL_DD_FACTOR_PS", "2"))

# Pre-split panel updates in the blocked substitution kernels
# (_solve_kernel_blocked_ps); read ONCE at import and part of the impl
# cache key — reading the env at trace time with a key that omits it
# would silently serve a stale kernel on in-process toggles (the
# UNROLL_MAX lesson).  Measured a wash on-chip (ab_factor_ps.json);
# kept on (no regression, marginal solve win).
DD_SOLVE_PS = os.environ.get("CUCLARABEL_DD_SOLVE_PS", "1") != "0"

# Row-chunked residual matvecs in the refine/residual kernels
# (_resid_chunked): contraction-axis chunk rows; 0 disables.
DD_RESID_CHUNK = int(os.environ.get("CUCLARABEL_DD_RESID_CHUNK", "4"))

# Row-chunked pre-split factor kernel: trailing updates processed in
# this many rows per fused read-compute-write (0 disables; takes
# precedence over PS).  Negative = rank-2 pivot-pair variant
# (_ldl_kernel_psc2) with |value| chunk rows: two pivots' rank-1 terms
# land in ONE read-modify-write of each chunk — half the trailing
# traffic of rank-1 psc.  Round-5 on-chip sweep
# (benchmarks/ab_results/ab_factor_ps.json): plain 14.44 ms ->
# psc4 9.48/9.25 -> psc-2 7.12 ms at (83, 4096); interleaved A/B at
# the bench shape (76, 4096): psc-1 5.02/5.37 vs psc-2 5.56/5.38 (and
# psc4 7.38) -> psc-1 default.  Small chunks fit the live dd
# temporaries in registers (psc-3/-4/-5 climb back to 8.2/9.4/10.2).
DD_FACTOR_PSC = int(os.environ.get("CUCLARABEL_DD_FACTOR_PSC", "-1"))


def _factor_body_for(n, block, ps=0, psc=0):
    if n > UNROLL_MAX:
        return _ldl_kernel_looped
    if 0 < psc:
        def body(n_, *refs, _r=psc):
            return _ldl_kernel_psc(n_, _r, *refs)

        return body
    if psc < 0:
        def body(n_, *refs, _r=-psc):
            return _ldl_kernel_psc2(n_, _r, *refs)

        return body
    if 0 < ps:
        def body(n_, *refs, _p=min(ps, n)):
            return _ldl_kernel_ps(n_, _p, *refs)

        return body
    if 0 < block < n:
        def body(n_, *refs, _p=block):
            return _ldl_kernel_blocked(n_, _p, *refs)

        return body
    if os.environ.get("CUCLARABEL_DD_ALIGN", "0") == "1":
        return _ldl_kernel_aligned
    return _ldl_kernel


def _solve_body_for(n, block):
    """Pick the substitution body: looped (constant IR) above
    UNROLL_MAX, else blocked panels when enabled (pre-split panel
    updates unless CUCLARABEL_DD_SOLVE_PS=0), else plain unrolled."""
    if n > UNROLL_MAX:
        return _solve_kernel_looped
    if 0 < block < n:
        kern = (_solve_kernel_blocked_ps if DD_SOLVE_PS
                else _solve_kernel_blocked)

        def body(n_, *refs, _k=kern, _p=block):
            return _k(n_, _p, *refs)

        return body
    return _solve_kernel


def _solve_body_r_for(n, block):
    """Multi-RHS analog of _solve_body_for."""
    if n > UNROLL_MAX:
        return _solve_kernel_r_looped
    if 0 < block < n:
        def body(n_, *refs, _p=block):
            return _solve_kernel_r_blocked(n_, _p, *refs)

        return body
    return _solve_kernel_r


def _ldl_kernel_looped(n, kh_ref, kl_ref, reg_ref, lh_ref, ll_ref,
                       dh_ref, dl_ref):
    """fori_loop dd LDL^T with masked full-width updates: constant IR in
    n (the unrolled kernel's compile memory grows superlinearly and
    OOMs the remote compiler around n ~ 160)."""
    lanes = kh_ref.shape[-1]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    diag_m = (iota_r == iota_c).astype(kh_ref.dtype)
    # copy + add regularization on the diagonal (exact: off-diagonal
    # addend is exactly zero)
    h, l = dd_add(kh_ref[...], kl_ref[...],
                  reg_ref[...][:, None, :] * diag_m,
                  jnp.zeros((n, n, lanes), kh_ref.dtype))
    lh_ref[...] = h
    ll_ref[...] = l
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)

    def body(j, _):
        djh = lh_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]
        djl = ll_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]
        ih, il = dd_recip(djh, djl)
        dh_ref[pl.ds(j, 1), :] = ih[None, :]
        dl_ref[pl.ds(j, 1), :] = il[None, :]
        colh = lh_ref[:, pl.ds(j, 1), :][:, 0, :]
        coll = ll_ref[:, pl.ds(j, 1), :][:, 0, :]
        lch, lcl = dd_mul(colh, coll, ih[None, :], il[None, :])
        gt = (col_iota > j).astype(colh.dtype)  # (1, n, 1)
        ph, pe = dd_mul(
            colh[:, None, :], coll[:, None, :],
            lch[None, :, :] * gt, lcl[None, :, :] * gt,
        )
        uh, ul = dd_sub(lh_ref[...], ll_ref[...], ph, pe)
        lh_ref[...] = uh
        ll_ref[...] = ul
        lh_ref[:, pl.ds(j, 1), :] = lch[:, None, :]
        ll_ref[:, pl.ds(j, 1), :] = lcl[:, None, :]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _solve_kernel_looped(n, lh_ref, ll_ref, dh_ref, dl_ref, bh_ref,
                         bl_ref, xh_ref, xl_ref):
    xh_ref[...] = bh_ref[...]
    xl_ref[...] = bl_ref[...]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def fwd(j, _):
        colh = lh_ref[:, pl.ds(j, 1), :][:, 0, :]
        coll = ll_ref[:, pl.ds(j, 1), :][:, 0, :]
        gt = (row_iota > j).astype(colh.dtype)  # (n, 1)
        xjh = xh_ref[pl.ds(j, 1), :][0, :]
        xjl = xl_ref[pl.ds(j, 1), :][0, :]
        ph, pe = dd_mul(colh * gt, coll * gt, xjh[None, :], xjl[None, :])
        h, l = dd_sub(xh_ref[...], xl_ref[...], ph, pe)
        xh_ref[...] = h
        xl_ref[...] = l
        return 0

    jax.lax.fori_loop(0, n, fwd, 0)
    h, l = dd_mul(xh_ref[...], xl_ref[...], dh_ref[...], dl_ref[...])
    xh_ref[...] = h
    xl_ref[...] = l

    def bwd(jj, _):
        j = n - 1 - jj
        colh = lh_ref[:, pl.ds(j, 1), :][:, 0, :]
        coll = ll_ref[:, pl.ds(j, 1), :][:, 0, :]
        gt = (row_iota > j).astype(colh.dtype)
        ph, pe = dd_mul(colh * gt, coll * gt, xh_ref[...], xl_ref[...])
        sh, sl = dd_sum_axis0(ph, pe)
        h, l = dd_sub(xh_ref[pl.ds(j, 1), :][0, :],
                      xl_ref[pl.ds(j, 1), :][0, :], sh, sl)
        xh_ref[pl.ds(j, 1), :] = h[None, :]
        xl_ref[pl.ds(j, 1), :] = l[None, :]
        return 0

    jax.lax.fori_loop(0, n, bwd, 0)


def _residual_kernel(n, kh_ref, kl_ref, xh_ref, xl_ref, bh_ref, bl_ref,
                     rh_ref, rl_ref):
    """r = b - K x in dd (K unregularized, SYMMETRIC): one vectorized
    (n, n, lanes) dd product, then a pairwise reduction.

    Symmetry lets the contraction run over the OUTER axis —
    (Kx)_i = sum_k K[k, i] x[k] — with x broadcast along sublanes, so
    no (n, n, lanes) transposes are materialized (the swapaxes pair of
    the row-contraction form costs as much as the multiply itself).
    Every KKT caller passes the symmetric quasidefinite K; the kernel
    is NOT valid for general K."""
    ph, pe = dd_mul(kh_ref[...], kl_ref[...],
                    xh_ref[...][:, None, :], xl_ref[...][:, None, :])
    sh, sl = dd_sum_axis0(ph, pe)
    h, l = dd_sub(bh_ref[...], bl_ref[...], sh, sl)
    rh_ref[...] = h
    rl_ref[...] = l


def _resid_chunked(n, rows, kh_ref, kl_ref, xrh, xrl, bh, bl):
    """r = b - K x contracted over K's leading axis (symmetric K), in
    `rows`-row chunks of the contraction axis — the probe-measured
    ~1.6x per-op win of chunk-sized temporaries (docs/performance.md,
    round-5 Mosaic analysis), plus a one-side pre-split of the x chunk
    (K elements are used once; x chunk halves are shared across all n
    output columns).  xrh/xrl must be REFS (value slicing lowers to an
    unsupported Mosaic gather); bh/bl are SSA values.  Error class:
    per-element quick_two_sum renormalization + dd tree reduction per
    chunk + sequential dd_sub accumulation — the same class as the
    whole-array kernel's product-then-tree form."""
    rh, rl = bh, bl
    for s in range(0, n, rows):
        e = min(s + rows, n)
        xh_, xl_, x1, x2 = _presplit(xrh[s:e, :], xrl[s:e, :])
        xb = xh_[:, None, :]
        xlb = xl_[:, None, :]
        x1b = x1[:, None, :]
        x2b = x2[:, None, :]
        kh = kh_ref[s:e, :, :]
        kl = kl_ref[s:e, :, :]
        k1, k2 = _dk_split(kh)
        p = kh * xb
        err = (((k1 * x1b - p) + k1 * x2b + k2 * x1b) + k2 * x2b
               + (kh * xlb + kl * xb))
        ph, pe = _quick_two_sum(p, err)
        sh, sl = dd_sum_axis0(ph, pe)
        rh, rl = dd_sub(rh, rl, sh, sl)
    return rh, rl


def _residual_kernel_c(n, rows, kh_ref, kl_ref, xh_ref, xl_ref, bh_ref,
                       bl_ref, rh_ref, rl_ref):
    """Chunked standalone residual (see _resid_chunked)."""
    h, l = _resid_chunked(n, rows, kh_ref, kl_ref, xh_ref, xl_ref,
                          bh_ref[...], bl_ref[...])
    rh_ref[...] = h
    rl_ref[...] = l


def _refine_kernel_c(n, rows, npass, solve_body, kh_ref, kl_ref, lh_ref,
                     ll_ref, dh_ref, dl_ref, bh_ref, bl_ref, xh_ref,
                     xl_ref, rh_ref, rl_ref, dxh_s, dxl_s):
    """_refine_kernel with chunked residual matvecs.  The candidate
    iterate is staged through the dx scratch (dx is dead once x+dx is
    formed) so each residual reads x chunks from a REF."""
    solve_body(n, lh_ref, ll_ref, dh_ref, dl_ref, bh_ref, bl_ref,
               xh_ref, xl_ref)
    eh, el = _resid_chunked(n, rows, kh_ref, kl_ref, xh_ref, xl_ref,
                            bh_ref[...], bl_ref[...])
    rh_ref[...] = eh
    rl_ref[...] = el
    ne = jnp.max(jnp.abs(eh), axis=0)
    for _ in range(npass):
        solve_body(n, lh_ref, ll_ref, dh_ref, dl_ref, rh_ref, rl_ref,
                   dxh_s, dxl_s)
        xnh, xnl = dd_add(xh_ref[...], xl_ref[...], dxh_s[...], dxl_s[...])
        dxh_s[...] = xnh
        dxl_s[...] = xnl
        enh, enl = _resid_chunked(n, rows, kh_ref, kl_ref, dxh_s, dxl_s,
                                  bh_ref[...], bl_ref[...])
        nen = jnp.max(jnp.abs(enh), axis=0)
        acc = nen < ne
        accm = acc[None, :]
        xh_ref[...] = jnp.where(accm, dxh_s[...], xh_ref[...])
        xl_ref[...] = jnp.where(accm, dxl_s[...], xl_ref[...])
        rh_ref[...] = jnp.where(accm, enh, rh_ref[...])
        rl_ref[...] = jnp.where(accm, enl, rl_ref[...])
        ne = jnp.where(acc, nen, ne)


def _refine_kernel(n, npass, solve_body, kh_ref, kl_ref, lh_ref, ll_ref,
                   dh_ref, dl_ref, bh_ref, bl_ref, xh_ref, xl_ref,
                   rh_ref, rl_ref, dxh_s, dxl_s):
    """Fused refined solve: x = K^-1 b with `npass` iterative-refinement
    passes against the UNregularized K, all inside one kernel launch.

    Replaces the 1 + 2*npass separate solve/residual launches of the
    unfused path: L (hi/lo) and K (hi/lo) stream from HBM once per
    refined solve instead of once per pass — the KKT solve chain is
    HBM-bound at these shapes (N << 128), so this halves-to-thirds its
    wall time.  Per-lane monotonicity gating matches the outer
    while_loop's accept rule (kktsolver_directldl.jl:430-438 semantics:
    accept a pass only if the residual norm improved); rejected lanes
    keep their previous iterate/residual.  Outputs the accepted x and
    its residual r = b - K x so the caller can run the (now rarely
    taken) tolerance loop on top."""
    solve_body(n, lh_ref, ll_ref, dh_ref, dl_ref, bh_ref, bl_ref,
               xh_ref, xl_ref)

    def resid(xh, xl):
        # symmetric-K contraction over the outer axis (see
        # _residual_kernel): no transposes
        ph, pe = dd_mul(kh_ref[...], kl_ref[...],
                        xh[:, None, :], xl[:, None, :])
        sh, sl = dd_sum_axis0(ph, pe)
        return dd_sub(bh_ref[...], bl_ref[...], sh, sl)

    eh, el = resid(xh_ref[...], xl_ref[...])
    rh_ref[...] = eh
    rl_ref[...] = el
    ne = jnp.max(jnp.abs(eh), axis=0)  # per-lane inf norm (hi word)
    for _ in range(npass):
        # dx = solve(r); candidate x + dx; accept iff residual improves
        solve_body(n, lh_ref, ll_ref, dh_ref, dl_ref, rh_ref, rl_ref,
                   dxh_s, dxl_s)
        xnh, xnl = dd_add(xh_ref[...], xl_ref[...], dxh_s[...], dxl_s[...])
        enh, enl = resid(xnh, xnl)
        nen = jnp.max(jnp.abs(enh), axis=0)
        acc = nen < ne
        accm = acc[None, :]
        xh_ref[...] = jnp.where(accm, xnh, xh_ref[...])
        xl_ref[...] = jnp.where(accm, xnl, xl_ref[...])
        rh_ref[...] = jnp.where(accm, enh, rh_ref[...])
        rl_ref[...] = jnp.where(accm, enl, rl_ref[...])
        ne = jnp.where(acc, nen, ne)


def _solve_kernel_r(n, lh_ref, ll_ref, dh_ref, dl_ref, bh_ref, bl_ref,
                    xh_ref, xl_ref):
    """Multi-RHS (L+I) D (L+I)^T X = B; b/x refs are (n, r, lanes).

    One sequential n-step substitution chain serves all r right-hand
    sides: the per-step work grows r-fold but the chain length (the
    latency-bound part at N << 128) does not, so solving the
    constant-RHS and affine systems together costs far less than two
    launches."""
    xh_ref[...] = bh_ref[...]
    xl_ref[...] = bl_ref[...]
    for j in range(1, n):  # forward
        ph, pe = dd_mul(
            lh_ref[j, :j, :][:, None, :], ll_ref[j, :j, :][:, None, :],
            xh_ref[:j, :, :], xl_ref[:j, :, :],
        )
        sh, sl = dd_sum_axis0(ph, pe)  # (r, lanes)
        h, l = dd_sub(xh_ref[j, :, :], xl_ref[j, :, :], sh, sl)
        xh_ref[j, :, :] = h
        xl_ref[j, :, :] = l
    h, l = dd_mul(xh_ref[...], xl_ref[...],
                  dh_ref[...][:, None, :], dl_ref[...][:, None, :])
    xh_ref[...] = h
    xl_ref[...] = l
    for j in range(n - 2, -1, -1):  # backward
        ph, pe = dd_mul(
            lh_ref[j + 1:, j, :][:, None, :],
            ll_ref[j + 1:, j, :][:, None, :],
            xh_ref[j + 1:, :, :], xl_ref[j + 1:, :, :],
        )
        sh, sl = dd_sum_axis0(ph, pe)
        h, l = dd_sub(xh_ref[j, :, :], xl_ref[j, :, :], sh, sl)
        xh_ref[j, :, :] = h
        xl_ref[j, :, :] = l


def _solve_kernel_r_blocked(n, p, lh_ref, ll_ref, dh_ref, dl_ref,
                            bh_ref, bl_ref, xh_ref, xl_ref):
    """Blocked-panel multi-RHS substitution (see _solve_kernel_blocked).
    Intra-panel steps vectorize over the RHS axis (3-D ops, the proven
    unrolled pattern); the per-panel trailing updates unroll over the
    small static r instead of forming rank-4 broadcasts."""
    r = bh_ref.shape[1]
    xh_ref[...] = bh_ref[...]
    xl_ref[...] = bl_ref[...]
    for s in range(0, n, p):  # forward
        e = min(s + p, n)
        for j in range(s + 1, e):
            ph, pe = dd_mul(
                lh_ref[j, s:j, :][:, None, :], ll_ref[j, s:j, :][:, None, :],
                xh_ref[s:j, :, :], xl_ref[s:j, :, :],
            )
            sh, sl = dd_sum_axis0(ph, pe)  # (r, lanes)
            h, l = dd_sub(xh_ref[j, :, :], xl_ref[j, :, :], sh, sl)
            xh_ref[j, :, :] = h
            xl_ref[j, :, :] = l
        if e < n:
            for t in range(r):
                ph, pe = dd_mul(
                    lh_ref[e:, s:e, :], ll_ref[e:, s:e, :],
                    xh_ref[s:e, t, :][None, :, :],
                    xl_ref[s:e, t, :][None, :, :],
                )
                sh, sl = dd_sum_axis(ph, pe, axis=1)
                h, l = dd_sub(xh_ref[e:, t, :], xl_ref[e:, t, :], sh, sl)
                xh_ref[e:, t, :] = h
                xl_ref[e:, t, :] = l
    h, l = dd_mul(xh_ref[...], xl_ref[...],
                  dh_ref[...][:, None, :], dl_ref[...][:, None, :])
    xh_ref[...] = h
    xl_ref[...] = l
    for s in reversed(range(0, n, p)):  # backward
        e = min(s + p, n)
        if e < n:
            for t in range(r):
                ph, pe = dd_mul(
                    lh_ref[e:, s:e, :], ll_ref[e:, s:e, :],
                    xh_ref[e:, t, :][:, None, :],
                    xl_ref[e:, t, :][:, None, :],
                )
                sh, sl = dd_sum_axis0(ph, pe)  # (p, lanes)
                h, l = dd_sub(xh_ref[s:e, t, :], xl_ref[s:e, t, :], sh, sl)
                xh_ref[s:e, t, :] = h
                xl_ref[s:e, t, :] = l
        for j in range(e - 2, s - 1, -1):
            ph, pe = dd_mul(
                lh_ref[j + 1 : e, j, :][:, None, :],
                ll_ref[j + 1 : e, j, :][:, None, :],
                xh_ref[j + 1 : e, :, :], xl_ref[j + 1 : e, :, :],
            )
            sh, sl = dd_sum_axis0(ph, pe)
            h, l = dd_sub(xh_ref[j, :, :], xl_ref[j, :, :], sh, sl)
            xh_ref[j, :, :] = h
            xl_ref[j, :, :] = l


def _solve_kernel_r_looped(n, lh_ref, ll_ref, dh_ref, dl_ref, bh_ref,
                           bl_ref, xh_ref, xl_ref):
    """fori_loop multi-RHS substitutions (constant IR in n), unrolled
    over the (small, static) RHS axis with the proven 2-D op patterns.

    NB: do NOT vectorize the RHS axis into 3-D broadcast dd ops here —
    XLA:CPU's compilation of broadcast operands inside fori_loop bodies
    rewrites the error-free transforms and silently degrades dd to f32
    accuracy (observed 1e-5 residuals in interpret mode; concrete
    same-shape operands and the unrolled kernels are unaffected).  The
    per-RHS chains below trade the latency amortization for exactness;
    this variant only serves UNROLL_MAX < N <= 128."""
    r = bh_ref.shape[1]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    for t in range(r):
        xh0 = bh_ref[:, t, :]
        xl0 = bl_ref[:, t, :]

        def fwd(j, c):
            xh, xl = c
            colh = lh_ref[:, pl.ds(j, 1), :][:, 0, :]
            coll = ll_ref[:, pl.ds(j, 1), :][:, 0, :]
            gt = (row_iota > j).astype(colh.dtype)  # (n, 1)
            xjh = jax.lax.dynamic_slice_in_dim(xh, j, 1, 0)[0]
            xjl = jax.lax.dynamic_slice_in_dim(xl, j, 1, 0)[0]
            ph, pe = dd_mul(colh * gt, coll * gt,
                            xjh[None, :], xjl[None, :])
            return dd_sub(xh, xl, ph, pe)

        xh, xl = jax.lax.fori_loop(0, n, fwd, (xh0, xl0))
        xh, xl = dd_mul(xh, xl, dh_ref[...], dl_ref[...])

        def bwd(jj, c):
            xh, xl = c
            j = n - 1 - jj
            colh = lh_ref[:, pl.ds(j, 1), :][:, 0, :]
            coll = ll_ref[:, pl.ds(j, 1), :][:, 0, :]
            gt = (row_iota > j).astype(colh.dtype)
            ph, pe = dd_mul(colh * gt, coll * gt, xh, xl)
            sh, sl = dd_sum_axis0(ph, pe)
            xjh = jax.lax.dynamic_slice_in_dim(xh, j, 1, 0)[0]
            xjl = jax.lax.dynamic_slice_in_dim(xl, j, 1, 0)[0]
            h, l = dd_sub(xjh, xjl, sh, sl)
            xh = jax.lax.dynamic_update_slice_in_dim(xh, h[None], j, 0)
            xl = jax.lax.dynamic_update_slice_in_dim(xl, l[None], j, 0)
            return xh, xl

        xh, xl = jax.lax.fori_loop(0, n, bwd, (xh, xl))
        xh_ref[:, t, :] = xh
        xl_ref[:, t, :] = xl


def _refine_kernel_r(n, r, npass, solve_body, kh_ref, kl_ref, lh_ref,
                     ll_ref, dh_ref, dl_ref, bh_ref, bl_ref, xh_ref,
                     xl_ref, rh_ref, rl_ref, dxh_s, dxl_s):
    """Multi-RHS fused refined solve (see _refine_kernel).  b/x/r are
    (n, r, lanes); acceptance gating is per (rhs, lane).  The residual
    matvec runs per-RHS (unrolled over r) so temporaries stay
    (n, n, lanes)-sized in VMEM."""
    solve_body(n, lh_ref, ll_ref, dh_ref, dl_ref, bh_ref, bl_ref,
               xh_ref, xl_ref)

    def resid(xh, xl):
        hs, ls = [], []
        for t in range(r):
            # symmetric-K outer-axis contraction (see _residual_kernel)
            ph, pe = dd_mul(kh_ref[...], kl_ref[...],
                            xh[:, t, :][:, None, :], xl[:, t, :][:, None, :])
            sh, sl = dd_sum_axis0(ph, pe)
            h, l = dd_sub(bh_ref[:, t, :], bl_ref[:, t, :], sh, sl)
            hs.append(h)
            ls.append(l)
        return jnp.stack(hs, axis=1), jnp.stack(ls, axis=1)

    eh, el = resid(xh_ref[...], xl_ref[...])
    rh_ref[...] = eh
    rl_ref[...] = el
    ne = jnp.max(jnp.abs(eh), axis=0)  # (r, lanes) inf norms
    for _ in range(npass):
        solve_body(n, lh_ref, ll_ref, dh_ref, dl_ref, rh_ref, rl_ref,
                   dxh_s, dxl_s)
        xnh, xnl = dd_add(xh_ref[...], xl_ref[...], dxh_s[...], dxl_s[...])
        enh, enl = resid(xnh, xnl)
        nen = jnp.max(jnp.abs(enh), axis=0)
        acc = nen < ne
        accm = acc[None, :, :]
        xh_ref[...] = jnp.where(accm, xnh, xh_ref[...])
        xl_ref[...] = jnp.where(accm, xnl, xl_ref[...])
        rh_ref[...] = jnp.where(accm, enh, rh_ref[...])
        rl_ref[...] = jnp.where(accm, enl, rl_ref[...])
        ne = jnp.where(acc, nen, ne)


# ---------------------------------------------------------------------
# host-facing wrappers (lane-major (N, N, B) / (N, B) operands)
#
# NB: deliberately NOT wrapped in jax.jit — these are building blocks
# called inside already-jitted programs, and a nested jit here breaks
# MLIR lowering when the same wrapper is traced at different lane
# counts within one program (custom_vmap reference trace at lanes=1 vs
# the batched trace; the lowered callee gets deduplicated by name with
# mismatched shapes).  Standalone users jit at the call site.
# ---------------------------------------------------------------------

def _lanes_for(n: int) -> int:
    """Lane (batch-tile) width by matrix size: the (n, n, lanes) hi/lo
    fronts plus live temporaries must fit scoped VMEM."""
    if n <= 128:
        return LANES
    if n <= 192:
        return 64
    return 32


def _pad_lanes(x, bc=LANES):
    b = x.shape[-1]
    pad = (-b) % bc
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1
        )
    return x


def split_f64(x64):
    """f64 array -> (hi, lo) f32 pair with hi + lo == fl64(x) to ~2^-48."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def join_f64(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def _factor_impl(Kh, Kl, reg, interpret, block=0, ps=0, psc=0):
    N = Kh.shape[0]
    lanes = _lanes_for(N)
    Khp = _pad_lanes(Kh, lanes)
    Klp = _pad_lanes(Kl, lanes)
    regp = _pad_lanes(reg, lanes)
    Bp = Khp.shape[-1]
    b0 = Kh.shape[-1]
    mat = pl.BlockSpec((N, N, lanes), lambda i: (0, 0, i))
    vec = pl.BlockSpec((N, lanes), lambda i: (0, i))
    kern = _factor_body_for(N, block, ps, psc)
    Lh, Ll, Dh, Dl = pl.pallas_call(
        functools.partial(kern, N),
        grid=(Bp // lanes,),
        in_specs=[mat, mat, vec],
        out_specs=[mat, mat, vec, vec],
        out_shape=[
            jax.ShapeDtypeStruct((N, N, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, N, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, Bp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _CP,
    )(Khp, Klp, regp)
    return Lh[..., :b0], Ll[..., :b0], Dh[..., :b0], Dl[..., :b0]


def _solve_impl(Lh, Ll, Dh, Dl, bh, bl, interpret, block=0):
    N = Lh.shape[0]
    lanes = _lanes_for(N)
    b0 = bh.shape[-1]
    args = [_pad_lanes(a, lanes) for a in (Lh, Ll, Dh, Dl, bh, bl)]
    Bp = args[0].shape[-1]
    mat = pl.BlockSpec((N, N, lanes), lambda i: (0, 0, i))
    vec = pl.BlockSpec((N, lanes), lambda i: (0, i))
    kern = _solve_body_for(N, block)
    xh, xl = pl.pallas_call(
        functools.partial(kern, N),
        grid=(Bp // lanes,),
        in_specs=[mat, mat, vec, vec, vec, vec],
        out_specs=[vec, vec],
        out_shape=[
            jax.ShapeDtypeStruct((N, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, Bp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _CP,
    )(*args)
    return xh[..., :b0], xl[..., :b0]


def _residual_impl(Kh, Kl, xh, xl, bh, bl, interpret, psc=0):
    N = Kh.shape[0]
    lanes = _lanes_for(N)
    b0 = bh.shape[-1]
    args = [_pad_lanes(a, lanes) for a in (Kh, Kl, xh, xl, bh, bl)]
    Bp = args[0].shape[-1]
    mat = pl.BlockSpec((N, N, lanes), lambda i: (0, 0, i))
    vec = pl.BlockSpec((N, lanes), lambda i: (0, i))
    kern = (functools.partial(_residual_kernel_c, N, psc) if psc > 0
            else functools.partial(_residual_kernel, N))
    rh, rl = pl.pallas_call(
        kern,
        grid=(Bp // lanes,),
        in_specs=[mat, mat, vec, vec, vec, vec],
        out_specs=[vec, vec],
        out_shape=[
            jax.ShapeDtypeStruct((N, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, Bp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _CP,
    )(*args)
    return rh[..., :b0], rl[..., :b0]


def _refine_impl(Kh, Kl, Lh, Ll, Dh, Dl, bh, bl, npass, interpret,
                 block=0, psc=0):
    N = Kh.shape[0]
    lanes = _lanes_for(N)
    b0 = bh.shape[-1]
    args = [_pad_lanes(a, lanes)
            for a in (Kh, Kl, Lh, Ll, Dh, Dl, bh, bl)]
    Bp = args[0].shape[-1]
    mat = pl.BlockSpec((N, N, lanes), lambda i: (0, 0, i))
    vec = pl.BlockSpec((N, lanes), lambda i: (0, i))
    solve_body = _solve_body_for(N, block)
    kern = (functools.partial(_refine_kernel_c, N, psc, npass, solve_body)
            if psc > 0
            else functools.partial(_refine_kernel, N, npass, solve_body))
    xh, xl, rh, rl = pl.pallas_call(
        kern,
        grid=(Bp // lanes,),
        in_specs=[mat, mat, mat, mat, vec, vec, vec, vec],
        out_specs=[vec, vec, vec, vec],
        out_shape=[
            jax.ShapeDtypeStruct((N, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, Bp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, lanes), jnp.float32),
            pltpu.VMEM((N, lanes), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _CP,
    )(*args)
    return (xh[..., :b0], xl[..., :b0], rh[..., :b0], rl[..., :b0])


def _solve_impl_r(Lh, Ll, Dh, Dl, bh, bl, interpret, block=0):
    N, r = bh.shape[0], bh.shape[1]
    lanes = _lanes_for(N)
    b0 = bh.shape[-1]
    args = [_pad_lanes(a, lanes) for a in (Lh, Ll, Dh, Dl, bh, bl)]
    Bp = args[0].shape[-1]
    mat = pl.BlockSpec((N, N, lanes), lambda i: (0, 0, i))
    vec = pl.BlockSpec((N, lanes), lambda i: (0, i))
    rvec = pl.BlockSpec((N, r, lanes), lambda i: (0, 0, i))
    kern = _solve_body_r_for(N, block)
    xh, xl = pl.pallas_call(
        functools.partial(kern, N),
        grid=(Bp // lanes,),
        in_specs=[mat, mat, vec, vec, rvec, rvec],
        out_specs=[rvec, rvec],
        out_shape=[
            jax.ShapeDtypeStruct((N, r, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, r, Bp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _CP,
    )(*args)
    return xh[..., :b0], xl[..., :b0]


def _refine_impl_r(Kh, Kl, Lh, Ll, Dh, Dl, bh, bl, npass, interpret,
                   block=0):
    N, r = bh.shape[0], bh.shape[1]
    lanes = _lanes_for(N)
    b0 = bh.shape[-1]
    args = [_pad_lanes(a, lanes)
            for a in (Kh, Kl, Lh, Ll, Dh, Dl, bh, bl)]
    Bp = args[0].shape[-1]
    mat = pl.BlockSpec((N, N, lanes), lambda i: (0, 0, i))
    vec = pl.BlockSpec((N, lanes), lambda i: (0, i))
    rvec = pl.BlockSpec((N, r, lanes), lambda i: (0, 0, i))
    solve_body = _solve_body_r_for(N, block)
    xh, xl, rh, rl = pl.pallas_call(
        functools.partial(_refine_kernel_r, N, r, npass, solve_body),
        grid=(Bp // lanes,),
        in_specs=[mat, mat, mat, mat, vec, vec, rvec, rvec],
        out_specs=[rvec, rvec, rvec, rvec],
        out_shape=[
            jax.ShapeDtypeStruct((N, r, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, r, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, r, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, r, Bp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, r, lanes), jnp.float32),
            pltpu.VMEM((N, r, lanes), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _CP,
    )(*args)
    return (xh[..., :b0], xl[..., :b0], rh[..., :b0], rl[..., :b0])


# ---------------------------------------------------------------------
# trace deduplication
#
# Tracing one unrolled dd kernel costs seconds of pure-Python host time
# (the factor body is ~N^2/2 column steps of multi-primitive dd ops),
# and one IPM program instantiates the same impl at identical shapes
# many times over — custom_vmap reference + batched rules, while_loop
# batching fixed-point retraces: measured 31 instantiations / ~230 s of
# tracing for the B=256 bench program.  Routing each impl through a
# memoized jax.jit wrapper lets pjit's trace cache collapse repeated
# same-(function, avals) calls to a single kernel trace.
#
# The wrapper's __name__ encodes the full operand signature: a PLAIN
# nested jax.jit here is known-broken — two traces of one same-named
# wrapper at different lane counts in one program get deduplicated by
# callee name during MLIR lowering and fail verification.  Unique
# per-signature names keep every specialization a distinct callee.
# ---------------------------------------------------------------------

_JIT_IMPL_CACHE = {}


def _cached_impl(impl, statics, *arrays):
    # weak_type joins shape/dtype in the key (and the callee name):
    # same-shape calls whose abstract values differ in weak_type would
    # otherwise share one cached wrapper yet lower to different bodies,
    # resurfacing the MLIR callee-name-dedup verification failure this
    # cache exists to avoid.  Operands here are always committed device
    # arrays (no shardings in play inside the kernels' wrappers).
    sig = tuple(
        (tuple(a.shape), str(a.dtype), bool(getattr(a, "weak_type", False)))
        for a in arrays
    )
    # UNROLL_MAX joins the key: the kernel-body choice inside the impl
    # reads it at trace time, so a cached wrapper traced under a
    # different value would silently serve the wrong kernel (the
    # looped-vs-unrolled test monkeypatches it)
    key = (impl.__name__, statics, sig, UNROLL_MAX, DD_SOLVE_PS)
    fn = _JIT_IMPL_CACHE.get(key)
    if fn is None:
        def f(*xs):
            return impl(*xs, *statics)

        shapes = "_".join(
            "x".join(map(str, s)) + ("w" if wk else "") for s, _, wk in sig
        )
        stat = "_".join(str(int(v)) for v in statics)
        f.__name__ = (f"{impl.__name__.lstrip('_')}_{shapes}_s{stat}"
                      f"_u{UNROLL_MAX}_sp{int(DD_SOLVE_PS)}")
        fn = jax.jit(f)
        _JIT_IMPL_CACHE[key] = fn
    return fn(*arrays)


def dd_ldl_factor(Kh, Kl, reg, interpret=False, block=None, ps=None,
                  psc=None):
    """Batched dd LDL^T.  Kh/Kl: (N, N, B) f32 pair of the scaled,
    permuted, UNregularized quasidefinite K; reg: (N, B) signed
    regularization diagonal added internally.  Returns (Lh, Ll, Dinvh,
    Dinvl) in the same lane-major layout (strict upper L is junk).
    block: factor panel width (None = module default DD_FACTOR_BLOCK).
    ps: pre-split rank-p kernel, p = ps (None = module default).
    psc: row-chunked pre-split kernel, chunk rows = psc (None =
    module default DD_FACTOR_PSC).  Kernel precedence: psc > ps >
    block; an EXPLICIT ps=/block= request disables the psc module
    default (callers asking for a specific variant must get that
    variant — the per-variant verification tests depend on it)."""
    blk = DD_FACTOR_BLOCK if block is None else block
    # module defaults apply only when no other variant was explicitly
    # requested: an explicit block= zeroes the ps AND psc defaults, an
    # explicit ps= zeroes the psc default (precedence psc > ps > block
    # would otherwise shadow the requested kernel)
    if ps is None:
        psv = 0 if block is not None else DD_FACTOR_PS
    else:
        psv = ps
    if psc is None:
        pscv = 0 if (ps is not None or block is not None) else DD_FACTOR_PSC
    else:
        pscv = psc
    with jax.enable_x64(False):
        return _cached_impl(_factor_impl, (interpret, blk, psv, pscv),
                            Kh, Kl, reg)


def dd_ldl_solve(Lh, Ll, Dh, Dl, bh, bl, interpret=False, block=None):
    """Solve with dd factors; b (N, B) dd pair -> x (N, B) dd pair.
    block: substitution panel width (None = module default DD_BLOCK)."""
    blk = DD_BLOCK if block is None else block
    with jax.enable_x64(False):
        return _cached_impl(_solve_impl, (interpret, blk),
                            Lh, Ll, Dh, Dl, bh, bl)


def dd_residual(Kh, Kl, xh, xl, bh, bl, interpret=False, psc=None):
    """r = b - K x (dd, K unregularized and SYMMETRIC) -> (N, B) dd
    pair.  The kernel contracts over K's leading axis (valid only for
    symmetric K; every KKT matrix here is).  psc: chunked-contraction
    variant (None = module default DD_RESID_CHUNK)."""
    pscv = DD_RESID_CHUNK if psc is None else psc
    with jax.enable_x64(False):
        return _cached_impl(_residual_impl, (interpret, pscv),
                            Kh, Kl, xh, xl, bh, bl)


def dd_ldl_solve_refine(Kh, Kl, Lh, Ll, Dh, Dl, bh, bl, npass=2,
                        interpret=False, block=None, psc=None):
    """Fused solve + `npass` refinement passes in ONE kernel launch.

    Returns (xh, xl, rh, rl) with r = b - K x the residual of the
    accepted iterate.  Equivalent to dd_ldl_solve followed by npass
    rounds of dd_residual/dd_ldl_solve/add with monotone acceptance,
    but L and K stream from HBM once instead of once per pass."""
    blk = DD_BLOCK if block is None else block
    pscv = DD_RESID_CHUNK if psc is None else psc
    with jax.enable_x64(False):
        return _cached_impl(_refine_impl, (npass, interpret, blk, pscv),
                            Kh, Kl, Lh, Ll, Dh, Dl, bh, bl)


def dd_ldl_solve_r(Lh, Ll, Dh, Dl, bh, bl, interpret=False, block=None):
    """Multi-RHS solve: b (N, r, B) dd pair -> x (N, r, B) dd pair.
    All r systems ride one substitution chain per lane tile."""
    blk = DD_BLOCK if block is None else block
    with jax.enable_x64(False):
        return _cached_impl(_solve_impl_r, (interpret, blk),
                            Lh, Ll, Dh, Dl, bh, bl)


def dd_ldl_solve_refine_r(Kh, Kl, Lh, Ll, Dh, Dl, bh, bl, npass=2,
                          interpret=False, block=None):
    """Multi-RHS fused refined solve: b (N, r, B) -> (x, r) pairs with
    per-(rhs, lane) monotone acceptance.  The IPM uses r=2 to solve the
    constant-RHS (-q, b) and affine systems of one iteration in a
    single launch (kktsystem.jl:135-215's two-solve structure; both
    right-hand sides are available as soon as the factor is)."""
    blk = DD_BLOCK if block is None else block
    with jax.enable_x64(False):
        return _cached_impl(_refine_impl_r, (npass, interpret, blk),
                            Kh, Kl, Lh, Ll, Dh, Dl, bh, bl)
