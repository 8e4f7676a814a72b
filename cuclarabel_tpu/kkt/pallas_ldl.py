"""Pallas TPU kernel: batched pivot-free LDL^T factorization + solves.

The hot op of the batched IPM is the per-iteration factorization of
thousands of small quasidefinite KKT matrices.  XLA's pivoted LU
serializes on the pivot search/row swaps (measured: 95 ms for
(4096, 76, 76) f32 vs 1.5 ms for a same-shape matmul on v5e), and its
pivoting is unnecessary here — statically regularized quasidefinite
matrices factor stably without pivoting (Vanderbei).

Kernel design (batch-across-lanes):
  * operands are laid out (N, N, B) with the BATCH on the minor (lane)
    axis, so every scalar operation of the classical N-step outer-
    product LDL^T becomes a (B,)-wide vector op on the VPU;
  * the kernel grid tiles the batch; each grid step holds an
    (N, N, Bc) block in VMEM (Bc = 128 lanes);
  * loops are statically unrolled over the N pivots and update the
    output ref IN PLACE (a functional chain would allocate one VMEM
    temporary per step and overflow the scoped-vmem stack);
  * already-eliminated rows/columns are never read again, so the
    rank-1 updates need no masking; the strict upper triangle of the
    returned L holds junk by construction.

The kernels are traced with x64 disabled (everything is f32; under
jax_enable_x64 the BlockSpec index-map literals become i64 and Mosaic
fails to legalize them).  `interpret=True` runs them on CPU for tests.

Role: SUPERSEDED single-float building block, kept for tests and
microbenchmarks.  The production KKT engine is the double-float
("dd") variant of these kernels in kkt/pallas_dd.py — f32-only factors
stall iterative refinement at cond(K)*eps32 ~ 1, so the dd engine has
been the TPU default ("auto" -> "pallas") since round 2.  This file
remains the minimal reference implementation of the batch-across-lanes
LDL^T layout and the microbenchmark baseline the dd kernels are
compared against.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANES = 128


def _ldl_kernel(n: int, k_ref, l_ref, dinv_ref):
    """One batch tile: in-place unrolled LDL^T of (n, n, lanes)."""
    l_ref[...] = k_ref[...]
    for j in range(n):
        dj = l_ref[j, j, :]
        dinv = 1.0 / dj
        dinv_ref[j, :] = dinv
        col = l_ref[:, j, :]  # (n, lanes); rows < j are dead junk
        lcol = col * dinv[None, :]
        l_ref[:, j, :] = lcol
        if j + 1 < n:
            # eliminate: a[:, k] -= col * lcol[k] for the remaining cols
            l_ref[:, j + 1 :, :] = (
                l_ref[:, j + 1 :, :] - col[:, None, :] * lcol[j + 1 :, :][None, :, :]
            )


def _solve_kernel(n: int, l_ref, dinv_ref, b_ref, x_ref):
    """(L + I strict) D (L + I)^T x = b, in-place substitutions."""
    x_ref[...] = b_ref[...]
    for j in range(1, n):  # forward
        x_ref[j, :] = x_ref[j, :] - jnp.sum(
            l_ref[j, :j, :] * x_ref[:j, :], axis=0
        )
    x_ref[...] = x_ref[...] * dinv_ref[...]  # diagonal
    for j in range(n - 2, -1, -1):  # backward
        x_ref[j, :] = x_ref[j, :] - jnp.sum(
            l_ref[j + 1 :, j, :] * x_ref[j + 1 :, :], axis=0
        )


def _pad_batch(x, bc):
    b = x.shape[-1]
    pad = (-b) % bc
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1
        )
    return x, b


@functools.partial(jax.jit, static_argnames=("interpret",))
def _factor_impl(K, interpret: bool):
    B, N, _ = K.shape
    KT = jnp.moveaxis(K, 0, -1)  # (N, N, B): batch on lanes
    KT, b_orig = _pad_batch(KT, LANES)
    Bp = KT.shape[-1]
    L, Dinv = pl.pallas_call(
        functools.partial(_ldl_kernel, N),
        grid=(Bp // LANES,),
        in_specs=[pl.BlockSpec((N, N, LANES), lambda i: (0, 0, i))],
        out_specs=[
            pl.BlockSpec((N, N, LANES), lambda i: (0, 0, i)),
            pl.BlockSpec((N, LANES), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, N, Bp), K.dtype),
            jax.ShapeDtypeStruct((N, Bp), K.dtype),
        ],
        interpret=interpret,
    )(KT)
    L = jnp.moveaxis(L[..., :b_orig], -1, 0)
    Dinv = jnp.moveaxis(Dinv[..., :b_orig], -1, 0)
    return L, Dinv


@functools.partial(jax.jit, static_argnames=("interpret",))
def _solve_impl(L, Dinv, b, interpret: bool):
    B, N, _ = L.shape
    LT, b_orig = _pad_batch(jnp.moveaxis(L, 0, -1), LANES)
    DT, _ = _pad_batch(jnp.moveaxis(Dinv, 0, -1), LANES)
    bT, _ = _pad_batch(jnp.moveaxis(b, 0, -1), LANES)
    Bp = LT.shape[-1]
    x = pl.pallas_call(
        functools.partial(_solve_kernel, N),
        grid=(Bp // LANES,),
        in_specs=[
            pl.BlockSpec((N, N, LANES), lambda i: (0, 0, i)),
            pl.BlockSpec((N, LANES), lambda i: (0, i)),
            pl.BlockSpec((N, LANES), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((N, LANES), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((N, Bp), L.dtype),
        interpret=interpret,
    )(LT, DT, bT)
    return jnp.moveaxis(x[..., :b_orig], -1, 0)


def ldl_factor_batched(K, interpret: bool = False):
    """Batched pivot-free LDL^T.

    K: (B, N, N) f32 quasidefinite (regularized).  Returns (L, Dinv)
    with L (B, N, N) unit-lower (strict upper part holds junk) and
    Dinv (B, N)."""
    with jax.enable_x64(False):
        return _factor_impl(K, interpret)


def ldl_solve_batched(L, Dinv, b, interpret: bool = False):
    """Solve with factors from ldl_factor_batched.  b: (B, N)."""
    with jax.enable_x64(False):
        return _solve_impl(L, Dinv, b, interpret)
