"""Block-arrow Schur-complement KKT backend: tensor-parallel by
construction (SURVEY.md §2.9(d)).

The reduced KKT system

    [ P   A' ] [x]   [rx]
    [ A  -Hs ] [z] = [rz]

is solved by eliminating the z-block:  z = H^{-1}(A x - rz) with
H = Hs + eps*I, and

    S x = rx + A' H^{-1} rz,     S = P + eps*I + A' H^{-1} A.

Under a 'row' mesh axis sharding the constraint dimension m, each
device owns a row slab A_d (m_d, n) and the matching diagonal slab of
Hs, so the O(m^3)-ish work — inverting H_d and forming A_d' H_d^{-1}
A_d — partitions across devices, combined with one psum into the
replicated (n, n) Schur complement.  This is explicit `shard_map`
partitioning, not GSPMD inference: the factor provably shards (the
returned H^{-1} carries a PartitionSpec('row', None) sharding;
tests/test_arrow_kkt.py asserts it).

Alignment requirement: every non-diagonal cone block (SOC/PSD/exp/pow/
genpow ranges — the same ranges equilibration rectifies) must lie
within a single shard so its Hs block is local; `make_arrow_kkt`
validates this at build time.

Numerics: zero-cone (equality) rows have Hs = 0; eliminating them
through H^{-1} = (eps*I)^{-1} would put a 1/eps * A_eq' A_eq term into
the Schur complement, whose dominant near-singular block defeats any
fixed-order (pivot-free) elimination (measured: residual O(1) at
cond ~ 1e9).  They are therefore kept explicit: only inequality rows
are eliminated per-device, and the replicated reduced system

    [ S1    A_eq' ] [x]   S1 = P + eps*I + A_in' H_in^{-1} A_in
    [ A_eq  -eps*I] [y]

is quasidefinite with the SPD block leading — exactly the stability
ordering the dense backend uses — so its pivot-free inverse is
well-behaved.  Residual refinement against the full distributed KKT
operator then restores full accuracy (the reference's static-reg +
refinement architecture, kktsolver_directldl.jl:247-310, 389-449).
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .dense import pivotfree_inv


def _inf_norm(v):
    return jnp.max(jnp.abs(v))


def make_arrow_kkt(n: int, m: int, settings, layout, mesh: Mesh,
                   axis: str = "row"):
    """(factorize, solve) with the dense-backend interface, partitioned
    over `mesh` along `axis` (which shards the m constraint rows)."""
    ndev = mesh.shape[axis]
    if m % ndev != 0:
        raise ValueError(f"m={m} must divide the {ndev}-device mesh")
    m_loc = m // ndev

    for lo, hi in layout.rectification_ranges():
        if lo // m_loc != (hi - 1) // m_loc:
            raise ValueError(
                f"cone block [{lo},{hi}) straddles a shard boundary "
                f"(shard size {m_loc}); pad or reorder cones so each "
                "SOC/PSD/exp/pow block is device-local"
            )

    eps_const = settings.static_regularization_constant
    eps_prop = settings.static_regularization_proportional
    reg_enable = settings.static_regularization_enable
    ir_enable = settings.iterative_refinement_enable
    ir_reltol = settings.iterative_refinement_reltol
    ir_abstol = settings.iterative_refinement_abstol
    ir_maxiter = settings.iterative_refinement_max_iter
    ir_stopratio = settings.iterative_refinement_stop_ratio

    smap = partial(shard_map, mesh=mesh)
    rowmat = P(axis, None)
    rowvec = P(axis)
    repl = P()

    # equality (zero-cone) rows stay explicit in the reduced system
    eq_mask_np = np.asarray(layout.zero_mask, dtype=bool)
    eq_idx_np = np.nonzero(eq_mask_np)[0]
    meq = int(eq_idx_np.shape[0])
    in_mask_np = (~eq_mask_np).astype(np.float64)
    # position of each eq row's dual in the reduced system's y block
    eq_pos_np = np.zeros(m, dtype=np.int64)
    eq_pos_np[eq_idx_np] = np.arange(meq)

    def factorize(Pm, A, Hs):
        """Pm (n,n) replicated, A (m,n) row-sharded, Hs (m,m) row-sharded."""
        if reg_enable:
            dmax = jnp.maximum(
                _inf_norm(jnp.diagonal(Pm)), _inf_norm(jnp.diagonal(Hs))
            )
            eps = eps_const + eps_prop * dmax
        else:
            # the z-block elimination needs H invertible
            eps = jnp.asarray(eps_const)

        in_mask = jnp.asarray(in_mask_np)

        def local(Pm, A_d, Hs_rows, inm_d, eps):
            i = jax.lax.axis_index(axis).astype(jnp.int32)
            Hd = jax.lax.dynamic_slice(
                Hs_rows, (jnp.int32(0), i * jnp.int32(m_loc)),
                (m_loc, m_loc),
            )
            # neutralize equality rows: unit diagonal + zeroed A rows so
            # they contribute nothing to the inequality Schur term
            Hd = (
                Hd * inm_d[:, None] * inm_d[None, :]
                + jnp.diag(1.0 - inm_d)
            )
            A_in_d = A_d * inm_d[:, None]
            Hreg = Hd + eps * jnp.eye(m_loc)
            Hinv_d = pivotfree_inv(Hreg)  # SPD slab: stable pivot-free
            Spart = A_in_d.T @ (Hinv_d @ A_in_d)
            S1 = Pm + eps * jnp.eye(n) + jax.lax.psum(Spart, axis)
            return Hinv_d, S1

        Hinv, S1 = smap(
            local,
            in_specs=(repl, rowmat, rowmat, rowvec, repl),
            out_specs=(rowmat, repl),
        )(Pm, A, Hs, in_mask, eps)

        if meq:
            Aeq = A[jnp.asarray(eq_idx_np)]  # (meq, n), replicated gather
            top = jnp.concatenate([S1, Aeq.T], axis=1)
            bot = jnp.concatenate(
                [Aeq, -eps * jnp.eye(meq)], axis=1
            )
            Ks = jnp.concatenate([top, bot], axis=0)
        else:
            Ks = S1
        # SPD block leads -> stable pivot-free elimination
        Kinv = pivotfree_inv(Ks)
        ok = jnp.all(jnp.isfinite(Kinv)) & jnp.all(jnp.isfinite(Hinv))
        return {"Hinv": Hinv, "Kinv": Kinv, "A": A, "Hs": Hs}, ok

    def _raw_solve(fac, rx, rz):
        in_mask = jnp.asarray(in_mask_np)

        def local_fwd(Hinv_d, A_d, inm_d, rz_d):
            w_d = Hinv_d @ (rz_d * inm_d)
            return jax.lax.psum((A_d * inm_d[:, None]).T @ w_d, axis)

        atw = smap(
            local_fwd,
            in_specs=(rowmat, rowmat, rowvec, rowvec),
            out_specs=repl,
        )(fac["Hinv"], fac["A"], in_mask, rz)

        if meq:
            rhs = jnp.concatenate([rx + atw, rz[jnp.asarray(eq_idx_np)]])
            sol = fac["Kinv"] @ rhs
            x, y = sol[:n], sol[n:]
        else:
            x = fac["Kinv"] @ (rx + atw)
            y = jnp.zeros(0)

        # scatter eq duals back into the z vector positions
        y_full = (
            jnp.pad(y, (0, 1))[jnp.asarray(eq_pos_np)]
            if meq
            else jnp.zeros(m)
        )

        def local_bwd(Hinv_d, A_d, inm_d, rz_d, yf_d, x):
            z_in = Hinv_d @ ((A_d * inm_d[:, None]) @ x - rz_d * inm_d)
            return z_in * inm_d + yf_d * (1.0 - inm_d)

        z = smap(
            local_bwd,
            in_specs=(rowmat, rowmat, rowvec, rowvec, rowvec, repl),
            out_specs=rowvec,
        )(fac["Hinv"], fac["A"], in_mask, rz, y_full, x)
        return x, z

    def _kkt_matvec(fac, x, z):
        """Distributed [P A'; A -Hs] @ [x; z] (unregularized)."""
        def local(Pm, A_d, Hs_rows, x, z_d, z_full):
            i = jax.lax.axis_index(axis).astype(jnp.int32)
            Hd = jax.lax.dynamic_slice(
                Hs_rows, (jnp.int32(0), i * jnp.int32(m_loc)),
                (m_loc, m_loc),
            )
            top = Pm @ x + jax.lax.psum(A_d.T @ z_d, axis)
            bot_d = A_d @ x - Hd @ z_d
            return top, bot_d

        # z_full unused; kept for symmetry/clarity of specs
        top, bot = smap(
            lambda Pm, A_d, Hs_rows, x, z_d: local(
                Pm, A_d, Hs_rows, x, z_d, None
            ),
            in_specs=(repl, rowmat, rowmat, repl, rowvec),
            out_specs=(repl, rowvec),
        )(fac["P"], fac["A"], fac["Hs"], x, z)
        return top, bot

    def solve(fac, rx, rz) -> Tuple[jnp.ndarray, ...]:
        x, z = _raw_solve(fac, rx, rz)
        if not ir_enable:
            ok = jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(z))
            return x, z, ok, jnp.asarray(0)

        normb = jnp.maximum(_inf_norm(rx), _inf_norm(rz))
        tol = ir_abstol + ir_reltol * normb

        def residual(x, z):
            tx, tz = _kkt_matvec(fac, x, z)
            return rx - tx, rz - tz

        ex0, ez0 = residual(x, z)
        norme0 = jnp.maximum(_inf_norm(ex0), _inf_norm(ez0))
        ok0 = jnp.isfinite(norme0)

        def cond(c):
            _, _, _, _, norme, i, stop, ok = c
            return (~stop) & ok & (i < ir_maxiter) & (norme > tol)

        def body(c):
            x, z, ex, ez, norme, i, _, _ = c
            dx, dz = _raw_solve(fac, ex, ez)
            xn, zn = x + dx, z + dz
            exn, ezn = residual(xn, zn)
            normen = jnp.maximum(_inf_norm(exn), _inf_norm(ezn))
            okn = jnp.isfinite(normen)
            ratio = norme / jnp.where(normen > 0, normen, 1e-300)
            accept = ratio > 1.0
            keep = ratio > min(ir_stopratio, 1.2)
            pick = lambda a, b_: jnp.where(accept, a, b_)
            return (
                pick(xn, x), pick(zn, z), pick(exn, ex), pick(ezn, ez),
                pick(normen, norme), i + 1, ~keep, okn,
            )

        x, z, _, _, norme, nir, _, ok = jax.lax.while_loop(
            cond, body, (x, z, ex0, ez0, norme0, 0, False, ok0)
        )
        return x, z, ok & jnp.isfinite(norme), nir

    def factorize_with_data(Pm, A, Hs):
        fac, ok = factorize(Pm, A, Hs)
        fac["P"] = Pm
        return fac, ok

    return factorize_with_data, solve
