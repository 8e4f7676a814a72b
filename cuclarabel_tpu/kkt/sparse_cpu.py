"""Sparse CPU KKT backend: the native C++ LDL^T kernel behind the same
(factorize, solve) interface as the dense device backend.

This is the counterpart of the reference's QDLDL direct-LDL backend
(`src/kktsolvers/direct-ldl/directldl_qdldl.jl` + the registry of
`directldl_defaults.jl`): symbolic analysis once on the first call,
in-place numeric refactorization each IPM iteration, signed dynamic
regularization inside the factorization, triangular solves, and
iterative refinement against the unregularized operator — all running
host-side through ordered `io_callback`s, so the jitted IPM loop is
unchanged.  Selected with `direct_solve_method="qdldl"` (CPU only).

The callbacks are stateful (they share the cached symbolic
factorization), so they go through `jax.experimental.io_callback` with
`ordered=True` — the supported mechanism for effectful host calls that
must not be CSE'd, elided, or reordered (a deduplicated pure_callback
could silently solve against a stale factor).  The factorization's
ok-flag token is additionally threaded through the solve inputs as a
data dependency.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class _HostKKT:
    """Host-side factor state shared by the callbacks of one solver."""

    def __init__(self, n, m, settings, layout):
        self.n = n
        self.m = m
        self.N = n + m
        self.settings = settings
        self.layout = layout
        self.fac = None
        self.pattern = None  # (rows, cols) upper-tri coordinate lists
        self.K = None  # scipy CSR of the current unregularized K

    def _build_pattern(self, K):
        mask = K != 0.0
        np.fill_diagonal(mask, True)  # structural diagonal
        # the Hs block's pattern is STRUCTURAL, not the first iterate's
        # values: identity scaling makes SOC/PSD blocks spuriously
        # diagonal on the first call.  Non-elementwise cones carry dense
        # blocks (get_Hs! semantics; same ranges the equilibration
        # rectifies, coneops_defaults.jl:32-44).
        for lo, hi in self.layout.rectification_ranges():
            mask[self.n + lo : self.n + hi, self.n + lo : self.n + hi] = True
        iu, ju = np.nonzero(np.triu(mask))
        order = np.lexsort((iu, ju))  # CSC order: by column, then row
        iu, ju = iu[order], ju[order]
        Ap = np.zeros(self.N + 1, dtype=np.int64)
        np.add.at(Ap, ju + 1, 1)
        Ap = np.cumsum(Ap)
        return Ap, iu.astype(np.int64), (iu, ju)

    def factorize(self, P, A, Hs):
        import scipy.sparse as sp

        from ..native import LDLFactor

        st = self.settings
        K = np.block([[P, A.T], [A, -Hs]])
        diag = np.abs(np.diagonal(K))
        eps = (
            st.static_regularization_constant
            + st.static_regularization_proportional * (diag.max() if len(diag) else 0.0)
        )
        dsigns = np.concatenate([np.ones(self.n), -np.ones(self.m)])
        Kreg = K + np.diag(dsigns * (eps if st.static_regularization_enable else 0.0))

        if self.fac is None:
            Ap, Ai, self.pattern = self._build_pattern(Kreg)
            self.fac = LDLFactor(
                self.N, Ap, Ai, dsigns.astype(np.int64),
                reg_enable=st.dynamic_regularization_enable,
                eps=st.dynamic_regularization_eps,
                delta=st.dynamic_regularization_delta,
                # reference forwards max_threads to its multithreaded
                # LDL backends (settings.jl:108-110); here it sizes the
                # level-parallel native refactorization (0 = auto)
                max_threads=st.max_threads,
            )
        iu, ju = self.pattern
        ok = self.fac.refactor(Kreg[iu, ju])
        self.K = sp.csr_matrix(K)
        return np.uint8(1 if ok else 0)

    def solve(self, b, token):
        st = self.settings
        if self.fac is None or token == 0:
            return np.full(self.N, np.nan)
        x = self.fac.solve(b)
        if st.iterative_refinement_enable:
            tol = (
                st.iterative_refinement_abstol
                + st.iterative_refinement_reltol * np.abs(b).max()
            )
            e = b - self.K @ x
            norme = np.abs(e).max()
            for _ in range(st.iterative_refinement_max_iter):
                if not np.isfinite(norme) or norme <= tol:
                    break
                dx = self.fac.solve(e)
                xn = x + dx
                en = b - self.K @ xn
                normen = np.abs(en).max()
                if normen >= norme:
                    break
                x, e, norme = xn, en, normen
        return x


def make_sparse_cpu_kkt(n: int, m: int, settings, layout):
    """(factorize, solve) with the dense-backend interface, running the
    native sparse LDL^T host-side via ordered io_callback."""
    from jax.experimental import io_callback

    host = _HostKKT(n, m, settings, layout)
    N = n + m

    def factorize(P, A, Hs):
        token = io_callback(
            host.factorize,
            jax.ShapeDtypeStruct((), np.uint8),
            P, A, Hs,
            ordered=True,
        )
        return {"token": token}, token > 0

    def solve(fac, rx, rz) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b = jnp.concatenate([rx, rz])
        x = io_callback(
            host.solve,
            jax.ShapeDtypeStruct((N,), np.float64),
            b, fac["token"],
            ordered=True,
        )
        ok = jnp.all(jnp.isfinite(x))
        # refinement happens inside the host callback; count not surfaced
        return x[:n], x[n:], ok, jnp.asarray(0)

    return factorize, solve
