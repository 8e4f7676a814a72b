"""Single-large-problem multi-chip solving: tensor-parallel KKT.

The second scale-out axis (SURVEY.md §2.9 target (d)): one problem too
large for a single chip, with its KKT operator partitioned across the
device mesh.  The inverse-based KKT backend (kkt/dense.py) makes this a
natural GSPMD workload — the per-iteration factorization is a chain of
batched matmuls (recursive block-Schur inverse + Newton-Schulz), and
every solve is one matmul, so annotating the operand shardings lets XLA
partition the contraction dimensions and insert the `all-reduce` /
`all-gather` collectives over ICI itself (the scaling-book recipe:
pick a mesh, annotate, let XLA place collectives).

Sharding layout: the constraint dimension m (rows of A, the m-length
slack/dual vectors) is sharded over the 'row' mesh axis; n-length
objects and scalars replicate.  Inside the solve, products like A @ x,
A.T @ z, Hs assembly and the KKT concatenations then partition row-wise
with psum reductions for the shared n-dimensional results.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..cones import api
from ..cones.api import cones_collapsed
from ..cones.layout import build_layout
from ..equilibration import ruiz_equilibrate
from ..infinity import get_infinity
from ..ipm.loop import make_solve_fn
from ..settings import Settings
from ..solver import DefaultSolution, _resolve_factor_dtype, _to_dense
from ..statuscodes import SolverStatus


def _pack_rows_for_mesh(cones, ndev):
    """Pad the constraint rows so m divides the ndev-way row mesh.

    The arrow backend needs no cone-block locality (diagonal rows are
    eliminated in place; dense-block and expansion structure is
    gathered into the replicated saddle), so the original row order is
    kept and inert padding rows (0*x + s = 1 -> s = 1, z = 0) are
    appended.  Returns (src_rows, new_cones): src_rows[t] = original
    row feeding new position t, or -1 for a padding row."""
    m = sum(api.nvars(c) for c in cones)
    pad = (-m) % ndev
    src_rows = np.concatenate([
        np.arange(m, dtype=np.int64),
        np.full(pad, -1, dtype=np.int64),
    ])
    new_cones = list(cones) + [api.NonnegativeConeT(1)] * pad
    return src_rows, new_cones


class ShardedSolver:
    """Solve ONE conic program with its KKT operator sharded over
    `n_devices` chips ('row' axis = the constraint dimension m).

    Same semantics as Solver (minus presolve, which is row-structural);
    useful when A / the KKT matrix do not fit (or do not saturate) one
    chip.
    """

    def __init__(
        self,
        P,
        q,
        A,
        b,
        cones: Sequence[api.SupportedCone],
        settings: Optional[Settings] = None,
        n_devices: int = 1,
        **kwargs,
    ):
        settings = settings or Settings()
        if kwargs:
            settings = settings.replace(**kwargs)
        settings = settings.replace(presolve_enable=False)
        settings.validate()
        self.settings = settings

        q = np.asarray(q, dtype=np.float64).ravel()
        b = np.asarray(b, dtype=np.float64).ravel()
        n, m = q.shape[0], b.shape[0]
        Pd = _to_dense(P, (n, n))
        Pd = np.triu(Pd) + np.triu(Pd, 1).T
        Ad = _to_dense(A, (m, n))
        self._has_P = bool(np.any(Pd != 0.0))

        cones = list(cones)
        # Repack constraint rows so every non-elementwise cone block is
        # shard-local (the arrow backend's alignment requirement) and m
        # divides the mesh: a pure row permutation plus inert padding
        # rows (0*x + s = 1 -> s = 1, z = 0).  Row order of (A, b) is
        # semantically free as long as cones follow along.
        src_rows, cones = _pack_rows_for_mesh(cones, n_devices)
        self._src_rows = src_rows  # new row -> orig row (-1 = padding)
        m_new = src_rows.shape[0]
        A_new = np.zeros((m_new, n))
        b_new = np.ones(m_new)
        real = src_rows >= 0
        A_new[real] = Ad[src_rows[real]]
        b_new[real] = b[src_rows[real]]
        Ad, b = A_new, b_new
        # cap b at INFINITY (problemdata.jl:58-62)
        b = np.minimum(b, get_infinity())
        # inverse map for returning s/z in the caller's row order
        self._dst_of_orig = np.zeros(m, dtype=np.int64)
        self._dst_of_orig[src_rows[real]] = np.nonzero(real)[0]
        self._m_orig = m
        m = m_new
        self.layout = build_layout(tuple(cones))
        if self.layout.m != m:
            raise ValueError("cone dimensions inconsistent with b")
        self.n, self.m = n, m

        normq = float(np.abs(q).max()) if n else 0.0
        normb = float(np.abs(b).max()) if m else 0.0
        Pd, Ad, qs, bs, d, e, c = ruiz_equilibrate(
            Pd, Ad, q, b, self.layout, settings
        )
        self._d, self._e, self._c = d, e, c

        devices = np.asarray(jax.devices()[:n_devices])
        mesh = Mesh(devices, axis_names=("row",))
        row = NamedSharding(mesh, PartitionSpec("row"))
        row_mat = NamedSharding(mesh, PartitionSpec("row", None))
        repl = NamedSharding(mesh, PartitionSpec())
        self._shardings = {
            "P": repl, "q": repl, "A": row_mat, "b": row,
            "d": repl, "dinv": repl, "e": row, "einv": row,
            "cscale": repl, "normq": repl, "normb": repl,
        }

        factor_dtype = (
            jnp.float32
            if _resolve_factor_dtype(settings, self.layout) == "float32"
            else jnp.float64
        )
        self._mesh = mesh
        self._factor_dtype = factor_dtype
        # Explicit block-arrow Schur partitioning (kkt/arrow.py):
        # diagonal Hs rows (NN + expanded-SOC + GenPow diagonals) are
        # eliminated per device; SOC rank-2 / GenPow rank-3 expansion
        # vectors and zero/exp/pow/small-SOC/PSD rows live in the
        # replicated reduced saddle — every cone family.  The GSPMD
        # dense-backend fallback remains as a safety net only.
        self.tp_mode = "arrow"
        try:
            base = make_solve_fn(
                self.layout, settings, n, m, self._has_P, factor_dtype,
                raw=True, mesh=mesh, mesh_axis="row",
            )
        except ValueError as exc:
            import warnings

            warnings.warn(
                f"arrow TP backend unavailable ({exc}); falling back to "
                "GSPMD-partitioned dense backend"
            )
            self.tp_mode = "gspmd"
            base = make_solve_fn(
                self.layout, settings, n, m, self._has_P, factor_dtype,
                raw=True,
            )
        self._fn = jax.jit(base, in_shardings=(self._shardings,))

        host = {
            "P": Pd, "q": qs, "A": Ad, "b": bs,
            "d": d, "dinv": 1.0 / d, "e": e, "einv": 1.0 / e,
            "cscale": np.float64(c), "normq": np.float64(normq),
            "normb": np.float64(normb),
        }
        self._dev = {
            k: jax.device_put(np.asarray(v), self._shardings[k])
            for k, v in host.items()
        }
        self.solution: Optional[DefaultSolution] = None

    def _put(self, key, value):
        self._dev[key] = jax.device_put(
            np.asarray(value), self._shardings[key]
        )

    def _pack_rows(self, M, fill):
        """Apply the mesh row permutation/padding to rows of M."""
        src = self._src_rows
        out = np.full((src.shape[0],) + M.shape[1:], fill)
        real = src >= 0
        out[real] = M[src[real]]
        return out

    def update_data(self, P=None, q=None, A=None, b=None) -> None:
        """Parametric re-solves with the stored equilibration
        re-applied (update_data!, data_updating.jl:26-158 semantics)
        and the mesh row packing preserved; the compiled sharded
        program is reused."""
        d, e, c = self._d, self._e, self._c
        if P is not None:
            Pd = _to_dense(P, (self.n, self.n))
            Pd = np.triu(Pd) + np.triu(Pd, 1).T
            if bool(np.any(Pd != 0.0)) != self._has_P:
                raise ValueError(
                    "update_data cannot change whether P is zero "
                    "(the compiled program is specialized on it)"
                )
            self._put("P", c * (d[:, None] * Pd * d[None, :]))
        if A is not None:
            Ad = self._pack_rows(
                _to_dense(A, (self._m_orig, self.n)), 0.0
            )
            self._put("A", e[:, None] * Ad * d[None, :])
        if q is not None:
            q = np.asarray(q, dtype=np.float64).ravel()
            if q.shape[0] != self.n:
                raise ValueError("q: wrong length")
            self._put("q", c * d * q)
            self._put("normq", np.float64(np.abs(q).max() if self.n else 0.0))
        if b is not None:
            b = np.asarray(b, dtype=np.float64).ravel()
            if b.shape[0] != self._m_orig:
                raise ValueError("b: wrong length")
            bp = self._pack_rows(np.minimum(b, get_infinity()), 1.0)
            self._put("b", e * bp)
            self._put("normb", np.float64(np.abs(b).max() if b.size else 0.0))

    def solve(self, warm_start=None) -> DefaultSolution:
        """warm_start=(x, s, z) in the original problem space seeds the
        iterates (see Solver.solve); symmetric-cone layouts only.  The
        s/z iterates ride the mesh row packing (padded rows start at
        the unit interior point)."""
        if warm_start is not None:
            from ..warmstart import validate_warm_start

            wx, ws, wz = validate_warm_start(
                self.layout, warm_start, self.n, self._m_orig
            )
            d, e, c = self._d, self._e, self._c
            # NB: never grow self._shardings — the cold jit holds it
            # (uncopied) as its in_shardings, and jit's snapshot
            # semantics for that dict are not contractual
            warm_shardings = dict(self._shardings)
            warm_shardings["ws_x"] = self._shardings["q"]  # replicated
            warm_shardings["ws_s"] = self._shardings["b"]  # row-sharded
            warm_shardings["ws_z"] = self._shardings["b"]
            # padding rows (0*x + s = 1): s = 1 is their solution and
            # z = 0 their optimal dual (the loop's interior floor lifts
            # it to a tiny margin) — a unit z here would dominate mu0
            # and erase the warm point's centrality
            from ..warmstart import scale_warm_start

            wsx, wss, wsz = scale_warm_start(
                wx, self._pack_rows(ws, 1.0), self._pack_rows(wz, 0.0),
                d, e, c,
            )
            for key, val in (("ws_x", wsx), ("ws_s", wss), ("ws_z", wsz)):
                self._dev[key] = jax.device_put(
                    np.asarray(val), warm_shardings[key]
                )
            if not hasattr(self, "_warm_fn"):
                base = make_solve_fn(
                    self.layout, self.settings, self.n, self.m,
                    self._has_P, self._factor_dtype, raw=True,
                    mesh=self._mesh if self.tp_mode == "arrow" else None,
                    mesh_axis="row", warm=True,
                )
                self._warm_fn = jax.jit(
                    base, in_shardings=(warm_shardings,)
                )
            out = jax.device_get(self._warm_fn(self._dev))
        else:
            for k in ("ws_x", "ws_s", "ws_z"):
                self._dev.pop(k, None)
            out = jax.device_get(self._fn(self._dev))
        sel = self._dst_of_orig
        self.solution = DefaultSolution(
            x=np.asarray(out["x"]),
            z=np.asarray(out["z"])[sel],
            s=np.asarray(out["s"])[sel],
            status=SolverStatus(int(out["status"])),
            obj_val=float(out["obj_val"]),
            obj_val_dual=float(out["obj_val_dual"]),
            solve_time=0.0,
            iterations=int(out["iterations"]),
            r_prim=float(out["r_prim"]),
            r_dual=float(out["r_dual"]),
        )
        return self.solution
