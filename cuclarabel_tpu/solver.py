"""Host-side Solver driver: setup (symbolic/host phase) + solve (device).

API parity with the reference native interface (`src/solver.jl:75-380`):

    solver = Solver(P, q, A, b, cones, settings=..., **overrides)
    sol    = solver.solve()

Two-phase architecture mirroring jit: everything through problem
ingestion (cone collapsing, presolve, Ruiz equilibration, cone layout,
jit-function construction) is host-side setup; `solve()` launches one
fused device program (the jitted `lax.while_loop` IPM of ipm/loop.py).
"""

import dataclasses
import functools
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import presolve as presolve_mod
from .cones import api
from .cones.api import SupportedCone, cones_collapsed
from .cones.layout import build_layout
from .equilibration import ruiz_equilibrate
from .infinity import get_infinity
from .ipm.loop import make_solve_fn
from .settings import Settings
from .statuscodes import SolverStatus, status_is_infeasible, status_to_string


@dataclasses.dataclass
class DefaultSolution:
    """User-facing results (types.jl:279-311)."""

    x: np.ndarray
    z: np.ndarray
    s: np.ndarray
    status: SolverStatus
    obj_val: float
    obj_val_dual: float
    solve_time: float
    iterations: int
    r_prim: float
    r_dual: float

    def __repr__(self):
        return (
            f">>> cuclarabel_tpu - Results\n"
            f"Status: {status_to_string(self.status)}\n"
            f"Iterations: {self.iterations}\n"
            f"Objective: {self.obj_val:#.4g}\n"
            f"Solve time: {self.solve_time:.3e}s"
        )


def _to_dense(M, shape) -> np.ndarray:
    """Accept scipy.sparse or array-like, return dense f64 ndarray."""
    if M is None:
        return np.zeros(shape, dtype=np.float64)
    if hasattr(M, "toarray"):
        out = np.asarray(M.toarray(), dtype=np.float64)
    else:
        out = np.asarray(M, dtype=np.float64)
    if out.shape != shape:
        raise ValueError(f"expected shape {shape}, got {out.shape}")
    return out


@functools.lru_cache(maxsize=128)
def _cached_solve_fn(layout, settings, n, m, has_P, factor_dtype_name):
    factor_dtype = jnp.float32 if factor_dtype_name == "float32" else jnp.float64
    return make_solve_fn(layout, settings, n, m, has_P, factor_dtype)


def _resolve_factor_dtype(settings) -> str:
    if settings.kkt_factor_precision == "auto":
        return "float32" if jax.default_backend() == "tpu" else "float64"
    return settings.kkt_factor_precision


class Solver:
    """min (1/2)x'Px + q'x  s.t.  Ax + s = b, s in K."""

    def __init__(
        self,
        P,
        q,
        A,
        b,
        cones: Sequence[SupportedCone],
        settings: Optional[Settings] = None,
        **kwargs,
    ):
        if settings is None:
            settings = Settings()
        if kwargs:
            settings = settings.replace(**kwargs)
        settings.validate()
        self.settings = settings
        self.setup(P, q, A, b, cones)

    # ------------------------------------------------------------------
    def setup(self, P, q, A, b, cones: Sequence[SupportedCone]):
        q = np.asarray(q, dtype=np.float64).ravel()
        b = np.asarray(b, dtype=np.float64).ravel()
        n = q.shape[0]
        m = b.shape[0]

        # dimension checks (solver.jl:157-169)
        cones = list(cones)
        p = sum(api.nvars(c) for c in cones)
        A_shape = A.shape if A is not None else (m, n)
        if A_shape[0] != m:
            raise ValueError("A and b have incompatible dimensions")
        if p != m:
            raise ValueError("constraint dimensions inconsistent with cones")
        if A_shape[1] != n:
            raise ValueError("A and q have incompatible dimensions")

        Pd = _to_dense(P, (n, n))
        Ad = _to_dense(A, (m, n))

        # only the upper triangle of P is used; symmetrize
        # (problemdata.jl:23-26 enforces triu, Symmetric views elsewhere)
        Pd = np.triu(Pd) + np.triu(Pd, 1).T
        self._has_P = bool(np.any(Pd != 0.0))

        # cone collapsing (cone_api.jl:96-153)
        cones = cones_collapsed(cones)

        # presolve (presolver.jl)
        infbound = get_infinity()
        self.presolver = presolve_mod.try_presolve(cones, b, self.settings, infbound)
        if self.presolver is not None:
            Ad, b, cones = presolve_mod.apply_presolve(self.presolver, Ad, b, cones)
            m = b.shape[0]

        # cap b at INFINITY (problemdata.jl:58-62)
        b = np.minimum(b, infbound)

        self.layout = build_layout(tuple(cones))
        if self.layout.m != m:
            raise ValueError("cone dimensions inconsistent after presolve")

        # unscaled norms for relative termination criteria
        # (problemdata.jl:80-81, info.jl:14-16)
        normq = float(np.abs(q).max()) if n > 0 else 0.0
        normb = float(np.abs(b).max()) if m > 0 else 0.0

        # Ruiz equilibration, once at setup (solver.jl:131-136)
        Pd, Ad, qs, bs, d, e, c = ruiz_equilibrate(
            Pd, Ad, q, b, self.layout, self.settings
        )

        self.n, self.m = n, m
        self._dev = {
            "P": jnp.asarray(Pd),
            "q": jnp.asarray(qs),
            "A": jnp.asarray(Ad),
            "b": jnp.asarray(bs),
            "d": jnp.asarray(d),
            "dinv": jnp.asarray(1.0 / d),
            "e": jnp.asarray(e),
            "einv": jnp.asarray(1.0 / e),
            "cscale": jnp.asarray(c),
            "normq": jnp.asarray(normq),
            "normb": jnp.asarray(normb),
        }

        factor_dtype_name = _resolve_factor_dtype(self.settings)
        self._solve_fn = _cached_solve_fn(
            self.layout, self.settings, n, m, self._has_P, factor_dtype_name
        )
        self.solution: Optional[DefaultSolution] = None
        self.info: Optional[dict] = None
        return self

    # ------------------------------------------------------------------
    def solve(self) -> DefaultSolution:
        t0 = time.perf_counter()
        out = self._solve_fn(self._dev)
        out = jax.tree_util.tree_map(np.asarray, jax.device_get(out))
        solve_time = time.perf_counter() - t0

        status = SolverStatus(int(out["status"]))
        x = np.asarray(out["x"])
        s = np.asarray(out["s"])
        z = np.asarray(out["z"])

        # reverse presolve (solution.jl:36-42)
        if self.presolver is not None:
            s, z = presolve_mod.reverse_presolve(self.presolver, s, z)

        self.info = {k: out[k] for k in out}
        self.solution = DefaultSolution(
            x=x,
            z=z,
            s=s,
            status=status,
            obj_val=float(out["obj_val"]),
            obj_val_dual=float(out["obj_val_dual"]),
            solve_time=solve_time,
            iterations=int(out["iterations"]),
            r_prim=float(out["r_prim"]),
            r_dual=float(out["r_dual"]),
        )
        if self.settings.verbose:
            print(self.solution)
        return self.solution

    # ------------------------------------------------------------------
    def get_solution(self) -> Optional[DefaultSolution]:
        return self.solution

    def get_info(self) -> Optional[dict]:
        return self.info
