"""cuclarabel_tpu — a TPU-native interior-point conic solver.

A brand-new JAX/XLA/Pallas implementation of a primal-dual interior-point
method for conic programs of the form

    minimize    (1/2) x'Px + q'x
    subject to  Ax + s = b,  s in K

where K is a Cartesian product of zero, nonnegative, second-order,
PSD-triangle, exponential, power and generalized power cones.

Capability target: Clarabel.jl v0.11.0 (the upstream of CuClarabel),
re-designed TPU-first:
  * all numeric state lives in flat device arrays (no cone object tree);
  * cone operations are grouped, vectorized kernels per cone *type*
    (segment-reductions for heterogeneous sizes, batched linalg for PSD);
  * the entire IPM iteration runs as a single jitted `lax.while_loop`;
  * KKT systems are factorized with dense blocked kernels that map onto
    the MXU, with f32 factorization + f64 iterative refinement on TPU;
  * batches of problems solve in parallel via `vmap` and shard over a
    `jax.sharding.Mesh`.

Reference behavior citations throughout point at the Clarabel.jl tree
(e.g. `src/solver.jl:189-380`) for parity checking; the implementation
here is an independent TPU-first design, not a translation.
"""

import os as _os

import jax as _jax

# The IPM requires ~1e-8 duality-gap accuracy; f64 iterates are mandatory.
# On TPU the hot factorization path runs in f32 with f64 iterative
# refinement (see kkt/dense.py), so x64 here only affects cheap vector ops.
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: solver programs take 25-40s to compile
# through remote TPU tunnels; cached executables load in <1s across
# processes.  Only set if the user hasn't configured a cache themselves.
#
# CPU-backend caveat: XLA:CPU caches AOT-compiled machine code keyed by
# the *compiling* host's CPU features.  On machines that migrate between
# hosts (VMs/containers), loading another host's CPU executable can
# SIGSEGV (cpu_aot_loader warns "machine type ... doesn't match").  When
# the process is pinned to the CPU backend (JAX_PLATFORMS=cpu — e.g. the
# multi-chip dryrun), the cache therefore goes into a per-host-fingerprint
# subdirectory so stale foreign-host executables are never loaded.


def _host_fingerprint():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = [ln for ln in f if ln.startswith(("flags", "model name"))]
        key = "".join(sorted(set(flags))) or "unknown"
    except OSError:
        import platform

        key = platform.processor() or "unknown"
    return hashlib.sha256(key.encode()).hexdigest()[:12]


if (
    _jax.config.jax_compilation_cache_dir is None
    and "JAX_COMPILATION_CACHE_DIR" not in _os.environ
):
    _cache = _os.path.join(
        _os.path.expanduser("~"), ".cache", "cuclarabel_tpu", "jax_cache"
    )
    # jax.config wins over the env var: sitecustomize presets
    # JAX_PLATFORMS=axon, and the documented way to force CPU here is
    # jax.config.update("jax_platforms", "cpu") after import.
    _platforms = (
        _jax.config.jax_platforms or _os.environ.get("JAX_PLATFORMS") or ""
    )
    if _platforms.strip().lower() == "cpu":
        _cache = _os.path.join(_cache, "cpu-" + _host_fingerprint())
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except OSError:
        pass

from .settings import Settings
from .statuscodes import SolverStatus
from .cones.api import (
    ZeroConeT,
    NonnegativeConeT,
    SecondOrderConeT,
    ExponentialConeT,
    PowerConeT,
    GenPowerConeT,
    PSDTriangleConeT,
    SupportedCone,
)
from .solver import Solver, DefaultSolution
from .infinity import get_infinity, set_infinity, default_infinity
from .sparse_solver import SparseSolver
from .modeling import (
    Model,
    Variable,
    vstack,
    sum_entries,
    norm2,
    quad_form,
    sumsq,
)
from .precompile import precompile

__version__ = "0.1.0"


def solver_name() -> str:
    """Solver name string (reference: src/version.jl solver_name())."""
    return "cuclarabel_tpu"


def version() -> str:
    """Package version string (reference: src/version.jl version())."""
    return __version__

__all__ = [
    "Solver",
    "DefaultSolution",
    "Settings",
    "SolverStatus",
    "SupportedCone",
    "ZeroConeT",
    "NonnegativeConeT",
    "SecondOrderConeT",
    "ExponentialConeT",
    "PowerConeT",
    "GenPowerConeT",
    "PSDTriangleConeT",
    "get_infinity",
    "set_infinity",
    "default_infinity",
    "SparseSolver",
    "Model",
    "Variable",
    "vstack",
    "sum_entries",
    "norm2",
    "quad_form",
    "sumsq",
]
