from .batch import BatchSolver, make_batch_solve_fn, device_equilibrate
from .sharded import ShardedSolver

__all__ = [
    "BatchSolver",
    "ShardedSolver",
    "make_batch_solve_fn",
    "device_equilibrate",
]
