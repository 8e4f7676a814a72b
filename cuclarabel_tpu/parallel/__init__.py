from .batch import BatchSolver, make_batch_solve_fn, device_equilibrate
from .sharded import ShardedSolver
from .sparse_batch import BatchSparseSolver, device_sparse_equilibrate

__all__ = [
    "BatchSolver",
    "BatchSparseSolver",
    "ShardedSolver",
    "make_batch_solve_fn",
    "device_equilibrate",
    "device_sparse_equilibrate",
]
