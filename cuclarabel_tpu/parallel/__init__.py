from .batch import BatchSolver, make_batch_solve_fn, device_equilibrate

__all__ = ["BatchSolver", "make_batch_solve_fn", "device_equilibrate"]
