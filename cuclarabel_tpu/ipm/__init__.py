from .loop import make_solve_fn
