from .dense import make_dense_kkt
