from .decomp import ChordalInfo, decomp_augment, decomp_reverse

__all__ = ["ChordalInfo", "decomp_augment", "decomp_reverse"]
