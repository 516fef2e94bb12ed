from .nb1d import nb1d_fused_infer

__all__ = ["nb1d_fused_infer"]
