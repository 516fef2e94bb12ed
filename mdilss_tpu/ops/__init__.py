from .conv import conv2d, conv_transpose2d, maxpool2d
from .norm import batch_norm_apply, bn_init, BNState
from .dropout import dropout2d

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "maxpool2d",
    "batch_norm_apply",
    "bn_init",
    "BNState",
    "dropout2d",
]
