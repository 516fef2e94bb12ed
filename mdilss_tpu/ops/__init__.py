from .conv import (
    conv2d,
    conv_transpose2d,
    conv_transpose2d_packed,
    maxpool2d,
    pack_subpixel_targets,
    unpack_subpixel,
)
from .norm import batch_norm_apply, bn_init, BNState
from .dropout import dropout2d

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "conv_transpose2d_packed",
    "maxpool2d",
    "pack_subpixel_targets",
    "unpack_subpixel",
    "batch_norm_apply",
    "bn_init",
    "BNState",
    "dropout2d",
]
