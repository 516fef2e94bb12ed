"""Convolution / pooling primitives, NHWC layout, exact torch-semantics parity.

These wrap `lax.conv_general_dilated` with the dimension numbers that map best
onto the TPU MXU (NHWC activations, HWIO weights) while reproducing the
numerics of the reference's `nn.Conv2d` / `nn.ConvTranspose2d` / `nn.MaxPool2d`
layers (see reference models/erfnet.py:16-23,30-44,100-101,124-125) so that
converted PyTorch checkpoints produce bit-comparable logits.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO weights, NHWC outputs — the TPU-native layout.
_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int | Sequence[int] = 1,
    padding: int | Sequence[int] = 0,
    dilation: int | Sequence[int] = 1,
    precision=None,
) -> jax.Array:
    """2D convolution matching torch.nn.Conv2d(stride, padding, dilation).

    Args:
      x: [N, H, W, Cin] activations.
      w: [kH, kW, Cin, Cout] weights.
      b: optional [Cout] bias.
      padding: symmetric per-dim padding (torch-style int or (padH, padW)).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),  # params live in f32; compute in the activation dtype
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=_DIMSPEC,
        precision=precision,
        preferred_element_type=jnp.float32 if x.dtype == jnp.bfloat16 else None,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def conv_transpose2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int | Sequence[int] = 2,
    padding: int | Sequence[int] = 0,
    output_padding: int | Sequence[int] = 0,
    precision=None,
) -> jax.Array:
    """Transposed conv matching torch.nn.ConvTranspose2d numerics exactly.

    Implemented as an input-dilated (fractionally-strided) regular convolution
    with a spatially-flipped kernel — the algebraic identity of the gradient
    of conv — which XLA maps onto the MXU like any other conv:

        out = conv(dilate(x, stride), flip_hw(w)),
        pad_lo = k - 1 - padding, pad_hi = k - 1 - padding + output_padding
        => out_size = (in - 1) * stride - 2 * padding + k + output_padding

    matching the reference decoder's ConvTranspose2d(3, stride=2, padding=1,
    output_padding=1) and output_conv ConvTranspose2d(2, stride=2)
    (reference models/erfnet.py:100-101,124-125).

    Args:
      x: [N, H, W, Cin].
      w: [kH, kW, Cin, Cout] — torch's (Cin, Cout, kH, kW) transposed-conv
         weight permuted to HWIO, *unflipped* (we flip internally).
      b: optional [Cout].
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    kh, kw = w.shape[0], w.shape[1]
    w_flipped = jnp.flip(w, axis=(0, 1)).astype(x.dtype)
    out = lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=_DIMSPEC,
        precision=precision,
        preferred_element_type=jnp.float32 if x.dtype == jnp.bfloat16 else None,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def maxpool2d(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    """Max pool matching torch.nn.MaxPool2d(window, stride) (floor mode).

    Used by the reference DownsamplerBlock (models/erfnet.py:17,21).
    """
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        a, b = v
        return int(a), int(b)
    return int(v), int(v)
