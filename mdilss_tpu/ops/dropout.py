"""Channel-wise spatial dropout (torch.nn.Dropout2d parity).

The reference applies Dropout2d with p=0.03 / 0.3 in the encoder's
non-bottleneck-1d blocks during training only (models/erfnet.py:44,59-60):
entire feature channels are zeroed per sample and survivors rescaled by
1/(1-p).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout2d(
    x: jax.Array,
    rate: float,
    rng: jax.Array | None,
    *,
    training: bool,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Drop whole channels of NHWC input with probability `rate`.

    A precomputed `mask` [N, 1, 1, C] (bool) takes precedence over `rng`:
    generating random bits inside a differentiated/rematerialized region is
    expensive (threefry regenerates in the backward pass), so callers batch
    mask generation for all blocks into one draw (models/topology.py).
    """
    if not training or rate == 0.0 or (rng is None and mask is None):
        return x
    keep = 1.0 - rate
    if mask is None:
        mask = jax.random.bernoulli(rng, p=keep, shape=(x.shape[0], 1, 1, x.shape[3]))
    # One broadcast multiply (mask pre-scaled by 1/keep) fuses into the
    # surrounding elementwise chain. stop_gradient is LOAD-BEARING: without it
    # autodiff computes a cotangent for the mask operand of the multiply — a
    # full-tensor reduction per dropout site — and then throws it away at the
    # non-differentiable bernoulli (measured: 5x slower backward).
    scaled = jax.lax.stop_gradient(
        mask.astype(x.dtype) * jnp.asarray(1.0 / keep, x.dtype)
    )
    return x * scaled
