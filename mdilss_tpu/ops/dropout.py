"""Channel-wise spatial dropout (torch.nn.Dropout2d parity).

The reference applies Dropout2d with p=0.03 / 0.3 in the encoder's
non-bottleneck-1d blocks during training only (models/erfnet.py:44,59-60):
entire feature channels are zeroed per sample and survivors rescaled by
1/(1-p).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout2d(x: jax.Array, rate: float, rng: jax.Array | None, *, training: bool) -> jax.Array:
    """Drop whole channels of NHWC input with probability `rate`."""
    if not training or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=(x.shape[0], 1, 1, x.shape[3]))
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)
