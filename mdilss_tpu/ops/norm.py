"""BatchNorm with torch-exact semantics (training + inference).

Reproduces torch.nn.BatchNorm2d(eps=1e-3, momentum=0.1) as used throughout the
reference (e.g. models/erfnet.py:18,34,42,102): normalization uses the *biased*
batch variance, while the running-variance EMA is updated with the *unbiased*
estimate; running stats update as `run = (1 - m) * run + m * batch`.

Sync behaviour: inside a pjit-ed step with the batch sharded over the mesh,
the `jnp.mean` reductions below are global — XLA inserts the cross-device
all-reduce — i.e. this is sync-BN. The reference's torch DataParallel computed
per-replica stats instead (see SURVEY.md §7.3); sync-BN is the cleaner
TPU-native choice and is the default. Per-device ("local") BN can be recovered
by running the step under shard_map; not needed for parity of eval numerics
(inference uses running stats either way).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BNState(NamedTuple):
    """Running statistics for one BatchNorm layer (possibly task-stacked)."""

    mean: jax.Array  # [C] or [T, C]
    var: jax.Array  # [C] or [T, C]


def bn_init(num_features: int, nb_tasks: int | None = None, dtype=jnp.float32):
    """Fresh params + state: scale=1, bias=0, mean=0, var=1 (torch defaults)."""
    shape = (num_features,) if nb_tasks is None else (nb_tasks, num_features)
    params = {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}
    state = BNState(mean=jnp.zeros(shape, dtype), var=jnp.ones(shape, dtype))
    return params, state


def batch_norm_apply(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    state: BNState,
    *,
    eps: float = 1e-3,
    momentum: float = 0.1,
    training: bool = False,
) -> tuple[jax.Array, BNState]:
    """Apply BN over NHWC input; stats reduced over (N, H, W).

    Returns (normalized output, updated running state). In eval mode the state
    is returned unchanged and running stats are used for normalization.
    """
    if training:
        xf = x.astype(jnp.float32)
        batch_mean = jnp.mean(xf, axis=(0, 1, 2))
        batch_var = jnp.mean(jnp.square(xf - batch_mean), axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = batch_var * (n / max(n - 1, 1))
        new_state = BNState(
            mean=(1.0 - momentum) * state.mean + momentum * batch_mean,
            var=(1.0 - momentum) * state.var + momentum * unbiased,
        )
        mean, var = batch_mean, batch_var
    else:
        new_state = state
        mean, var = state.mean, state.var

    # (A bf16-affine variant — per-channel inv/shift cast to x.dtype before
    # the elementwise math, halving the nominal traffic of this pass — was
    # measured at 112.3 vs 111.7 ms/step on the full distill step: the
    # layout-conversion copies the profiler attributes to these converts
    # persist regardless of dtype, so the f32 affine stays for its numerics.)
    # compute dtype: at least f32 (bf16 inputs upcast), but an f64 forward
    # (evaluate.py compute_dtype="float64", the bit-stable parity path) must
    # not round through f32 here
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    inv = jax.lax.rsqrt(var.astype(cdt) + eps) * scale.astype(cdt)
    out = x.astype(cdt) * inv + (bias.astype(cdt) - mean.astype(cdt) * inv)
    return out.astype(x.dtype), new_state
