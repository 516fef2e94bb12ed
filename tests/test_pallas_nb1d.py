"""Fused nb1d Pallas kernel vs the unfused reference path (eval mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdilss_tpu.models import blocks as B
from mdilss_tpu.ops.pallas.nb1d import nb1d_fused_infer


@pytest.mark.parametrize("dilated", [1, 2, 16])
def test_fused_plain_matches_unfused(rng, dilated):
    c = 128
    params, state = B.nb1d_init(jax.random.key(0), c, dilated)
    x = jnp.asarray(rng.standard_normal((2, 64, 128, c), dtype=np.float32))
    ref, _ = B.nb1d_apply(params, state, x, dilated=dilated, dropprob=0.0, training=False)
    got = nb1d_fused_infer(x, params, state["bn1"], state["bn2"], dilated=dilated, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("task", [0, 1])
def test_fused_rap_matches_unfused(rng, task):
    c = 128
    params, state = B.nb1d_rap_init(jax.random.key(1), c, 2, nb_tasks=2)
    x = jnp.asarray(rng.standard_normal((1, 32, 128, c), dtype=np.float32))
    ref, _ = B.nb1d_rap_apply(
        params, state, x, task=task, dilated=2, dropprob=0.0, training=False
    )
    got = nb1d_fused_infer(
        x, params, state["bns1"], state["bns2"], dilated=2, task=task, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)
