"""Sub-pixel-packed output head: layout parity vs the spatial transposed conv
and loss equivalence (losses reduce over all elements, so the packed layout
must be loss-invariant)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdilss_tpu.losses import kld_faithful, weighted_cross_entropy
from mdilss_tpu.ops import (
    conv_transpose2d,
    conv_transpose2d_packed,
    pack_subpixel_targets,
    unpack_subpixel,
)


@pytest.fixture
def head(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 2, 16, 20)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(20,)).astype(np.float32))
    return x, w, b


def test_packed_head_matches_conv_transpose(head):
    x, w, b = head
    ref = conv_transpose2d(x, w, b, stride=2, padding=0, output_padding=0)
    got = unpack_subpixel(conv_transpose2d_packed(x, w, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pack_unpack_roundtrip(rng):
    y = jnp.asarray(rng.integers(0, 20, size=(2, 16, 32)).astype(np.int32))
    packed = pack_subpixel_targets(y)
    np.testing.assert_array_equal(np.asarray(unpack_subpixel(packed)), np.asarray(y))


def test_losses_invariant_under_packing(head, rng):
    x, w, b = head
    spatial = conv_transpose2d(x, w, b, stride=2, padding=0, output_padding=0)
    packed = conv_transpose2d_packed(x, w, b)
    y = jnp.asarray(rng.integers(0, 20, size=(2, 16, 32)).astype(np.int32))
    wv = np.ones(20, np.float32)
    wv[-1] = 0.0
    ce_s = float(weighted_cross_entropy(spatial, y, wv))
    ce_p = float(weighted_cross_entropy(packed, pack_subpixel_targets(y), wv))
    assert ce_s == pytest.approx(ce_p, abs=1e-5)

    t_packed = conv_transpose2d_packed(x * 1.1 + 0.3, w, b)
    t_spatial = unpack_subpixel(t_packed)
    k_s = float(kld_faithful(spatial, t_spatial))
    k_p = float(kld_faithful(packed, t_packed))
    assert k_s == pytest.approx(k_p, abs=1e-6)


def test_packed_argmax_predictions_match(head):
    x, w, b = head
    ref = jnp.argmax(conv_transpose2d(x, w, b, stride=2, padding=0, output_padding=0), -1)
    packed = conv_transpose2d_packed(x, w, b)
    got = unpack_subpixel(jnp.argmax(packed, -1).astype(jnp.int32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_model_packed_head_consistent():
    from mdilss_tpu.models import erfnet_rap

    params, bn = erfnet_rap.init(jax.random.key(0), [7], 1)
    x = jnp.linspace(0, 1, 1 * 32 * 64 * 3).reshape(1, 32, 64, 3).astype(jnp.float32)
    spatial, _ = erfnet_rap.apply(params, bn, x, 0)
    packed, _ = erfnet_rap.apply(params, bn, x, 0, packed_head=True)
    np.testing.assert_allclose(
        np.asarray(unpack_subpixel(packed)), np.asarray(spatial), atol=1e-5
    )
