"""Golden tests: ops vs torch CPU reference semantics.

These pin the exact numerics of conv2d / conv_transpose2d / maxpool2d /
batch_norm / dropout2d against the torch layers the reference model uses, so
converted checkpoints reproduce bit-comparable activations (SURVEY.md §4).
Torch here is used only as an independent oracle in tests — the framework
itself never imports it.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mdilss_tpu.ops import batch_norm_apply, conv2d, conv_transpose2d, dropout2d, maxpool2d
from mdilss_tpu.ops.norm import BNState


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _w_to_hwio(w):
    # torch conv weight OIHW -> HWIO
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def _wt_to_hwio(w):
    # torch ConvTranspose2d weight (in, out, kH, kW) -> HWIO (I=in, O=out)
    return np.transpose(w.detach().numpy(), (2, 3, 0, 1))


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dil",
    [
        (3, 13, (3, 3), 2, (1, 1), (1, 1)),   # downsampler conv
        (64, 64, (3, 1), 1, (1, 0), (1, 1)),  # 3x1 factorized
        (64, 64, (1, 3), 1, (0, 1), (1, 1)),  # 1x3 factorized
        (128, 128, (3, 1), 1, (4, 0), (4, 1)),  # dilated 3x1
        (128, 128, (1, 3), 1, (0, 16), (1, 16)),  # dilated 1x3
        (64, 64, (1, 1), 1, (0, 0), (1, 1)),  # RAP adapter 1x1
    ],
)
def test_conv2d_vs_torch(rng, cin, cout, k, stride, pad, dil):
    x = rng.standard_normal((2, 32, 48, cin), dtype=np.float32)
    tconv = torch.nn.Conv2d(cin, cout, k, stride=stride, padding=pad, dilation=dil, bias=True)
    ref = tconv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = conv2d(
        jnp.asarray(x),
        jnp.asarray(_w_to_hwio(tconv.weight)),
        jnp.asarray(tconv.bias.detach().numpy()),
        stride=stride,
        padding=pad,
        dilation=dil,
    )
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,opad",
    [
        (128, 64, 3, 2, 1, 1),  # UpsamplerBlock conv
        (64, 16, 3, 2, 1, 1),
        (16, 20, 2, 2, 0, 0),   # output_conv
        (16, 27, 2, 2, 0, 0),
    ],
)
def test_conv_transpose2d_vs_torch(rng, cin, cout, k, stride, pad, opad):
    x = rng.standard_normal((2, 16, 24, cin), dtype=np.float32)
    tconv = torch.nn.ConvTranspose2d(
        cin, cout, k, stride=stride, padding=pad, output_padding=opad, bias=True
    )
    ref = tconv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = conv_transpose2d(
        jnp.asarray(x),
        jnp.asarray(_wt_to_hwio(tconv.weight)),
        jnp.asarray(tconv.bias.detach().numpy()),
        stride=stride,
        padding=pad,
        output_padding=opad,
    )
    assert got.shape == _to_nhwc(ref).shape
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=1e-5, rtol=1e-5)


def test_maxpool2d_vs_torch(rng):
    x = rng.standard_normal((2, 32, 48, 16), dtype=np.float32)
    ref = torch.nn.MaxPool2d(2, stride=2)(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = maxpool2d(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=0, rtol=0)


@pytest.mark.parametrize("training", [False, True])
def test_batch_norm_vs_torch(rng, training):
    c = 64
    x = rng.standard_normal((4, 8, 12, c), dtype=np.float32)
    tbn = torch.nn.BatchNorm2d(c, eps=1e-3)
    # non-trivial affine + running stats
    with torch.no_grad():
        tbn.weight.copy_(torch.rand(c) + 0.5)
        tbn.bias.copy_(torch.rand(c) - 0.5)
        tbn.running_mean.copy_(torch.randn(c) * 0.1)
        tbn.running_var.copy_(torch.rand(c) + 0.5)
    state = BNState(
        mean=jnp.asarray(tbn.running_mean.numpy().copy()),
        var=jnp.asarray(tbn.running_var.numpy().copy()),
    )
    tbn.train(training)
    ref = tbn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got, new_state = batch_norm_apply(
        jnp.asarray(x),
        jnp.asarray(tbn.weight.detach().numpy()),
        jnp.asarray(tbn.bias.detach().numpy()),
        state,
        eps=1e-3,
        training=training,
    )
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=1e-5, rtol=1e-4)
    # running-stat update parity (torch mutates in-place during train())
    np.testing.assert_allclose(np.asarray(new_state.mean), tbn.running_mean.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state.var), tbn.running_var.numpy(), atol=1e-5, rtol=1e-4)


def test_dropout2d_channelwise_and_scaling():
    x = jnp.ones((8, 4, 4, 32))
    out = dropout2d(x, 0.5, jax.random.key(0), training=True)
    arr = np.asarray(out)
    # each (sample, channel) plane is either all zero or all 1/keep
    planes = arr.reshape(8, 16, 32)
    for n in range(8):
        for c in range(32):
            vals = np.unique(planes[n, :, c])
            assert len(vals) == 1 and vals[0] in (0.0, 2.0)
    # eval mode / rate 0 are identity
    np.testing.assert_array_equal(np.asarray(dropout2d(x, 0.5, None, training=False)), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(dropout2d(x, 0.0, jax.random.key(0), training=True)), np.asarray(x)
    )
