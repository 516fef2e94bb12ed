"""Fused training-block kernels (ops/pallas/nb1d_train.py) vs XLA oracles,
in interpret mode on CPU.

Depth caveat: elementwise grad comparisons are only meaningful for single
blocks — BN+relu chains are chaotically sensitive (a 1e-5 input perturbation
moves the REFERENCE path's own gradients by a larger relative L2 than the
fused path differs from it; measured in-session), so deeper stacks are
validated at the relative-L2 level, not elementwise.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdilss_tpu.models import blocks as B
from mdilss_tpu.ops import conv2d
from mdilss_tpu.ops.pallas.nb1d_train import bwd_pair, fwd_pair, make_nb1d_train


def _pair_oracle(raw, w31, b31, w13, rapw, pre, d):
    x = raw
    if pre is not None:
        a, b = pre
        x = jax.nn.relu(x * a + b)
    c = jax.nn.relu(conv2d(x, w31, b31, padding=(d, 0), dilation=(d, 1)))
    y = conv2d(c, w13, None, padding=(0, d), dilation=(1, d))
    if rapw is not None:
        y = y + x @ rapw
    return y, x


def _pair_inputs(rng, C, use_rap, use_pre):
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    return (
        mk(3, 1, C, C) * 0.2, mk(C), mk(1, 3, C, C) * 0.2,
        mk(C, C) * 0.2 if use_rap else None,
        (mk(C), mk(C)) if use_pre else None,
    )


@pytest.mark.parametrize("d", [1, 2, 4])
@pytest.mark.parametrize("use_rap,use_pre", [(False, False), (True, True)])
def test_fwd_pair_matches_oracle(rng, d, use_rap, use_pre):
    N, H, W, C = 2, 16, 32, 16
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
    w31, b31, w13, rapw, pre = _pair_inputs(rng, C, use_rap, use_pre)
    y, stats = fwd_pair(x, w31, b31, w13, rapw, pre, d=d, interpret=True)
    want, _ = _pair_oracle(x, w31, b31, w13, rapw, pre, d)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats[0]), np.asarray(want.sum((0, 1, 2))), rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(stats[1]), np.asarray((want**2).sum((0, 1, 2))), rtol=1e-5, atol=1e-2)


@pytest.mark.parametrize("d", [1, 4])
@pytest.mark.parametrize("use_rap,use_pre", [(False, False), (True, True)])
def test_bwd_pair_matches_autodiff(rng, d, use_rap, use_pre):
    N, H, W, C = 2, 16, 32, 16
    raw = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
    gy = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
    w31, b31, w13, rapw, pre = _pair_inputs(rng, C, use_rap, use_pre)
    _, u = _pair_oracle(raw, w31, b31, w13, rapw, pre, d)

    def loss_u(u_, w31_, b31_, w13_, rap_):
        c = jax.nn.relu(conv2d(u_, w31_, b31_, padding=(d, 0), dilation=(d, 1)))
        y = conv2d(c, w13_, None, padding=(0, d), dilation=(1, d))
        if rap_ is not None:
            y = y + u_ @ rap_
        return jnp.sum(y * gy)

    if use_rap:
        du_o, dw31_o, db31_o, dw13_o, drap_o = jax.grad(loss_u, argnums=(0, 1, 2, 3, 4))(u, w31, b31, w13, rapw)
    else:
        du_o, dw31_o, db31_o, dw13_o = jax.grad(loss_u, argnums=(0, 1, 2, 3))(u, w31, b31, w13, None)
        drap_o = None
    du, dw31, db31, dw13, drap = bwd_pair(raw, gy, w31, b31, w13, rapw, pre, d=d, interpret=True)
    np.testing.assert_allclose(np.asarray(du), np.asarray(du_o), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw31), np.asarray(dw31_o), atol=5e-4)
    np.testing.assert_allclose(np.asarray(db31), np.asarray(db31_o), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dw13), np.asarray(dw13_o), atol=5e-4)
    if use_rap:
        np.testing.assert_allclose(np.asarray(drap), np.asarray(drap_o), atol=5e-4)


@pytest.mark.parametrize("d,use_rap,drop", [(1, True, 0.03), (2, True, 0.3), (1, False, 0.0)])
def test_fused_block_matches_reference_block(rng, d, use_rap, drop, monkeypatch):
    """Value + grads of the full fused block (via the blocks.py wrapper) vs
    nb1d_rap_apply / nb1d_apply with training-mode BN."""
    monkeypatch.setattr(B, "_fused_train_block",
                        lambda dd, rap, interp: make_nb1d_train(d=dd, use_rap=rap, interpret=True))
    N, H, W, C = 2, 16, 32, 16
    if use_rap:
        p, s = B.nb1d_rap_init(jax.random.key(3), C, d, 2)
        task = 1
        ref_fn = lambda pp, xx, m: B.nb1d_rap_apply(
            pp, s, xx, task=task, dilated=d, dropprob=drop, training=True, drop_mask=m)
    else:
        p, s = B.nb1d_init(jax.random.key(3), C, d)
        task = None
        ref_fn = lambda pp, xx, m: B.nb1d_apply(
            pp, s, xx, dilated=d, dropprob=drop, training=True, drop_mask=m)
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
    mask = jnp.asarray(rng.random((N, 1, 1, C)) < (1 - drop))
    G = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))

    out_f, s_f = B.nb1d_fused_train_apply(p, s, x, task=task, dilated=d, dropprob=drop, drop_mask=mask)
    out_o, s_o = ref_fn(p, x, mask)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_o), atol=1e-4)
    for a, b in zip(jax.tree.leaves(s_f), jax.tree.leaves(s_o)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def lf(pp, xx):
        return jnp.sum(B.nb1d_fused_train_apply(pp, s, xx, task=task, dilated=d,
                                                dropprob=drop, drop_mask=mask)[0] * G)

    def lo(pp, xx):
        return jnp.sum(ref_fn(pp, xx, mask)[0] * G)

    gf = jax.grad(lf, argnums=(0, 1))(p, x)
    go = jax.grad(lo, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
