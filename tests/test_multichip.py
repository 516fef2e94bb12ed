"""Multi-device tests on the 8-virtual-CPU mesh (conftest sets XLA_FLAGS).

Because BN is sync (global batch stats) and grads all-reduce, the sharded
step computes the SAME math as the single-device step — so consistency
across mesh shapes is an exact correctness check of the parallel path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdilss_tpu.data import CLASS_WEIGHTS
from mdilss_tpu.models import erfnet_rap
from mdilss_tpu.parallel import (
    jit_distill_step,
    jit_eval_step,
    jit_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from mdilss_tpu.train import masks, steps


@pytest.fixture(scope="module")
def setup():
    params, bn = erfnet_rap.init(jax.random.key(0), [6], 1)
    lr_tree = masks.rap_lr_tree(params, current_task=0, shared_lr=5e-4, ds_lr=5e-4)
    w = np.ones(6, np.float32)
    w[5] = 0
    step = steps.make_ce_step(
        erfnet_rap.apply, task=0, class_weight=w, lr_tree=lr_tree, num_epochs=10
    )
    rng = np.random.default_rng(0)
    images = rng.random((8, 32, 64, 3), np.float32)
    labels = rng.integers(0, 6, size=(8, 32, 64)).astype(np.int32)
    return params, bn, step, images, labels


def _run(mesh, params, bn, step, images, labels):
    # deep-copy: the jitted step donates the train state, and device_put to an
    # identical sharding aliases rather than copies — donation would delete
    # the shared fixture arrays
    params = jax.tree.map(jnp.array, params)
    bn = jax.tree.map(jnp.array, bn)
    ts = replicate(mesh, steps.init_train_state(params, bn))
    x, y = shard_batch(mesh, images, labels)
    sharded = jit_train_step(step, mesh)
    ts, m = sharded(ts, x, y, None, jax.random.key(1), 1)
    jax.block_until_ready(ts)
    return ts, float(m["loss"])


def test_dp_matches_single_device(setup):
    params, bn, step, images, labels = setup
    mesh1 = make_mesh(1)
    mesh8 = make_mesh(8, spatial=1)
    ts1, loss1 = _run(mesh1, params, bn, step, images, labels)
    ts8, loss8 = _run(mesh8, params, bn, step, images, labels)
    np.testing.assert_allclose(loss1, loss8, rtol=1e-5)
    # Updates identical up to cross-device reduction-order noise. Adam turns a
    # sign flip on a near-zero grad into a full +-lr step, so a tiny fraction
    # of elements may differ by up to 2*lr=1e-3; any systematic divergence
    # (wrong collective, missing sync-BN) would affect most elements.
    diffs = [
        np.abs(np.asarray(l1) - np.asarray(l8)).reshape(-1)
        for l1, l8 in zip(jax.tree.leaves(ts1.params), jax.tree.leaves(ts8.params))
    ]
    alld = np.concatenate(diffs)
    assert alld.max() <= 1.1e-3, alld.max()
    assert (alld > 2e-5).mean() <= 0.01, (alld > 2e-5).mean()  # global fraction


def test_spatial_sharding_matches(setup):
    params, bn, step, images, labels = setup
    mesh1 = make_mesh(1)
    mesh42 = make_mesh(8, spatial=2)  # data=4 x spatial=2 (halo-exchange convs)
    ts1, loss1 = _run(mesh1, params, bn, step, images, labels)
    ts42, loss42 = _run(mesh42, params, bn, step, images, labels)
    np.testing.assert_allclose(loss1, loss42, rtol=1e-5)


def test_sharded_distill_step_runs(setup):
    params, bn, *_ = setup
    mesh = make_mesh(8, spatial=2)
    s_params, s_bn = erfnet_rap.init(jax.random.key(0), [6, 6], 2)
    t_params, t_bn = erfnet_rap.init(jax.random.key(1), [6], 1)
    lr_tree = masks.rap_lr_tree(s_params, current_task=1, shared_lr=5e-6, ds_lr=5e-4)
    w = np.ones(6, np.float32)
    step = steps.make_distill_step(
        erfnet_rap.apply, current_task=1, prev_tasks=(0,),
        class_weight=w, lr_tree=lr_tree, num_epochs=10,
    )
    sharded = jit_distill_step(step, mesh)
    ts = replicate(mesh, steps.init_train_state(s_params, s_bn))
    teacher = replicate(mesh, steps.ModelState(t_params, t_bn))
    rng = np.random.default_rng(1)
    x, y = shard_batch(
        mesh,
        rng.random((8, 32, 64, 3), np.float32),
        rng.integers(0, 6, size=(8, 32, 64)).astype(np.int32),
    )
    ts, m = sharded(ts, teacher, x, y, None, jax.random.key(3), 1)
    assert np.isfinite(float(m["loss"]))


def test_sharded_eval_confusion_matrix(setup):
    params, bn, *_ = setup
    mesh = make_mesh(8, spatial=1)
    w = np.ones(6, np.float32)
    estep = steps.make_eval_step(erfnet_rap.apply, task=0, class_weight=w, num_classes=6)
    sharded = jit_eval_step(estep, mesh)
    rng = np.random.default_rng(2)
    images = rng.random((8, 32, 64, 3), np.float32)
    labels = rng.integers(0, 6, size=(8, 32, 64)).astype(np.int32)
    x, y = shard_batch(mesh, images, labels)
    p_r, bn_r = replicate(mesh, params), replicate(mesh, bn)
    loss, cm = sharded(p_r, bn_r, x, y)
    assert np.asarray(cm).sum() == labels.size  # every pixel counted once


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 512, 1024, 27)
