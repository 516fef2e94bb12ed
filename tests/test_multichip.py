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


@pytest.mark.slow
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


@pytest.mark.slow
def test_sharded_two_phase_distill_step(setup):
    """The faithful step-3 protocol (2 optimizer steps/batch, 5 forwards)
    compiles and runs under the full data x spatial mesh."""
    mesh = make_mesh(8, spatial=2)
    s_params, s_bn = erfnet_rap.init(jax.random.key(0), [6, 6, 6], 3)
    t_params, t_bn = erfnet_rap.init(jax.random.key(1), [6, 6], 2)
    lr_tree = masks.rap_lr_tree(s_params, current_task=2, shared_lr=5e-6, ds_lr=5e-4)
    w = np.ones(6, np.float32)
    step = steps.make_two_phase_distill_step(
        erfnet_rap.apply, current_task=2, prev_tasks=(1, 0),
        class_weight=w, lr_tree=lr_tree, num_epochs=10,
    )
    sharded = jit_distill_step(step, mesh)
    ts = replicate(mesh, steps.init_train_state(s_params, s_bn))
    teacher = replicate(mesh, steps.ModelState(t_params, t_bn))
    rng = np.random.default_rng(4)
    x, y = shard_batch(
        mesh,
        rng.random((8, 32, 64, 3), np.float32),
        rng.integers(0, 6, size=(8, 32, 64)).astype(np.int32),
    )
    ts, m = sharded(ts, teacher, x, y, None, jax.random.key(5), 1)
    assert np.isfinite(float(m["loss"]))
    assert int(ts.opt.count) == 2  # two Adam steps per batch


def test_device_cache_sharded_on_mesh():
    """Mesh-backed DeviceCache: rows shard over the data axis, gathers come
    out batch-sharded, and batch contents equal the streaming loader's."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mdilss_tpu.data.device_cache import DeviceCache
    from mdilss_tpu.data.loader import Loader, SyntheticSource

    mesh = make_mesh(8, spatial=2)
    src = SyntheticSource(6, n=10, height=32, width=64)  # N % data(4) != 0 -> pads
    ld = Loader(src, batch_size=4, height=32, width=64, shuffle=True, num_threads=2)
    cache = DeviceCache(ld, mesh=mesh)
    assert cache.images.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), cache.images.ndim
    )
    ld.set_epoch(2)
    streamed = list(ld)
    cached = list(cache.epoch_batches(2))
    assert len(streamed) == len(cached)
    for (si, sl, _), (ci, cl, _) in zip(streamed, cached):
        assert ci.sharding.is_equivalent_to(
            NamedSharding(mesh, P("data", "spatial")), ci.ndim
        )
        np.testing.assert_array_equal(si, np.asarray(ci))
        np.testing.assert_array_equal(sl, np.asarray(cl))


@pytest.mark.slow
def test_trainer_epoch_with_cache_on_mesh(tmp_path):
    """Trainer end-to-end on the 8-device mesh with the device cache feeding
    the (donating) jitted step — the cache+mesh interaction in one piece."""
    from mdilss_tpu import config as C
    from mdilss_tpu.train.protocols import build_trainer

    cfg = C.step2(
        num_epochs=1, savedir=str(tmp_path / "run"), synthetic=True,
        synthetic_size=8, batch_size=8, height=32, width=64, num_workers=2,
        device_cache="auto", spatial_shards=2,
    )
    tr = build_trainer(cfg)
    assert tr.mesh.devices.size == 8  # data=4 x spatial=2
    final = tr.fit()
    assert np.isfinite(final["train_loss"])
    assert tr._cache_for(cfg.datasets[1], "train") is not None  # cache engaged


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_single():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 512, 1024, 27)


@pytest.mark.slow
def test_sharded_ablation_distill_step(setup):
    """The reconstructed ablation variants run the distill step under the
    data x spatial mesh too (sync-BN reductions over per-task slices)."""
    from mdilss_tpu.models import erfnet_ablations as A

    mesh = make_mesh(8, spatial=2)
    mod = A.model_module("bn")
    s_params, s_bn = mod.init(jax.random.key(0), [6, 6], 2)
    t_params, t_bn = mod.init(jax.random.key(1), [6], 1)
    lr_tree = masks.ablation_lr_tree(
        s_params, variant="bn", current_task=1, shared_lr=5e-6, ds_lr=5e-4
    )
    w = np.ones(6, np.float32)
    step = steps.make_distill_step(
        mod.apply, current_task=1, prev_tasks=(0,),
        class_weight=w, lr_tree=lr_tree, num_epochs=10,
    )
    sharded = jit_distill_step(step, mesh)
    ts = replicate(mesh, steps.init_train_state(s_params, s_bn))
    teacher = replicate(mesh, steps.ModelState(t_params, t_bn))
    rng = np.random.default_rng(7)
    x, y = shard_batch(
        mesh,
        rng.random((8, 32, 64, 3), np.float32),
        rng.integers(0, 6, size=(8, 32, 64)).astype(np.int32),
    )
    ts, m = sharded(ts, teacher, x, y, None, jax.random.key(3), 1)
    assert np.isfinite(float(m["loss"]))


def test_spatial_shards_must_divide_devices(tmp_path):
    """--spatial-shards that doesn't divide the visible device count must
    fail loudly at build time, not with a reshape error mid-mesh."""
    from mdilss_tpu import config as C
    from mdilss_tpu.train.protocols import build_trainer

    cfg = C.step2(
        num_epochs=1, savedir=str(tmp_path / "run"), synthetic=True,
        synthetic_size=8, batch_size=8, height=32, width=64,
        spatial_shards=3,  # 8 devices % 3 != 0
    )
    with pytest.raises(ValueError, match="spatial-shards"):
        build_trainer(cfg)
