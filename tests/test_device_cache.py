"""Device-resident dataset cache: exact equivalence with the streaming
Loader (batch content, order, drop-last/padding), and trainer integration."""
import numpy as np

import jax

from mdilss_tpu.data import Loader, SyntheticSource
from mdilss_tpu.data.device_cache import (
    DeviceCache, HybridCache, cache_bytes, plan_cache, should_cache,
)


def test_cache_matches_streaming_loader_shuffled():
    src = SyntheticSource(7, n=11, height=16, width=24, seed=3)
    ld = Loader(src, batch_size=3, height=16, width=24, shuffle=True, seed=5)
    cache = DeviceCache(ld)
    for epoch in (0, 2):
        ld.set_epoch(epoch)
        stream = list(ld)
        cached = list(cache.epoch_batches(epoch))
        assert len(stream) == len(cached) == 3  # drop_last: 11 // 3
        for (si, sl, sv), (ci, cl, cv) in zip(stream, cached):
            np.testing.assert_array_equal(np.asarray(ci), si)
            np.testing.assert_array_equal(np.asarray(cl), sl)
            np.testing.assert_array_equal(cv, sv)


def test_cache_matches_streaming_loader_eval_padding():
    src = SyntheticSource(7, n=7, height=8, width=16, seed=1)
    ld = Loader(src, batch_size=4, height=8, width=16, shuffle=False)
    cache = DeviceCache(ld)
    stream = list(ld)
    cached = list(cache.epoch_batches(0, shuffle=False))
    assert len(stream) == len(cached) == 2
    for (si, sl, sv), (ci, cl, cv) in zip(stream, cached):
        np.testing.assert_array_equal(cv, sv)
        np.testing.assert_array_equal(np.asarray(ci)[sv], si[sv])
        np.testing.assert_array_equal(np.asarray(cl)[sv], sl[sv])


def test_should_cache_budget():
    src = SyntheticSource(7, n=4, height=8, width=8)
    assert should_cache(src, height=8, width=8, budget_bytes=1 << 20)
    assert cache_bytes(100, 512, 1024) == 100 * 512 * 1024 * 4


def test_plan_cache_modes():
    src = SyntheticSource(7, n=10, height=8, width=8)  # 10 rows x 256 B
    assert plan_cache(src, height=8, width=8, budget_bytes=10 * 256) == ("full", 10)
    assert plan_cache(src, height=8, width=8, budget_bytes=6 * 256, batch_size=3) == ("hybrid", 6)
    # fewer cached rows than one batch: not worth the scatter
    assert plan_cache(src, height=8, width=8, budget_bytes=2 * 256, batch_size=3) == ("stream", 0)
    assert plan_cache(src, height=8, width=8, budget_bytes=0) == ("stream", 0)


def test_hybrid_cache_matches_streaming_loader_shuffled():
    """Partial cache (rows over budget stream per epoch) must reproduce the
    streamed batch sequence exactly — mixed cached/uncached batches included."""
    src = SyntheticSource(7, n=11, height=16, width=24, seed=3)
    ld = Loader(src, batch_size=3, height=16, width=24, shuffle=True, seed=5)
    hybrid = HybridCache(ld, 5)  # 5/11 rows on device
    for epoch in (0, 2):
        ld.set_epoch(epoch)
        stream = list(ld)
        cached = list(hybrid.epoch_batches(epoch))
        assert len(stream) == len(cached) == 3
        for (si, sl, sv), (ci, cl, cv) in zip(stream, cached):
            np.testing.assert_array_equal(np.asarray(ci), si)
            np.testing.assert_array_equal(np.asarray(cl), sl)
            np.testing.assert_array_equal(cv, sv)


def test_hybrid_cache_eval_padding():
    src = SyntheticSource(7, n=7, height=8, width=16, seed=1)
    ld = Loader(src, batch_size=4, height=8, width=16, shuffle=False)
    hybrid = HybridCache(ld, 3)
    stream = list(ld)
    cached = list(hybrid.epoch_batches(0, shuffle=False))
    assert len(stream) == len(cached) == 2
    for (si, sl, sv), (ci, cl, cv) in zip(stream, cached):
        np.testing.assert_array_equal(cv, sv)
        np.testing.assert_array_equal(np.asarray(ci)[sv], si[sv])
        np.testing.assert_array_equal(np.asarray(cl)[sv], sl[sv])


def test_caches_honor_explicit_drop_last():
    """A Loader pinned to drop_last=False while shuffling (non-default) must
    keep its padded final batch through both cache flavors — the caches
    re-derive drop_last from shuffle only when the loader used the default."""
    src = SyntheticSource(7, n=7, height=8, width=16, seed=2)
    ld = Loader(src, batch_size=3, height=8, width=16, shuffle=True,
                drop_last=False, seed=9)
    stream = list(ld)
    assert len(stream) == 3  # 7 imgs / bs 3, padded final batch
    for cache in (DeviceCache(ld), HybridCache(ld, 4)):
        cached = list(cache.epoch_batches(0))
        assert len(cached) == len(stream)
        for (si, sl, sv), (ci, cl, cv) in zip(stream, cached):
            np.testing.assert_array_equal(cv, sv)
            np.testing.assert_array_equal(np.asarray(ci)[sv], si[sv])
            np.testing.assert_array_equal(np.asarray(cl)[sv], sl[sv])


def test_trainer_hybrid_equals_streaming(tmp_path, capsys):
    """An explicit byte budget that fits only part of the synthetic set must
    route through HybridCache (stdout says 'partial') and reproduce the
    streamed trajectory bit-for-bit."""
    from mdilss_tpu import config as C
    from mdilss_tpu.train.protocols import build_trainer

    # batch 3 on the 8-virtual-device test host -> gcd(3,8)=1 -> 1-device
    # mesh, which is the environment HybridCache exists for (on a multi-chip
    # mesh the full set shards instead)
    kw = dict(synthetic=True, synthetic_size=6, batch_size=3, height=32, width=64,
              num_workers=2, num_epochs=2)
    row = 32 * 64 * 4
    a = build_trainer(C.step1(savedir=str(tmp_path / "a"),
                              device_cache=str(3 * row), **kw)).fit()
    assert "partial — 3/6 rows cached" in capsys.readouterr().out
    b = build_trainer(C.step1(savedir=str(tmp_path / "b"), device_cache="off", **kw)).fit()
    assert a["train_loss"] == b["train_loss"]
    assert a["val_acc_cityscapes"] == b["val_acc_cityscapes"]


def test_trainer_cached_equals_streaming(tmp_path):
    """Same config with and without the cache produces the same trajectory."""
    from mdilss_tpu import config as C
    from mdilss_tpu.train.protocols import build_trainer

    kw = dict(synthetic=True, synthetic_size=6, batch_size=2, height=32, width=64,
              num_workers=2, num_epochs=2)
    a = build_trainer(C.step1(savedir=str(tmp_path / "a"), **kw)).fit()
    b = build_trainer(C.step1(savedir=str(tmp_path / "b"), device_cache="off", **kw)).fit()
    assert a["train_loss"] == b["train_loss"]
    assert a["val_acc_cityscapes"] == b["val_acc_cityscapes"]
