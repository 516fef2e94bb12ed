"""Device-resident dataset cache: exact equivalence with the streaming
Loader (batch content, order, drop-last/padding), and trainer integration."""
import numpy as np

import jax

from mdilss_tpu.data import Loader, SyntheticSource
from mdilss_tpu.data.device_cache import DeviceCache, cache_bytes, should_cache


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
