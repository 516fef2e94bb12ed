"""Data-pipeline tests: augmentation vs the PIL oracle, sources, loader,
class weights."""
import os

import numpy as np
import pytest
from PIL import Image, ImageOps

import jax
import jax.numpy as jnp

from mdilss_tpu.data import (
    CLASS_WEIGHTS,
    Loader,
    SyntheticSource,
    compute_class_weights,
    make_source,
)
from mdilss_tpu.data.transforms import _translate2d, augment_batch, prepare_batch


def _pil_translate(arr: np.ndarray, tx: int, ty: int, fill: int) -> np.ndarray:
    """The reference's exact translation (train_RAPFT_step1.py:66-73):
    ImageOps.expand(border=(tx, ty, 0, 0), fill) then crop back to size."""
    img = Image.fromarray(arr)
    img = ImageOps.expand(img, border=(tx, ty, 0, 0), fill=fill)
    img = img.crop((0, 0, img.size[0] - tx, img.size[1] - ty))
    return np.asarray(img)


@pytest.mark.parametrize("tx", [-2, -1, 0, 1, 2])
@pytest.mark.parametrize("ty", [-2, 0, 2])
@pytest.mark.parametrize("fill", [0, 255])
def test_translate_matches_pil_reference(rng, tx, ty, fill):
    arr = rng.integers(0, 255, size=(8, 12), dtype=np.uint8)
    ref = _pil_translate(arr, tx, ty, fill)
    got = np.asarray(_translate2d(jnp.asarray(arr), jnp.int32(tx), jnp.int32(ty), fill))
    np.testing.assert_array_equal(got, ref, err_msg=f"tx={tx} ty={ty} fill={fill}")


def test_prepare_batch_normalize_and_relabel(rng):
    imgs = rng.integers(0, 256, size=(2, 4, 6, 3), dtype=np.uint8)
    lbls = rng.integers(0, 20, size=(2, 4, 6)).astype(np.uint8)
    lbls[0, 0, 0] = 255
    x, y = prepare_batch(jnp.asarray(imgs), jnp.asarray(lbls), num_classes=20)
    np.testing.assert_allclose(np.asarray(x), imgs.astype(np.float32) / 255.0)
    assert int(y[0, 0, 0]) == 19
    assert y.dtype == jnp.int32


def test_augment_batch_shapes_and_determinism(rng):
    imgs = rng.integers(0, 256, size=(4, 16, 24, 3), dtype=np.uint8)
    lbls = rng.integers(0, 20, size=(4, 16, 24)).astype(np.uint8)
    x1, y1 = augment_batch(jnp.asarray(imgs), jnp.asarray(lbls), jax.random.key(0), num_classes=20)
    x2, y2 = augment_batch(jnp.asarray(imgs), jnp.asarray(lbls), jax.random.key(0), num_classes=20)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    x3, _ = augment_batch(jnp.asarray(imgs), jnp.asarray(lbls), jax.random.key(1), num_classes=20)
    assert not np.array_equal(np.asarray(x1), np.asarray(x3))
    assert x1.shape == (4, 16, 24, 3) and y1.shape == (4, 16, 24)


def test_augment_flip_applies_to_image_and_label_together(rng):
    # With translation bounded at +-2 px, flipped pairs stay aligned:
    # where a sample is flipped, its label must be the flipped label modulo
    # the border pixels. Use interior region to check.
    imgs = np.tile(np.arange(24, dtype=np.uint8)[None, None, :, None], (8, 16, 1, 3))
    lbls = np.tile(np.arange(24, dtype=np.uint8)[None, None, :], (8, 16, 1))
    x, y = augment_batch(jnp.asarray(imgs), jnp.asarray(lbls), jax.random.key(5), num_classes=30)
    x, y = np.asarray(x), np.asarray(y)
    interior = (slice(None), slice(4, 12), slice(4, 20))
    np.testing.assert_allclose(x[..., 0][interior] * 255.0, y[interior], atol=1e-4)


def _make_cityscapes_tree(tmp_path):
    for city in ("bremen", "aachen"):
        (tmp_path / "leftImg8bit" / "train" / city).mkdir(parents=True)
        (tmp_path / "gtFine" / "train" / city).mkdir(parents=True)
        for i in range(2):
            img = Image.fromarray(np.zeros((8, 16, 3), np.uint8))
            img.save(tmp_path / "leftImg8bit" / "train" / city / f"{city}_{i:06d}_leftImg8bit.png")
            lbl = Image.fromarray(np.zeros((8, 16), np.uint8))
            lbl.save(tmp_path / "gtFine" / "train" / city / f"{city}_{i:06d}_gtFine_labelTrainIds.png")
            # decoys that must be ignored by the suffix filter
            lbl.save(tmp_path / "gtFine" / "train" / city / f"{city}_{i:06d}_gtFine_labelIds.png")


def test_cityscapes_index_conventions(tmp_path):
    _make_cityscapes_tree(tmp_path)
    src = make_source("cityscapes", str(tmp_path), "train")
    assert len(src) == 4
    # sorted and pairwise-aligned
    for img, lbl in src.pairs:
        assert os.path.basename(img).replace("_leftImg8bit.png", "") == \
            os.path.basename(lbl).replace("_gtFine_labelTrainIds.png", "")
    assert src.pairs == sorted(src.pairs)


def test_voc12_subset_layout(tmp_path, capsys, monkeypatch):
    """VOC12: a <root>/<subset>/images|labels layout yields distinct splits;
    under the reference's flat layout (dataset.py:44-51 has no split dirs) a
    non-train subset would silently alias the training set — that is an ERROR
    unless explicitly opted into (a val metric must never silently be a train
    metric)."""
    import pytest
    from PIL import Image

    def fill(d, names):
        os.makedirs(d / "images"); os.makedirs(d / "labels")
        for n in names:
            Image.new("RGB", (4, 4)).save(d / "images" / f"{n}.jpg")
            Image.new("P", (4, 4)).save(d / "labels" / f"{n}.png")

    split = tmp_path / "split"
    fill(split / "train", ["a", "b"]); fill(split / "val", ["c"])
    tr = make_source("VOC12", str(split), "train")
    va = make_source("VOC12", str(split), "val")
    assert len(tr) == 2 and len(va) == 1
    assert not set(tr.pairs) & set(va.pairs)

    flat = tmp_path / "flat"
    fill(flat, ["x", "y"])
    # flat 'train' is the reference layout and stays fine
    assert len(make_source("VOC12", str(flat), "train")) == 2
    # flat 'val' refuses by default...
    monkeypatch.delenv("MDILSS_ALLOW_FLAT_VOC12", raising=False)
    with pytest.raises(ValueError, match="SAME image set"):
        make_source("VOC12", str(flat), "val")
    # ...and aliases (with a warning) only under the explicit opt-in
    monkeypatch.setenv("MDILSS_ALLOW_FLAT_VOC12", "1")
    va_flat = make_source("VOC12", str(flat), "val")
    assert len(va_flat) == 2
    assert "SAME image set" in capsys.readouterr().out


def test_loader_shuffle_determinism_and_padding():
    src = SyntheticSource(num_classes=20, n=10, height=8, width=16)
    ld = Loader(src, batch_size=4, height=8, width=16, shuffle=True, seed=3)
    ld.set_epoch(1)
    b1 = [im.copy() for im, _, _ in ld]
    ld.set_epoch(1)
    b2 = [im.copy() for im, _, _ in ld]
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)
    assert len(b1) == 2  # drop_last defaults True when shuffling: 10 // 4

    ld_eval = Loader(src, batch_size=4, height=8, width=16, shuffle=False)
    batches = list(ld_eval)
    assert len(batches) == 3
    _, _, valid = batches[-1]
    np.testing.assert_array_equal(valid, [True, True, False, False])


def test_class_weight_formula():
    # one dominant class => low weight; rare class => near 1/ln(1.1)
    labels = [np.full((10, 10), 0, np.uint8)]
    labels.append(np.array([[1] + [0] * 99], np.uint8).reshape(10, 10))
    w = compute_class_weights(labels, num_classes=3)
    assert w[2] == 0.0  # ignore class
    assert w[1] > w[0]
    np.testing.assert_allclose(w[0], 1 / np.log(1.1 + 199 / 200), rtol=1e-6)
    np.testing.assert_allclose(w[1], 1 / np.log(1.1 + 1 / 200), rtol=1e-6)


def test_reference_weight_tables():
    assert CLASS_WEIGHTS["cityscapes"].shape == (20,)
    assert CLASS_WEIGHTS["BDD"].shape == (20,)
    assert CLASS_WEIGHTS["IDD"].shape == (27,)
    for w in CLASS_WEIGHTS.values():
        assert w[-1] == 0.0  # ignore class zeroed
        assert (w[:-1] > 0).all()
    # spot values from train_new_task_step2.py:121-131
    np.testing.assert_allclose(CLASS_WEIGHTS["cityscapes"][0], 2.8159904084894922)
    np.testing.assert_allclose(CLASS_WEIGHTS["IDD"][26], 0.0)
    np.testing.assert_allclose(CLASS_WEIGHTS["BDD"][10], 4.142994047786311)


def test_loader_propagates_producer_errors(tmp_path):
    """A decode failure in the producer thread must raise in the consumer,
    not strand q.get() forever (the sentinel carries the exception)."""
    class BrokenSource:
        pairs = [(str(tmp_path / "missing.png"),
                  str(tmp_path / "missing_l.png"))] * 2
        label_map = None

        def __len__(self):
            return len(self.pairs)

    ld = Loader(BrokenSource(), batch_size=2, height=8, width=16)
    with pytest.raises(Exception) as ei:
        next(iter(ld))
    assert "missing" in str(ei.value)


def test_loader_num_workers_zero():
    """torch DataLoader accepts num_workers=0 (in-process); so do we."""
    src = SyntheticSource(5, n=4, height=8, width=16)
    ld = Loader(src, batch_size=2, height=8, width=16, num_threads=0)
    batches = list(ld)
    assert len(batches) == 2


def test_hybrid_cache_propagates_producer_errors(tmp_path):
    """Same contract for HybridCache's uncached-row producer."""
    from types import SimpleNamespace

    from mdilss_tpu.data.device_cache import HybridCache

    # first 2 rows decodable (synthetic), rest are broken paths: build from a
    # real loader, then break the underlying pairs beyond the cached range
    src = SyntheticSource(5, n=6, height=8, width=16)
    ld = Loader(src, batch_size=2, height=8, width=16, shuffle=True, seed=0)
    hc = HybridCache(ld, 4)

    def boom(idx):
        raise RuntimeError(f"decode failed for row {idx}")

    ld._decode = boom
    with pytest.raises(RuntimeError, match="decode failed"):
        for _ in hc.epoch_batches(0):
            pass


def test_abandoned_iterators_do_not_leak_producer_threads():
    """Multitask abandons the longer datasets' epoch generators after
    min-loader iters; the producer (blocked in q.put on the bounded queue)
    must notice `stop` and exit rather than pin the thread — and, for
    HybridCache, the device-resident batches it queued — forever."""
    import threading
    import time

    from mdilss_tpu.data.device_cache import HybridCache

    def settle(n0, what):
        deadline = time.time() + 15
        while time.time() < deadline:
            if threading.active_count() <= n0:
                return
            time.sleep(0.05)
        raise AssertionError(
            f"{what}: {threading.active_count() - n0} leaked thread(s)")

    n0 = threading.active_count()
    src = SyntheticSource(5, n=64, height=8, width=16)
    ld = Loader(src, batch_size=2, height=8, width=16, prefetch=1)
    it = iter(ld)
    next(it)
    it.close()  # generator finally -> stop.set(); producer must unblock
    settle(n0, "Loader")

    ld2 = Loader(src, batch_size=2, height=8, width=16, shuffle=True, seed=0)
    hc = HybridCache(ld2, 8)  # most rows uncached -> producer active
    n0 = threading.active_count()
    gen = hc.epoch_batches(0)
    next(gen)
    gen.close()
    settle(n0, "HybridCache")
