"""Colorize-palette goldens vs the reference transform.py oracle, latent
feature extraction, and the t-SNE/prediction-dump workflows on tiny shapes."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdilss_tpu.data.colorize import colorize, colormap, colormap_cityscapes

from _reference_loader import load_reference_module


def test_colormap_cityscapes_matches_reference():
    ref = load_reference_module("transform.py")
    # n < 29 crashes the reference implementation (it always writes rows
    # 0..28); compare only at the sizes the notebook actually uses.
    np.testing.assert_array_equal(colormap_cityscapes(256), ref.colormap_cityscapes(256))
    np.testing.assert_array_equal(colormap_cityscapes(29), ref.colormap_cityscapes(29))


def test_generic_colormap_matches_reference():
    ref = load_reference_module("transform.py")
    np.testing.assert_array_equal(colormap(64), ref.colormap(64))


@pytest.mark.parametrize("n", [20, 22, 27])
def test_colorize_matches_reference_colorize(rng, n):
    ref = load_reference_module("transform.py")
    import torch

    labels = rng.integers(0, 30, size=(17, 23)).astype(np.uint8)
    labels[0, :4] = 255  # ignore pixels -> black
    got = colorize(labels, n)  # HWC
    want = ref.Colorize(n)(torch.from_numpy(labels.astype(np.int64)).unsqueeze(0))
    np.testing.assert_array_equal(got, want.numpy().transpose(1, 2, 0))


def test_return_features_shapes():
    from mdilss_tpu.models import erfnet_rap

    params, bn = erfnet_rap.init(jax.random.key(0), [7], 1)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    logits, _, feats = erfnet_rap.apply(params, bn, x, 0, return_features=True)
    assert logits.shape == (1, 64, 128, 7)
    assert feats["encoder"].shape == (1, 8, 16, 128)
    assert feats["penultimate"].shape == (1, 32, 64, 16)
    # default signature unchanged
    logits2, _ = erfnet_rap.apply(params, bn, x, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2))


def test_sample_pixels_nearest_downsample_matches_pil(rng):
    from PIL import Image

    from mdilss_tpu.analysis.tsne import sample_pixels

    labels = rng.integers(0, 20, size=(64, 128)).astype(np.uint8)
    feats = rng.random((8, 16, 4)).astype(np.float32)
    # identity check: sample everything, compare label downsample vs PIL NEAREST
    f, y = sample_pixels(feats, labels, n=8 * 16, seed=0)
    want = np.asarray(Image.fromarray(labels).resize((16, 8), Image.NEAREST))
    # reconstruct full map from the permutation
    full_f, full_y = sample_pixels(feats, labels, n=10**9, seed=1)
    assert sorted(full_y.tolist()) == sorted(want.reshape(-1).tolist())
    assert f.shape == (128, 4) and y.shape == (128,)


def test_tsne_workflow_synthetic(tmp_path):
    pytest.importorskip("sklearn")
    pytest.importorskip("matplotlib")
    from mdilss_tpu.analysis.tsne import run_tsne
    from mdilss_tpu.data import SyntheticSource
    from mdilss_tpu.models import erfnet_rap

    nc = 7
    params, bn = erfnet_rap.init(jax.random.key(0), [nc], 1)
    source = SyntheticSource(nc, n=2, height=64, width=128)
    out = run_tsne(
        erfnet_rap.apply, params, bn, source, task=0, num_classes=nc,
        out_path=str(tmp_path / "tsne.png"), n_samples=80,
        select=lambda labels, n: True, height=64, width=128,
    )
    assert os.path.exists(out["plot"])
    assert out["embedding"].shape == (80, 2)


def test_save_predictions_synthetic(tmp_path):
    from mdilss_tpu.analysis.predict import save_predictions
    from mdilss_tpu.data import SyntheticSource
    from mdilss_tpu.models import erfnet_rap

    nc = 7
    params, bn = erfnet_rap.init(jax.random.key(0), [nc], 1)
    source = SyntheticSource(nc, n=3, height=32, width=64)
    written = save_predictions(
        erfnet_rap.apply, params, bn, source, task=0, num_classes=nc,
        out_dir=str(tmp_path), max_images=2, save_gt=True, height=32, width=64,
    )
    assert len(written) == 4  # 2 images x (pred + gt)
    from PIL import Image

    arr = np.asarray(Image.open(written[0]))
    assert arr.shape == (32, 64, 3)
    # every pixel is a palette color for labels < nc
    palette = set(map(tuple, colormap_cityscapes(256)[:nc].tolist()))
    assert set(map(tuple, arr.reshape(-1, 3).tolist())) <= palette


def test_load_checkpoint_erfnet_kind_orbax(tmp_path):
    """eval/predict on this framework's own singletask Orbax runs: the
    multi-head-with-one-head checkpoint remaps to the erfnet layout
    (regression: KeyError 'decoder')."""
    import jax
    import jax.numpy as jnp

    from mdilss_tpu.ckpt import orbax_io
    from mdilss_tpu.evaluate import load_checkpoint
    from mdilss_tpu.models import erfnet_multihead
    from mdilss_tpu.train import steps

    p, b = erfnet_multihead.init(jax.random.key(0), [6])
    orbax_io.save(str(tmp_path / "ck"), 0, steps.init_train_state(p, b),
                  best_acc=0.0, rng=jax.random.key(1))
    apply_fn, params, bn = load_checkpoint(str(tmp_path / "ck"), kind="erfnet")
    out = apply_fn(params, bn, jnp.ones((1, 32, 64, 3), jnp.float32), 0,
                   training=False)[0]
    assert out.shape == (1, 32, 64, 6)
