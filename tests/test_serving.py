"""Serving-artifact tests (mdilss_tpu/serving.py): export -> deserialize ->
bit-compare against the in-process model, symbolic-batch polymorphism, and
the Orbax-checkpoint CLI path."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdilss_tpu import serving
from mdilss_tpu.models import erfnet_rap


@pytest.fixture(scope="module")
def small_rap():
    params, bn = erfnet_rap.init(jax.random.key(0), [5, 7], 2)
    return params, bn


def test_export_roundtrip_logits(small_rap, tmp_path):
    params, bn = small_rap
    blob = serving.export_head(
        erfnet_rap.apply, params, bn, 1, height=32, width=64, batch_size=2,
        compute_dtype=jnp.float32, platforms=("cpu",),
    )
    p = tmp_path / "head1.stablehlo"
    p.write_bytes(blob)
    from jax import export as jexport

    fn = jax.jit(jexport.deserialize(p.read_bytes()).call)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 64, 3))
    got = np.asarray(fn(x))
    want = np.asarray(erfnet_rap.apply(params, bn, x, 1, training=False)[0])
    assert got.shape == (2, 32, 64, 7)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_labels_output(small_rap, tmp_path):
    params, bn = small_rap
    blob = serving.export_head(
        erfnet_rap.apply, params, bn, 0, height=32, width=64, batch_size=1,
        output="labels", compute_dtype=jnp.float32, platforms=("cpu",),
    )
    from jax import export as jexport

    fn = jax.jit(jexport.deserialize(blob).call)
    x = jax.random.uniform(jax.random.key(2), (1, 32, 64, 3))
    got = np.asarray(fn(x))
    assert got.shape == (1, 32, 64) and got.dtype == np.int32
    want = np.argmax(
        np.asarray(erfnet_rap.apply(params, bn, x, 0, training=False)[0]), -1
    )
    np.testing.assert_array_equal(got, want)


def test_bf16_default_vs_f32_quantified(small_rap, tmp_path):
    """The SHIPPED export default is compute_dtype=bfloat16; the eval protocol
    behind expected_miou.json is f32 (Evaluation notebook cells 4-5). This
    quantifies the deviation of the default on the export path itself:
    logits stay within the bf16 rounding envelope and label disagreement is
    confined to a small fraction of near-tie pixels (measured ~0.1-1% on
    random inputs; serving.py docstring records the measured numbers)."""
    params, bn = small_rap
    kw = dict(height=32, width=64, batch_size=4, platforms=("cpu",))
    blob32 = serving.export_head(erfnet_rap.apply, params, bn, 1,
                                 compute_dtype=jnp.float32, **kw)
    blob16 = serving.export_head(erfnet_rap.apply, params, bn, 1,
                                 compute_dtype=jnp.bfloat16, **kw)
    from jax import export as jexport

    f32 = jax.jit(jexport.deserialize(blob32).call)
    f16 = jax.jit(jexport.deserialize(blob16).call)
    x = jax.random.uniform(jax.random.key(3), (4, 32, 64, 3))
    l32 = np.asarray(f32(x))
    l16 = np.asarray(f16(x))
    assert l16.dtype == np.float32  # artifact returns f32 regardless
    scale = np.abs(l32).max()
    max_delta = np.abs(l32 - l16).max()
    disagree = float((l32.argmax(-1) != l16.argmax(-1)).mean())
    # bf16 has ~2^-8 relative precision; through ~40 layers the logit error
    # stays within a few percent of the logit scale
    assert max_delta <= 0.08 * scale, (max_delta, scale)
    # argmax flips only where the top-2 logits are within the bf16 noise
    assert disagree <= 0.02, disagree
    flips = l32.argmax(-1) != l16.argmax(-1)
    if flips.any():
        sorted32 = np.sort(l32, axis=-1)
        margin = (sorted32[..., -1] - sorted32[..., -2])[flips]
        assert margin.max() <= 0.1 * scale  # all flips were near-ties


def test_symbolic_batch(small_rap):
    """batch_size=None exports a shape-polymorphic artifact usable at any N."""
    params, bn = small_rap
    blob = serving.export_head(
        erfnet_rap.apply, params, bn, 0, height=32, width=64, batch_size=None,
        compute_dtype=jnp.float32, platforms=("cpu",),
    )
    from jax import export as jexport

    fn = jax.jit(jexport.deserialize(blob).call)
    for n in (1, 3):
        x = jnp.ones((n, 32, 64, 3))
        assert fn(x).shape == (n, 32, 64, 5)


def test_export_checkpoint_dir_and_serve(tmp_path, small_rap):
    """Orbax run dir -> export dir with meta.json -> serve_batches."""
    from mdilss_tpu.ckpt import orbax_io
    from mdilss_tpu.train import steps

    params, bn = small_rap
    ck = tmp_path / "run" / "best"
    orbax_io.save(str(ck), 1, steps.init_train_state(params, bn),
                  best_acc=0.0, rng=jax.random.key(0))
    out = tmp_path / "serving"
    meta = serving.export_checkpoint(
        str(ck), kind="rap", num_classes=[5, 7], out_dir=str(out),
        height=32, width=64, batch_size=2, output="labels",
        compute_dtype="float32", platforms=("cpu",),
    )
    assert meta["tasks"] == [0, 1]
    assert (out / "meta.json").exists()
    assert (out / "head0.stablehlo").exists() and (out / "head1.stablehlo").exists()
    # reloaded meta matches
    assert serving.load_meta(str(out))["output"] == "labels"
    batches = [np.random.default_rng(0).integers(0, 256, (2, 32, 64, 3), np.uint8)]
    (got,) = list(serving.serve_batches(str(out), 1, batches))
    assert got.shape == (2, 32, 64) and got.dtype == np.int32
    # wrong resolution is rejected
    with pytest.raises(ValueError, match="artifact expects"):
        list(serving.serve_batches(str(out), 1, [np.zeros((2, 16, 64, 3), np.float32)]))


def test_cli_export(tmp_path, small_rap):
    from mdilss_tpu.ckpt import orbax_io
    from mdilss_tpu.train import steps
    from mdilss_tpu.cli import main

    params, bn = small_rap
    ck = tmp_path / "run" / "best"
    orbax_io.save(str(ck), 1, steps.init_train_state(params, bn),
                  best_acc=0.0, rng=jax.random.key(0))
    out = tmp_path / "serving"
    main([
        "export", str(ck), str(out), "--kind", "rap", "--num-classes", "5", "7",
        "--tasks", "0", "--height", "32", "--width", "64", "--batch-size", "1",
        "--dtype", "float32", "--platforms", "cpu",
    ])
    meta = json.loads((out / "meta.json").read_text())
    assert meta["tasks"] == [0] and meta["batch_size"] == 1
    assert (out / "head0.stablehlo").exists()
