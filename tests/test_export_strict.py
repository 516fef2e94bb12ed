"""Strict torch-side round-trip: `convert --export` -> torch.load ->
reference `Net.load_state_dict(sd, strict=True)` -> forward parity.

Round-4 verdict ask #4: the existing export-fidelity checks compare dict to
dict through our own exporter, which cannot catch key-GRAMMAR drift (missing
or unexpected keys). These tests compose the real consumer instead — the
reference nn.Module wrapped in DataParallel, exactly how the notebook loads
released checkpoints (Evaluation_Notebook cells 8-22; checkpoint dict shape
of train_RAPFT_step1.py:364-370) — with strict=True, then assert the torch
forward matches our apply on the same weights. One test per exportable kind
{rap, ftp1, ftp2, multi_task, erfnet}.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from _reference_loader import load_reference_module
from mdilss_tpu.ckpt import orbax_io
from mdilss_tpu.cli import main as cli_main
from mdilss_tpu.evaluate import load_checkpoint
from mdilss_tpu.models import erfnet_multihead, erfnet_rap
from mdilss_tpu.train import steps

torch = pytest.importorskip("torch")

ATOL = 2e-4  # fp32 CPU conv accumulation-order differences across ~34 layers
H, W = 64, 128


def _export_orbax(tmp_path, params, bn, kind):
    """Save an Orbax run, CLI-convert it to a reference .pth.tar, torch-load
    the state dict (the notebook's own first step)."""
    run = tmp_path / "run"
    orbax_io.save(str(run), 0, steps.init_train_state(params, bn),
                  best_acc=0.0, rng=jax.random.key(0))
    pth = tmp_path / "exported.pth.tar"
    cli_main(["convert", str(run), str(pth), "--export", "--kind", kind])
    ckpt = torch.load(str(pth), map_location="cpu", weights_only=False)
    assert set(ckpt) == {"epoch", "arch", "state_dict", "best_acc", "optimizer"}
    return str(run), ckpt["state_dict"]


def _strict_load(ref_net, sd):
    """DataParallel wrap (module.-prefixed keys) + strict=True: any missing or
    unexpected key is an immediate failure."""
    dp = torch.nn.DataParallel(ref_net)
    dp.load_state_dict(sd, strict=True)
    dp.eval()
    return dp


def _assert_forward_parity(torch_fwd, run, kind, tasks, x):
    apply_fn, params, bn = load_checkpoint(run, kind=kind)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    for t in tasks:
        with torch.no_grad():
            ref_out = torch_fwd(tx, t).numpy()
        ours, _ = apply_fn(params, bn, jnp.asarray(x), t, training=False)
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref_out,
            atol=ATOL, rtol=1e-4, err_msg=f"{kind} task {t}",
        )


@pytest.fixture
def x(rng):
    return rng.standard_normal((1, H, W, 3), dtype=np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.slow
def test_strict_roundtrip_rap(tmp_path, x):
    params, bn = erfnet_rap.init(jax.random.key(1), [20, 20, 27], 3)
    run, sd = _export_orbax(tmp_path, params, bn, "rap")
    ref = load_reference_module("models/erfnet_RA_parallel.py")
    dp = _strict_load(ref.Net([20, 20, 27], nb_tasks=3, cur_task=2), sd)
    _assert_forward_parity(lambda tx, t: dp(tx, t), run, "rap", (0, 1, 2), x)


@pytest.mark.slow
def test_strict_roundtrip_multi_task(tmp_path, x):
    params, bn = erfnet_multihead.init(jax.random.key(2), [20, 20, 27])
    run, sd = _export_orbax(tmp_path, params, bn, "multi_task")
    ref = load_reference_module("models/erfnet_multi_task.py")
    dp = _strict_load(ref.Net([20, 20, 27], nb_tasks=3, cur_task=2), sd)
    _assert_forward_parity(lambda tx, t: dp(tx, t), run, "multi_task", (0, 1, 2), x)


@pytest.mark.slow
def test_strict_roundtrip_ftp1(tmp_path, x):
    params, bn = erfnet_multihead.init(jax.random.key(3), [20, 20])
    run, sd = _export_orbax(tmp_path, params, bn, "ftp1")
    ref = load_reference_module("models/erfnet_ftp1.py")
    dp = _strict_load(ref.Net(num_classes_old=20, num_classes_new=20), sd)

    def fwd(tx, t):  # head flags -> task index (erfnet_ftp1.py:143-151)
        return dp(tx, decoder_old=(t == 0), decoder_new=(t == 1))

    _assert_forward_parity(fwd, run, "ftp1", (0, 1), x)


@pytest.mark.slow
def test_strict_roundtrip_ftp2(tmp_path, x):
    params, bn = erfnet_multihead.init(jax.random.key(4), [20, 20, 27])
    run, sd = _export_orbax(tmp_path, params, bn, "ftp2")
    ref = load_reference_module("models/erfnet_ftp2.py")
    dp = _strict_load(ref.Net(20, 20, 27), sd)

    def fwd(tx, t):  # erfnet_ftp2.py:144-152 flag order
        return dp(tx, decoder_old1=(t == 0), decoder_old2=(t == 1),
                  decoder_new=(t == 2))

    _assert_forward_parity(fwd, run, "ftp2", (0, 1, 2), x)


@pytest.mark.slow
def test_strict_roundtrip_erfnet(tmp_path, x):
    # our own singletask runs checkpoint the one-head multihead pytree; the
    # erfnet kind remaps it to {encoder, decoder} (evaluate.load_checkpoint)
    params, bn = erfnet_multihead.init(jax.random.key(5), [20])
    run, sd = _export_orbax(tmp_path, params, bn, "erfnet")
    ref = load_reference_module("models/erfnet.py")
    dp = _strict_load(ref.Net(20), sd)
    _assert_forward_parity(lambda tx, t: dp(tx), run, "erfnet", (0,), x)
