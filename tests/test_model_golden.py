"""Full-model golden tests: our functional models vs the reference nn.Modules.

Random reference weights -> state_dict -> convert_state_dict -> compare
logits for every task head, in eval mode (running stats) and training mode
(batch stats, dropout forced off on both sides). This pins the whole
conv/BN/residual/upsampling pipeline end to end, including the checkpoint
converter's layout transforms.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from _reference_loader import load_reference_module
from mdilss_tpu.ckpt import convert_state_dict
from mdilss_tpu.ckpt.pth_converter import export_state_dict
from mdilss_tpu.models import erfnet, erfnet_multihead, erfnet_rap

ATOL = 2e-4  # fp32 CPU conv accumulation-order differences across ~34 layers
# training mode renormalizes every layer by batch stats, compounding the
# accumulation-order noise; eval mode (the checkpoint-parity path) stays tight
TRAIN_ATOL = 2e-3


def _tols(training):
    return dict(atol=TRAIN_ATOL, rtol=0) if training else dict(atol=ATOL, rtol=1e-4)


def _np_state_dict(model):
    return {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}


def _disable_dropout(model):
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout2d):
            m.p = 0


@pytest.mark.parametrize("training", [False, True])
def test_rap_model_matches_reference(rng, training):
    ref = load_reference_module("models/erfnet_RA_parallel.py")
    num_classes = [20, 20, 27]
    tmodel = ref.Net(num_classes, nb_tasks=3, cur_task=2)
    tmodel.train(training)
    _disable_dropout(tmodel)

    params, state = convert_state_dict(_np_state_dict(tmodel), kind="rap", nb_tasks=3)

    x = rng.standard_normal((2, 64, 128, 3), dtype=np.float32)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    for task in range(3):
        with torch.no_grad():
            ref_out = tmodel(tx, task).numpy()
        got, _ = erfnet_rap.apply(params, state, jnp.asarray(x), task, training=training)
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        assert got.shape == ref_out.shape == (2, num_classes[task], 64, 128)
        np.testing.assert_allclose(got, ref_out, **_tols(training))


def test_rap_training_updates_bn_state_like_torch(rng):
    ref = load_reference_module("models/erfnet_RA_parallel.py")
    tmodel = ref.Net([20, 20], nb_tasks=2, cur_task=1)
    tmodel.train()
    _disable_dropout(tmodel)
    params, state = convert_state_dict(_np_state_dict(tmodel), kind="rap", nb_tasks=2)

    x = rng.standard_normal((2, 64, 128, 3), dtype=np.float32)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        tmodel(tx, 1)  # torch mutates running stats in-place
    _, new_state = erfnet_rap.apply(params, state, jnp.asarray(x), 1, training=True)

    ref_sd = _np_state_dict(tmodel)
    got_sd = export_state_dict(params, new_state, kind="rap")
    checked = 0
    for k, v in ref_sd.items():
        if "running_mean" in k or "running_var" in k:
            np.testing.assert_allclose(got_sd[k], v, atol=1e-4, rtol=1e-3, err_msg=k)
            checked += 1
    assert checked > 50  # every BN layer of both tasks was compared


@pytest.mark.parametrize("training", [False, True])
def test_plain_erfnet_matches_reference(rng, training):
    ref = load_reference_module("models/erfnet.py")
    tmodel = ref.Net(20)
    tmodel.train(training)
    _disable_dropout(tmodel)
    params, state = convert_state_dict(_np_state_dict(tmodel), kind="erfnet")

    x = rng.standard_normal((2, 64, 128, 3), dtype=np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got, _ = erfnet.apply(params, state, jnp.asarray(x), training=training)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref_out, **_tols(training)
    )


def test_ftp1_heads_match_reference(rng):
    """Reference 2-head FT baseline: decoder_old -> head 0, decoder_new -> head 1
    (erfnet_ftp1.py:143-151 flag API maps to head indices here)."""
    ref = load_reference_module("models/erfnet_ftp1.py")
    tmodel = ref.Net(num_classes_old=20, num_classes_new=20)
    tmodel.eval()
    params, state = convert_state_dict(_np_state_dict(tmodel), kind="ftp1", nb_tasks=2)

    x = rng.standard_normal((1, 64, 128, 3), dtype=np.float32)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        ref_old = tmodel(tx, decoder_old=True, decoder_new=False).numpy()
        ref_new = tmodel(tx, decoder_old=False, decoder_new=True).numpy()
    got_old, _ = erfnet_multihead.apply(params, state, jnp.asarray(x), 0)
    got_new, _ = erfnet_multihead.apply(params, state, jnp.asarray(x), 1)
    np.testing.assert_allclose(np.transpose(np.asarray(got_old), (0, 3, 1, 2)), ref_old, atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(np.transpose(np.asarray(got_new), (0, 3, 1, 2)), ref_new, atol=ATOL, rtol=1e-4)


def test_converter_round_trip(rng):
    """export_state_dict(convert_state_dict(sd)) == sd: the FULL reference key
    set (incl. num_batches_tracked, whose value torch never reads at the
    reference's default BN momentum), values exact up to that counter."""
    ref = load_reference_module("models/erfnet_RA_parallel.py")
    tmodel = ref.Net([20, 20, 27], nb_tasks=3, cur_task=2)
    sd = _np_state_dict(tmodel)
    params, state = convert_state_dict(sd, kind="rap", nb_tasks=3)
    back = export_state_dict(params, state, kind="rap")
    assert set(back) == set(sd)
    for k in sd:
        if "num_batches_tracked" in k:
            continue
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_init_shapes_match_reference(rng):
    """Our random init produces exactly the reference parameter shapes."""
    ref = load_reference_module("models/erfnet_RA_parallel.py")
    tmodel = ref.Net([20, 20], nb_tasks=2, cur_task=1)
    sd = _np_state_dict(tmodel)
    params, state = erfnet_rap.init(jax.random.key(0), [20, 20], 2)
    ours = export_state_dict(params, state, kind="rap")
    assert set(ours) == set(sd)
    for k in sd:
        if "num_batches_tracked" not in k:
            assert ours[k].shape == sd[k].shape, k
