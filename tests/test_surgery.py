"""Checkpoint-surgery tests: pytree surgery == the reference's key-string rules.

Oracle: the step-t init scheme of SURVEY.md §2.6 (train_new_task_step2.py:
499-530) applied literally to torch-format state dicts:
  - common keys copied verbatim,
  - encoder DS `.{t-1}.weight|bias` duplicated to `.{t}.`,
  - decoder t-1 copied to decoder t except output_conv,
  - everything else (new BN running stats, new output_conv) fresh init.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from _reference_loader import load_reference_module
from mdilss_tpu.ckpt import convert_state_dict, extend_for_new_task, load_imagenet_encoder
from mdilss_tpu.ckpt.pth_converter import export_state_dict


def _np_state_dict(model):
    return {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}


def _oracle_extend(sd_prev: dict, sd_new_model: dict, t_new: int) -> dict:
    """Spec-oracle: build the state dict the reference's load produces for the
    grown model (random-init `sd_new_model` overlaid per the rules)."""
    out = dict(sd_new_model)
    for k, v in sd_prev.items():
        if k in out and out[k].shape == v.shape:
            out[k] = v  # common keys verbatim
    for k, v in sd_prev.items():
        if "encoder" in k and ("parallel_conv" in k or "bn" in k):
            for suffix in ("weight", "bias"):
                tag = f".{t_new - 1}.{suffix}"
                if tag in k:
                    out[k.replace(tag, f".{t_new}.{suffix}")] = v
        elif "decoder" in k and "output_conv" not in k:
            if k.startswith(f"decoder.{t_new - 1}"):
                out[k.replace(f"decoder.{t_new - 1}", f"decoder.{t_new}")] = v
    return out


def test_extend_for_new_task_matches_reference_rules():
    ref = load_reference_module("models/erfnet_RA_parallel.py")
    prev = ref.Net([20, 20], nb_tasks=2, cur_task=1)
    sd_prev = _np_state_dict(prev)
    grown_torch = ref.Net([20, 20, 27], nb_tasks=3, cur_task=2)
    sd_oracle = _oracle_extend(sd_prev, _np_state_dict(grown_torch), t_new=2)

    params, state = convert_state_dict(sd_prev, kind="rap", nb_tasks=2)
    params3, state3 = extend_for_new_task(params, state, 27, jax.random.key(0))
    got = export_state_dict(params3, state3, kind="rap")

    skip = {k for k in sd_oracle if k.startswith("decoder.2.output_conv")}
    skip |= {k for k in sd_oracle if "num_batches_tracked" in k}
    checked = 0
    for k, v in sd_oracle.items():
        if k in skip:
            continue
        np.testing.assert_array_equal(got[k], v, err_msg=k)
        checked += 1
    assert checked > 300
    # fresh output_conv has the right shape for the new class count
    assert got["decoder.2.output_conv.weight"].shape == (16, 27, 2, 2)
    # new task's running stats start fresh (not copied from t-1)
    np.testing.assert_array_equal(got["encoder.layers.1.bns_1.2.running_mean"], np.zeros(64))
    np.testing.assert_array_equal(got["encoder.layers.1.bns_1.2.running_var"], np.ones(64))
    # but its BN weight/bias are seeded from t-1
    np.testing.assert_array_equal(
        got["encoder.layers.1.bns_1.2.weight"], sd_prev["encoder.layers.1.bns_1.1.weight"]
    )


def test_load_imagenet_encoder_only_touches_shared_convs():
    """Step-1: `module.features.*`->`module.*`, strict=False => in the RAP model
    only shared encoder convs match; DS bn/adapters and decoders are untouched
    (train_RAPFT_step1.py:482-502)."""
    ref = load_reference_module("models/erfnet_RA_parallel.py")
    model = ref.Net([20], nb_tasks=1, cur_task=0)
    params, state = convert_state_dict(_np_state_dict(model), kind="rap", nb_tasks=1)
    before = export_state_dict(params, state, kind="rap")

    # fake pretrained encoder: single-task erfnet-style keys under module.features.
    pretrained = {}
    rng = np.random.default_rng(1)
    for k, v in before.items():
        if k.startswith("encoder.") and "conv" in k and "parallel" not in k and "decoder" not in k:
            pretrained["module.features." + k] = rng.standard_normal(v.shape).astype(np.float32)
    # plus keys that exist only in the single-task encoder (bn1 etc.) — must be ignored
    pretrained["module.features.encoder.layers.1.bn1.weight"] = np.ones(64, np.float32)

    params2, state2 = load_imagenet_encoder(params, state, pretrained, kind="rap")
    after = export_state_dict(params2, state2, kind="rap")

    for k, v in before.items():
        if "module.features." + k in pretrained:
            np.testing.assert_array_equal(after[k], pretrained["module.features." + k], err_msg=k)
        else:
            np.testing.assert_array_equal(after[k], v, err_msg=k)


def test_cli_convert_round_trip(tmp_path):
    """orbax -> --export .pth.tar (torch-loadable) -> orbax: bit-exact."""
    import jax.numpy as jnp

    from mdilss_tpu.ckpt import orbax_io
    from mdilss_tpu.cli import main as cli_main
    from mdilss_tpu.evaluate import load_checkpoint
    from mdilss_tpu.models import erfnet_rap
    from mdilss_tpu.train import steps

    params, bn = erfnet_rap.init(jax.random.key(0), [6, 6], 2)
    orbax_io.save(str(tmp_path / "orig"), 0, steps.init_train_state(params, bn),
                  best_acc=0.0, rng=jax.random.key(0))
    cli_main(["convert", str(tmp_path / "orig"), str(tmp_path / "ck.pth.tar"),
              "--kind", "rap", "--nb-tasks", "2", "--num-classes", "6", "6", "--export"])
    cli_main(["convert", str(tmp_path / "ck.pth.tar"), str(tmp_path / "back"),
              "--kind", "rap", "--nb-tasks", "2"])
    _, p2, b2 = load_checkpoint(str(tmp_path / "back"), kind="rap", num_classes=[6, 6])
    x = jnp.linspace(0, 1, 1 * 32 * 64 * 3).reshape(1, 32, 64, 3).astype(jnp.float32)
    a, _ = erfnet_rap.apply(params, bn, x, 1)
    b, _ = erfnet_rap.apply(p2, b2, x, 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_infer_num_classes_orbax_and_pth(tmp_path):
    """Head class counts are read from the checkpoint itself (Orbax tree
    metadata / torch output_conv shapes), so eval/predict/tsne need no
    hand-specified --num-classes."""
    from mdilss_tpu.ckpt import orbax_io
    from mdilss_tpu.cli import main as cli_main
    from mdilss_tpu.evaluate import infer_num_classes, load_checkpoint
    from mdilss_tpu.models import erfnet_rap
    from mdilss_tpu.train import steps

    params, bn = erfnet_rap.init(jax.random.key(0), [5, 7], 2)
    orbax_io.save(str(tmp_path / "ck"), 0, steps.init_train_state(params, bn),
                  best_acc=0.0, rng=jax.random.key(0))
    assert infer_num_classes(str(tmp_path / "ck")) == [5, 7]

    # torch-format export: shapes come from `decoders.{i}.output_conv.bias`
    cli_main(["convert", str(tmp_path / "ck"), str(tmp_path / "ck.pth.tar"),
              "--kind", "rap", "--nb-tasks", "2", "--export"])
    assert infer_num_classes(str(tmp_path / "ck.pth.tar")) == [5, 7]

    # load_checkpoint(num_classes=None) builds the right template
    _, p2, _ = load_checkpoint(str(tmp_path / "ck"), kind="rap")
    assert [int(d["output_conv"]["b"].shape[0]) for d in p2["decoders"]] == [5, 7]


def test_infer_num_classes_named_ft_heads(tmp_path):
    """ftp1/ftp2 reference checkpoints name their heads (decoder_old /
    decoder_new / decoder_old1 / decoder_old2 — erfnet_ftp1.py:139-141,
    erfnet_ftp2.py:139-143) instead of digit-indexing them; inference must
    keep the task order and not collapse them into one head."""
    import torch

    from mdilss_tpu.ckpt import export_state_dict
    from mdilss_tpu.evaluate import infer_num_classes
    from mdilss_tpu.models import erfnet_multihead

    def save(kind, ncls, dst):
        params, bn = erfnet_multihead.init(jax.random.key(0), list(ncls))
        sd = export_state_dict(params, bn, kind=kind, prefix="module.")
        torch.save({"epoch": 0, "arch": kind, "best_acc": 0.0, "optimizer": {},
                    "state_dict": {k: torch.from_numpy(v.copy()) for k, v in sd.items()}},
                   dst)

    save("ftp1", [5, 7], str(tmp_path / "ftp1.pth.tar"))
    assert infer_num_classes(str(tmp_path / "ftp1.pth.tar")) == [5, 7]

    save("ftp2", [5, 7, 9], str(tmp_path / "ftp2.pth.tar"))
    assert infer_num_classes(str(tmp_path / "ftp2.pth.tar")) == [5, 7, 9]
