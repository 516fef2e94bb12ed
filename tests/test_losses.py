"""Loss goldens vs torch: weighted CE (NLLLoss2d path) and the faithful KLD."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from mdilss_tpu.losses import kld_corrected, kld_faithful, weighted_cross_entropy


def test_weighted_ce_matches_torch_nll2d(rng):
    n, h, w, c = 2, 16, 24, 20
    logits = rng.standard_normal((n, h, w, c), dtype=np.float32)
    targets = rng.integers(0, c, size=(n, h, w))
    weight = rng.random(c, dtype=np.float32) * 10
    weight[c - 1] = 0.0  # ignore class weight zeroed (train_RAPFT_step1.py:125-127)

    tl = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    ref = torch.nn.NLLLoss(torch.from_numpy(weight))(
        F.log_softmax(tl, dim=1), torch.from_numpy(targets)
    ).item()
    got = float(weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weight)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_weighted_ce_ignore_class_contributes_nothing(rng):
    n, h, w, c = 1, 8, 8, 5
    logits = rng.standard_normal((n, h, w, c), dtype=np.float32)
    targets = np.full((n, h, w), 2)
    targets[0, :4] = c - 1  # half the pixels are ignore
    weight = np.ones(c, np.float32)
    weight[c - 1] = 0.0
    full = float(weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weight)))
    only_valid = float(
        weighted_cross_entropy(
            jnp.asarray(logits[:, 4:]), jnp.asarray(targets[:, 4:]), jnp.asarray(weight)
        )
    )
    np.testing.assert_allclose(full, only_valid, rtol=1e-6)


def test_kld_faithful_matches_torch_formula(rng):
    n, h, w, c = 2, 8, 12, 20
    student = rng.standard_normal((n, h, w, c), dtype=np.float32) * 3
    teacher = rng.standard_normal((n, h, w, c), dtype=np.float32) * 3
    ts = torch.from_numpy(np.transpose(student, (0, 3, 1, 2)))
    tt = torch.from_numpy(np.transpose(teacher, (0, 3, 1, 2)))
    # the reference's literal call (train_new_task_step2.py:296-297):
    # probabilities passed where log-probabilities are expected
    ref = torch.nn.KLDivLoss()(F.softmax(ts, dim=1), F.softmax(tt, dim=1)).item()
    got = float(kld_faithful(jnp.asarray(student), jnp.asarray(teacher)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_kld_corrected_matches_torch_log_input(rng):
    n, h, w, c = 2, 8, 12, 20
    student = rng.standard_normal((n, h, w, c), dtype=np.float32)
    teacher = rng.standard_normal((n, h, w, c), dtype=np.float32)
    ts = torch.from_numpy(np.transpose(student, (0, 3, 1, 2)))
    tt = torch.from_numpy(np.transpose(teacher, (0, 3, 1, 2)))
    ref = torch.nn.KLDivLoss()(F.log_softmax(ts, dim=1), F.softmax(tt, dim=1)).item()
    got = float(kld_corrected(jnp.asarray(student), jnp.asarray(teacher)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
