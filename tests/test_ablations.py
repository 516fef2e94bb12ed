"""Ablation-variant models (models/erfnet_ablations.py): structure, task
isolation, freeze masks, surgery growth, and a trainer smoke per variant.

There is no torch oracle for these (the reference's four ablation model files
are absent upstream, train_RAPFT_step1.py:451-460 / README.md:44), so tests
pin the *reconstructed* semantics: per-variant DS parameter surface, RCM's
identity initialization (== plain block at init), and the incremental-learning
invariants (old-task outputs untouched by new-task training).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdilss_tpu import config as C
from mdilss_tpu.ckpt.surgery import extend_for_new_task
from mdilss_tpu.models import erfnet_ablations as A
from mdilss_tpu.models.blocks import (
    nb1d_ablation_apply,
    nb1d_ablation_init,
    nb1d_apply,
    nb1d_init,
)
from mdilss_tpu.train import masks
from mdilss_tpu.train.protocols import build_trainer

VARIANTS = ("bn", "onlyrap", "ras", "rcm")
TINY = dict(synthetic=True, synthetic_size=4, batch_size=2, height=32, width=64,
            num_workers=2)


def _leaf_names(tree, prefix=""):
    names = set()
    if isinstance(tree, dict):
        for k, v in tree.items():
            names |= _leaf_names(v, f"{prefix}{k}.")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            names |= _leaf_names(v, f"{prefix}{i}.")
    else:
        names.add(prefix.rstrip("."))
    return names


@pytest.mark.parametrize("variant", VARIANTS)
def test_ds_parameter_surface(variant):
    """Each variant exposes exactly its inferred DS parameter family."""
    params, state = A.init(jax.random.key(0), [5, 7], 2, variant=variant)
    names = _leaf_names(params["encoder"]["group64"])
    has = lambda k: any(k in n for n in names)
    assert has("rap1") == (variant == "onlyrap")
    assert has("ser1") == (variant == "ras")
    assert has("wt1") == (variant == "rcm")
    per_task_bn = variant != "onlyrap"
    assert has("bns1") == per_task_bn
    assert has("bn1") == (not per_task_bn)
    # downsampler bn_ini task-stacked iff BN is per-task
    scale = params["encoder"]["initial"]["bn"]["scale"]
    assert (scale.ndim == 2) == per_task_bn
    if per_task_bn:
        assert scale.shape[0] == 2
    # two decoders with the right class counts
    assert params["decoders"][0]["output_conv"]["w"].shape[-1] == 5
    assert params["decoders"][1]["output_conv"]["w"].shape[-1] == 7


def test_rcm_identity_matches_plain_block():
    """RCM's Wt matrices initialize to identity, so the block equals the
    plain nb1d block bit-for-bit at init (given equal conv/BN params)."""
    rng = jax.random.key(3)
    p_plain, s_plain = nb1d_init(rng, 16, 2)
    p_rcm, s_rcm = nb1d_ablation_init(rng, 16, 2, 2, "rcm")
    # overlay identical shared conv + BN params
    for k in ("conv3x1_1", "conv1x3_1", "conv3x1_2", "conv1x3_2"):
        p_rcm[k] = p_plain[k]
    for i, k in enumerate(("bns1", "bns2")):
        src = p_plain[f"bn{i+1}"]
        p_rcm[k] = {kk: jnp.stack([vv, vv]) for kk, vv in src.items()}
    x = jax.random.normal(jax.random.key(1), (2, 8, 12, 16))
    y_plain, _ = nb1d_apply(p_plain, s_plain, x, dilated=2, dropprob=0.0, training=False)
    y_rcm, _ = nb1d_ablation_apply(
        p_rcm, s_rcm, x, variant="rcm", task=1, dilated=2, dropprob=0.0, training=False
    )
    np.testing.assert_allclose(np.asarray(y_rcm), np.asarray(y_plain), atol=1e-6)


@pytest.mark.parametrize("variant", VARIANTS)
def test_task_isolation(variant):
    """Perturbing task 1's DS slices must not change task 0's output; for
    onlyrap (shared BN) perturbing the shared BN must change both."""
    params, state = A.init(jax.random.key(0), [5, 5], 2, variant=variant)
    x = jax.random.normal(jax.random.key(1), (1, 32, 64, 3))
    y0, _ = A.apply(params, state, x, 0, variant=variant, training=False)

    # perturb every task-stacked leaf's task-1 slice in the encoder
    p2 = jax.tree.map(lambda a: a, params)
    enc = p2["encoder"]

    def bump_ds(p, group_axis_offset):
        # group leaves: [G, T, ...]; downsampler bn: [T, C]
        out = {}
        for k, v in p.items():
            if k in ("bns1", "bns2", "rap1", "rap2", "ser1", "ser2"):
                out[k] = jax.tree.map(
                    lambda a: a.at[(slice(None),) * group_axis_offset + (1,)].add(0.7), v
                )
            elif k in ("wt1", "wt2"):
                out[k] = v.at[(slice(None),) * group_axis_offset + (1,)].add(0.7)
            else:
                out[k] = v
        return out

    enc["group64"] = bump_ds(enc["group64"], 1)
    enc["group128"] = {dk: bump_ds(enc["group128"][dk], 1) for dk in enc["group128"]}
    if variant != "onlyrap":
        for seg in ("initial", "down1", "down2"):
            enc[seg] = {
                **enc[seg],
                "bn": jax.tree.map(lambda a: a.at[1].add(0.7), enc[seg]["bn"]),
            }
    y0_after, _ = A.apply(p2, state, x, 0, variant=variant, training=False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y0_after))
    y1_before, _ = A.apply(params, state, x, 1, variant=variant, training=False)
    y1_after, _ = A.apply(p2, state, x, 1, variant=variant, training=False)
    assert not np.allclose(np.asarray(y1_before), np.asarray(y1_after))


@pytest.mark.parametrize("variant", VARIANTS)
def test_lr_tree_freeze_surface(variant):
    """The lr tree freezes old-task DS slices + old decoders and moves the
    current task's DS at ds_lr, shared convs at shared_lr."""
    params, _ = A.init(jax.random.key(0), [5, 5], 2, variant=variant)
    tree = masks.ablation_lr_tree(
        params, variant=variant, current_task=1, shared_lr=5e-6, ds_lr=5e-4
    )
    # every lr leaf broadcasts against its param leaf
    for p, lr in zip(jax.tree.leaves(params), jax.tree.leaves(tree)):
        np.broadcast_shapes(p.shape, np.shape(lr))
    # decoders: old frozen, current at ds_lr
    assert all(float(v) == 0.0 for v in jax.tree.leaves(tree["decoders"][0]))
    assert all(float(v) == pytest.approx(5e-4) for v in jax.tree.leaves(tree["decoders"][1]))
    g64 = tree["encoder"]["group64"]
    assert float(np.asarray(g64["conv3x1_1"]["w"])) == pytest.approx(5e-6)
    if variant == "onlyrap":
        # task column on adapters; shared BN moves with the shared group
        col = np.asarray(g64["rap1"]["w"]).reshape(-1)
        assert col[0] == 0.0 and col[1] == pytest.approx(5e-4)
        assert float(np.asarray(g64["bn1"]["scale"])) == pytest.approx(5e-6)
    else:
        col = np.asarray(g64["bns1"]["scale"]).reshape(-1)
        assert col[0] == 0.0 and col[1] == pytest.approx(5e-4)
    if variant == "rcm":
        col = np.asarray(g64["wt1"]).reshape(-1)
        assert col[0] == 0.0 and col[1] == pytest.approx(5e-4)
    if variant == "ras":
        col = np.asarray(g64["ser1"]["w"]).reshape(-1)
        assert col[0] == 0.0 and col[1] == pytest.approx(5e-4)


@pytest.mark.parametrize("variant", VARIANTS)
def test_surgery_growth(variant):
    """extend_for_new_task grows every task-stacked leaf by one slot seeded
    from task t-1 (BN running stats fresh) and appends a decoder copy with a
    fresh output_conv — for every variant."""
    params, state = A.init(jax.random.key(0), [5], 1, variant=variant)
    new_p, new_s = extend_for_new_task(params, state, 7, jax.random.key(1))
    assert len(new_p["decoders"]) == 2
    assert new_p["decoders"][1]["output_conv"]["w"].shape[-1] == 7
    g = new_p["encoder"]["group64"]
    if variant == "onlyrap":
        assert g["rap1"]["w"].shape[1] == 2
        np.testing.assert_array_equal(  # seeded from t-1
            np.asarray(g["rap1"]["w"][:, 0]), np.asarray(g["rap1"]["w"][:, 1])
        )
        assert g["bn1"]["scale"].ndim == 2  # [G, C]: still shared
        assert new_p["encoder"]["initial"]["bn"]["scale"].ndim == 1
    else:
        assert g["bns1"]["scale"].shape[1] == 2
        ns = new_s["encoder"]["group64"]["bns1"]
        np.testing.assert_array_equal(np.asarray(ns.mean[:, 1]), 0.0)  # fresh stats
        np.testing.assert_array_equal(np.asarray(ns.var[:, 1]), 1.0)
        assert new_p["encoder"]["initial"]["bn"]["scale"].shape[0] == 2
    if variant == "ras":
        assert g["ser1"]["w"].shape[1] == 2
    if variant == "rcm":
        assert g["wt1"].shape[1] == 2
    # growth preserves task-0 behavior exactly
    x = jax.random.normal(jax.random.key(2), (1, 32, 64, 3))
    y_old, _ = A.apply(params, state, x, 0, variant=variant, training=False)
    y_new, _ = A.apply(new_p, new_s, x, 0, variant=variant, training=False)
    np.testing.assert_array_equal(np.asarray(y_old), np.asarray(y_new))


@pytest.mark.parametrize("model", ["erfnet_bn", "erfnet_RCM"])
@pytest.mark.slow
def test_step1_trainer_smoke(model, tmp_path):
    """One-epoch step-1 run per (cheap) representative variant."""
    cfg = C.step1(num_epochs=1, savedir=str(tmp_path / "run"), model=model, **TINY)
    tr = build_trainer(cfg)
    final = tr.fit()
    assert np.isfinite(final["train_loss"])


@pytest.mark.slow
def test_step2_trainer_distills_bn_variant(tmp_path):
    """DSBN-only incremental step 2: distill step runs and freezes old DS."""
    cfg = C.step2(num_epochs=1, savedir=str(tmp_path / "run"),
                  model="erfnet_bn", **TINY)
    tr = build_trainer(cfg)
    p_before = jax.tree.map(np.asarray, tr.ts.params)
    tr.fit()
    p_after = jax.tree.map(np.asarray, tr.ts.params)
    # old decoder frozen
    for a, b in zip(jax.tree.leaves(p_before["decoders"][0]),
                    jax.tree.leaves(p_after["decoders"][0])):
        np.testing.assert_array_equal(a, b)
    # old task's BN rows frozen, current task's moved
    g_b = p_before["encoder"]["group64"]["bns1"]["scale"]
    g_a = p_after["encoder"]["group64"]["bns1"]["scale"]
    np.testing.assert_array_equal(g_b[:, 0], g_a[:, 0])
    assert not np.allclose(g_b[:, 1], g_a[:, 1])


def test_fused_paths_rejected():
    params, state = A.init(jax.random.key(0), [5], 1, variant="bn")
    x = jnp.zeros((1, 32, 64, 3))
    with pytest.raises(ValueError, match="fused"):
        A.apply(params, state, x, 0, variant="bn", training=False, fused_infer=True)
