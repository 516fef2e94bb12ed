"""Pipeline chaining + expected-mIoU harness + orbax chains for every kind."""
import json
import os

import numpy as np
import pytest

import jax

from mdilss_tpu import config as C
from mdilss_tpu.evaluate import check_expected, load_expected
from mdilss_tpu.train.pipeline import run_pipeline
from mdilss_tpu.train.protocols import build_trainer

TINY = dict(synthetic=True, synthetic_size=4, batch_size=2, height=32, width=64,
            num_workers=2, num_epochs=1)


@pytest.mark.slow
def test_pipeline_chains_checkpoints(tmp_path):
    """One command runs step1->2->3 with each stage seeded from the previous
    stage's best (trainer_OURS.sh:49-63 as one entry point)."""
    results = run_pipeline(order="CS_BDD_IDD", savedir=str(tmp_path), common=TINY)
    assert set(results) == {"step1", "step2", "step3"}
    for stage in ("step1", "step2", "step3"):
        assert os.path.isdir(tmp_path / stage / "best"), stage
    # the chain actually loaded: step2's frozen task-0 decoder must equal
    # step1's best decoder (loaded verbatim, then frozen)
    from mdilss_tpu.ckpt import orbax_io
    from mdilss_tpu.models import erfnet_rap
    from mdilss_tpu.train import steps

    p1, b1 = erfnet_rap.init(jax.random.key(0), [20], 1)
    ts1, *_ = orbax_io.restore(str(tmp_path / "step1" / "best"),
                               steps.init_train_state(p1, b1))
    p2, b2 = erfnet_rap.init(jax.random.key(0), [20, 20], 2)
    ts2, *_ = orbax_io.restore(str(tmp_path / "step2" / "best"),
                               steps.init_train_state(p2, b2))
    np.testing.assert_array_equal(
        np.asarray(ts1.params["decoders"][0]["output_conv"]["w"]),
        np.asarray(ts2.params["decoders"][0]["output_conv"]["w"]),
    )


@pytest.mark.slow
def test_pipeline_skips_finished_stage(tmp_path, capsys):
    run_pipeline(order="CS_BDD_IDD", savedir=str(tmp_path), common=TINY,
                 stages=("step1",))
    results = run_pipeline(order="CS_BDD_IDD", savedir=str(tmp_path), common=TINY,
                           stages=("step1", "step2"))
    out = capsys.readouterr().out
    assert "step1: found existing" in out
    assert "step1" not in results and "step2" in results


def test_pipeline_baseline_chain_follows_order(monkeypatch, tmp_path):
    """--with-baselines derives the ft chain from --order (notebook cell 22's
    CS|IDD->BDD ft baseline must be producible by `pipeline --order
    CS_IDD_BDD --with-baselines`), not the hardcoded CS,BDD,IDD."""
    from mdilss_tpu.train import pipeline as P

    seen = {}

    class _Dummy:
        def __init__(self, cfg):
            self.cfg = cfg

        def fit(self):
            return {}

    def fake_build(cfg):
        seen[os.path.basename(cfg.savedir)] = cfg
        return _Dummy(cfg)

    monkeypatch.setattr(P, "build_trainer", fake_build)
    P.run_pipeline(order="CS_IDD_BDD", savedir=str(tmp_path),
                   with_baselines=True, common=TINY)
    assert seen["step2"].datasets == ("cityscapes", "IDD")
    assert seen["step3"].datasets == ("cityscapes", "IDD", "BDD")
    assert seen["ft_step2"].datasets == ("cityscapes", "IDD")
    assert seen["ft_step2"].num_classes == (20, 27)
    assert seen["ft_step3"].datasets == ("cityscapes", "IDD", "BDD")
    assert seen["ft_step3"].num_classes == (20, 27, 20)
    assert seen["ft_step3"].current_task == 2  # BDD is the head being trained


def test_pipeline_stage_subset_requires_predecessor(tmp_path):
    """--stages step3 without step2's checkpoint on disk must fail loudly —
    state=None would otherwise silently distill against a random teacher."""
    with pytest.raises(ValueError, match="step2"):
        run_pipeline(order="CS_BDD_IDD", savedir=str(tmp_path), common=TINY,
                     stages=("step3",))


@pytest.mark.slow
def test_pipeline_stage_subset_resolves_prev_from_disk(tmp_path):
    """Rerunning a later stage alone picks up the predecessor's best from the
    savedir (the crashed-pipeline-rerun workflow)."""
    run_pipeline(order="CS_BDD_IDD", savedir=str(tmp_path), common=TINY,
                 stages=("step1",))
    results = run_pipeline(order="CS_BDD_IDD", savedir=str(tmp_path),
                           common=TINY, stages=("step2",))
    assert "step2" in results
    # chained, not random: step2's frozen task-0 decoder equals step1's best
    from mdilss_tpu.ckpt import orbax_io
    from mdilss_tpu.models import erfnet_rap
    from mdilss_tpu.train import steps

    p1, b1 = erfnet_rap.init(jax.random.key(0), [20], 1)
    ts1, *_ = orbax_io.restore(str(tmp_path / "step1" / "best"),
                               steps.init_train_state(p1, b1))
    p2, b2 = erfnet_rap.init(jax.random.key(0), [20, 20], 2)
    ts2, *_ = orbax_io.restore(str(tmp_path / "step2" / "best"),
                               steps.init_train_state(p2, b2))
    np.testing.assert_array_equal(
        np.asarray(ts1.params["decoders"][0]["output_conv"]["w"]),
        np.asarray(ts2.params["decoders"][0]["output_conv"]["w"]),
    )


@pytest.mark.slow
def test_ft_chain_through_orbax(tmp_path):
    """ft 2-head run -> 3-head run seeded from its own Orbax best: the
    framework's FT chain no longer needs the torch format
    (main_FT2_flexible_new.py:200-213)."""
    cfg2 = C.ft_step(n_heads=2, savedir=str(tmp_path / "ft2"), **TINY)
    tr2 = build_trainer(cfg2)
    tr2.fit()
    cfg3 = C.ft_step(n_heads=3, savedir=str(tmp_path / "ft3"),
                     state=str(tmp_path / "ft2" / "best"), **TINY)
    tr3 = build_trainer(cfg3)
    # heads 0 and 1 come from the 2-head run's best checkpoint
    from mdilss_tpu.ckpt import orbax_io
    from mdilss_tpu.models import erfnet_multihead
    from mdilss_tpu.train import steps

    p0, b0 = erfnet_multihead.init(jax.random.key(0), [20, 20])
    best2, *_ = orbax_io.restore(str(tmp_path / "ft2" / "best"),
                                 steps.init_train_state(p0, b0))
    for head in (0, 1):
        np.testing.assert_array_equal(
            np.asarray(best2.params["decoders"][head]["output_conv"]["w"]),
            np.asarray(tr3.ts.params["decoders"][head]["output_conv"]["w"]),
        )


@pytest.mark.slow
def test_singletask_chain_through_orbax(tmp_path):
    """A singletask (erfnet-kind) Orbax run seeds an ft 2-head chain."""
    cfg1 = C.singletask("cityscapes", savedir=str(tmp_path / "st"), **TINY)
    tr1 = build_trainer(cfg1)
    tr1.fit()
    cfg2 = C.ft_step(n_heads=2, savedir=str(tmp_path / "ft2"),
                     state=str(tmp_path / "st" / "best"), **TINY)
    tr2 = build_trainer(cfg2)
    np.testing.assert_array_equal(
        np.asarray(tr1.ts.params["decoders"][0]["output_conv"]["w"]),
        np.asarray(tr2.ts.params["decoders"][0]["output_conv"]["w"]),
    )


@pytest.mark.slow
def test_plain_trainers_load_pretrained_encoder(tmp_path):
    """singletask/multitask honor the ImageNet-pretrained encoder init (the
    reference seeds both baselines from it: main.py --pretrainedEncoder via
    trainer_single_task.sh:46; train_multi_task.py:414-423 loads --state with
    the module.features->module rename, strict=False)."""
    import torch

    from mdilss_tpu.ckpt import export_state_dict
    from mdilss_tpu.models import erfnet_multihead

    rng = np.random.default_rng(0)
    p0, b0 = erfnet_multihead.init(jax.random.key(9), [20])
    base = export_state_dict(p0, b0, kind="multi_task")
    pretrained = {
        "module.features." + k: rng.standard_normal(v.shape).astype(np.float32)
        for k, v in base.items()
        if k.startswith("encoder.") and "conv" in k and "bn" not in k
    }
    assert pretrained, "no encoder conv keys found"
    pth = tmp_path / "enc.pth.tar"
    torch.save({"state_dict": pretrained}, str(pth))

    cfg = C.singletask("cityscapes", savedir=str(tmp_path / "st"),
                       pretrained_encoder=str(pth), **TINY)
    tr = build_trainer(cfg)
    got = export_state_dict(tr.ts.params, tr.ts.bn, kind="multi_task")
    for k, v in pretrained.items():
        np.testing.assert_array_equal(
            got[k.removeprefix("module.features.")], v, err_msg=k)

    # multitask accepts the encoder through --state, as the reference does
    cfg_mt = C.multitask(savedir=str(tmp_path / "mt"), state=str(pth), **TINY)
    tr_mt = build_trainer(cfg_mt)
    got_mt = export_state_dict(tr_mt.ts.params, tr_mt.ts.bn, kind="multi_task")
    for k, v in pretrained.items():
        np.testing.assert_array_equal(
            got_mt[k.removeprefix("module.features.")], v, err_msg=k)


@pytest.mark.slow
def test_pipeline_baseline_chain(tmp_path):
    """--with-baselines mirrors the reference's baseline chains: the ft
    2-head stage is seeded from the single-task Cityscapes stage's best
    (trainer_fine_tune.sh:54), ft3 from ft2 (:59)."""
    run_pipeline(order="CS_BDD_IDD", savedir=str(tmp_path), common=TINY,
                 stages=(), with_baselines=True)
    from mdilss_tpu.ckpt import orbax_io
    from mdilss_tpu.models import erfnet_multihead
    from mdilss_tpu.train import steps

    for stage in ("single_cs", "ft_step2", "ft_step3", "multitask"):
        assert os.path.isdir(tmp_path / stage / "best"), stage
    p1, b1 = erfnet_multihead.init(jax.random.key(0), [20])
    st, *_ = orbax_io.restore(str(tmp_path / "single_cs" / "best"),
                              steps.init_train_state(p1, b1))
    p2, b2 = erfnet_multihead.init(jax.random.key(0), [20, 20])
    # rebuild ft2's INITIAL state from the chain (its trained best has moved
    # on) — head 0 must start as single_cs's best decoder
    ft2 = build_trainer(C.ft_step(
        n_heads=2, savedir=str(tmp_path / "ft2_rebuild"),
        state=str(tmp_path / "single_cs" / "best"), **TINY))
    np.testing.assert_array_equal(
        np.asarray(st.params["decoders"][0]["output_conv"]["w"]),
        np.asarray(ft2.ts.params["decoders"][0]["output_conv"]["w"]),
    )


def test_expected_miou_table_loads():
    exp = load_expected("step3_CS_BDD_IDD")
    assert exp == {"cityscapes": 0.5919, "BDD": 0.4966, "IDD": 0.5916}
    with pytest.raises(KeyError):
        load_expected("nonsense")


def test_check_expected_tolerance():
    ok, report = check_expected(
        {"cityscapes": 0.7190}, "step1", tolerance_points=0.5)
    assert ok and "OK" in report
    ok, report = check_expected(
        {"cityscapes": 0.7000}, "step1", tolerance_points=0.5)
    assert not ok and "FAIL" in report
    ok, report = check_expected({}, "step1")
    assert not ok and "not evaluated" in report
