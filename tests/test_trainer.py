"""Trainer-loop tests: artifacts, checkpoint round-trip, resume, protocols."""
import json
import os

import numpy as np
import pytest

import jax

from mdilss_tpu import config as C
from mdilss_tpu.ckpt import orbax_io
from mdilss_tpu.models import erfnet_rap
from mdilss_tpu.train import steps
from mdilss_tpu.train.protocols import build_trainer

TINY = dict(synthetic=True, synthetic_size=4, batch_size=2, height=32, width=64,
            num_workers=2)


def test_step1_trainer_artifacts(tmp_path):
    cfg = C.step1(num_epochs=2, savedir=str(tmp_path / "run"), **TINY)
    tr = build_trainer(cfg)
    final = tr.fit()
    assert np.isfinite(final["train_loss"])
    for f in ("opts.txt", "model.txt", "automated_log.txt", "best.txt", "metrics.jsonl"):
        assert (tmp_path / "run" / f).exists(), f
    rows = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert [r["epoch"] for r in rows] == [1, 2]
    log = open(tmp_path / "run" / "automated_log.txt").read()
    assert log.startswith("Epoch\t\tTrain-loss")
    assert len(log.strip().splitlines()) == 3  # header + 2 epochs


def test_orbax_round_trip(tmp_path):
    params, bn = erfnet_rap.init(jax.random.key(0), [6], 1)
    ts = steps.init_train_state(params, bn)
    rng = jax.random.key(5)
    orbax_io.save(str(tmp_path / "ck"), 3, ts, best_acc=0.42, rng=rng)
    ts2, epoch, best, rng2 = orbax_io.restore(str(tmp_path / "ck"), ts)
    assert epoch == 3 and best == pytest.approx(0.42)
    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        jax.random.key_data(rng), jax.random.key_data(rng2)
    )


@pytest.mark.slow
def test_resume_bit_equivalent(tmp_path):
    """Interrupt-and-resume is EXACTLY the uninterrupted run: 2 epochs +
    restore + 2 epochs ends bit-identical (params, Adam moments, BN state,
    PRNG stream) to 4 straight epochs. This is the property the full-state
    Orbax restore (ckpt/orbax_io.py) exists to provide — the reference's
    --resume was parsed and never used (train_RAPFT_step1.py:547). Exercises
    every restored piece: per-epoch (seed, epoch)-keyed mask RNG, jax PRNG
    key, optimizer moments/count, BN running stats, epoch-seeded data order."""
    kw = dict(num_epochs=4, **TINY)
    cfg_a = C.step1(savedir=str(tmp_path / "a"), **kw)
    tr_a = build_trainer(cfg_a)
    tr_a.fit()

    cfg_b1 = C.step1(savedir=str(tmp_path / "b"), **kw)
    build_trainer(cfg_b1).fit(stop_after=2)
    cfg_b2 = C.step1(savedir=str(tmp_path / "b"), resume=True, **kw)
    tr_b = build_trainer(cfg_b2)
    assert tr_b.start_epoch == 3
    tr_b.fit()

    for name, a, b in (
        ("params", tr_a.ts.params, tr_b.ts.params),
        ("bn", tr_a.ts.bn, tr_b.ts.bn),
        ("opt_m", tr_a.ts.opt.m, tr_b.ts.opt.m),
        ("opt_v", tr_a.ts.opt.v, tr_b.ts.opt.v),
    ):
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(la) == len(lb) and la, name
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)
    assert int(tr_a.ts.opt.count) == int(tr_b.ts.opt.count)
    np.testing.assert_array_equal(
        jax.random.key_data(tr_a.rng), jax.random.key_data(tr_b.rng)
    )
    rows = [json.loads(l) for l in open(tmp_path / "b" / "metrics.jsonl")]
    assert [r["epoch"] for r in rows] == [1, 2, 3, 4]


def test_resume_continues(tmp_path):
    cfg = C.step1(num_epochs=2, savedir=str(tmp_path / "run"), resume=True, **TINY)
    build_trainer(cfg).fit()
    cfg2 = C.step1(num_epochs=4, savedir=str(tmp_path / "run"), resume=True, **TINY)
    tr2 = build_trainer(cfg2)
    assert tr2.start_epoch == 3
    tr2.fit()
    rows = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert [r["epoch"] for r in rows] == [1, 2, 3, 4]


@pytest.mark.slow
def test_step2_trainer_distills_and_freezes(tmp_path):
    cfg = C.step2(num_epochs=1, savedir=str(tmp_path / "run"), **TINY)
    tr = build_trainer(cfg)
    before_dec0 = np.asarray(tr.ts.params["decoders"][0]["output_conv"]["w"]).copy()
    teacher_before = np.asarray(tr.teacher.params["encoder"]["down1"]["conv"]["w"]).copy()
    final = tr.fit()
    assert "train_kld" in final and np.isfinite(final["train_kld"])
    assert "val_acc_cityscapes" in final  # old task validated
    # old decoder frozen; teacher untouched
    np.testing.assert_array_equal(
        np.asarray(tr.ts.params["decoders"][0]["output_conv"]["w"]), before_dec0
    )
    np.testing.assert_array_equal(
        np.asarray(tr.teacher.params["encoder"]["down1"]["conv"]["w"]), teacher_before
    )


@pytest.mark.slow
def test_step3_two_phase_runs(tmp_path):
    cfg = C.step3(num_epochs=1, savedir=str(tmp_path / "run"),
                  eval_old_every=1, **TINY)
    tr = build_trainer(cfg)
    final = tr.fit()
    assert int(tr.ts.opt.count) == 2 * 2  # 2 batches x 2 optimizer steps
    assert "val_acc_BDD" in final and "val_acc_cityscapes" in final


@pytest.mark.slow
def test_multitask_round_robin(tmp_path):
    cfg = C.multitask(num_epochs=1, eval_every=1, savedir=str(tmp_path / "run"), **TINY)
    tr = build_trainer(cfg)
    final = tr.fit()
    # one update per domain per iteration: 2 iters x 3 domains
    assert int(tr.ts.opt.count) == 6


def test_ft_freezes_encoder_in_fe_mode(tmp_path):
    cfg = C.ft_step(n_heads=2, finetune=False, num_epochs=1,
                    savedir=str(tmp_path / "run"), **TINY)
    tr = build_trainer(cfg)
    enc_before = np.asarray(tr.ts.params["encoder"]["down1"]["conv"]["w"]).copy()
    head0_before = np.asarray(tr.ts.params["decoders"][0]["output_conv"]["w"]).copy()
    tr.fit()
    np.testing.assert_array_equal(
        np.asarray(tr.ts.params["encoder"]["down1"]["conv"]["w"]), enc_before
    )
    np.testing.assert_array_equal(
        np.asarray(tr.ts.params["decoders"][0]["output_conv"]["w"]), head0_before
    )
    assert not np.allclose(
        np.asarray(tr.ts.params["decoders"][1]["output_conv"]["w"]), head0_before
    )


def test_singletask_trainer(tmp_path):
    """Independent single-task ERFNet baseline: whole model trains at base LR."""
    cfg = C.singletask("cityscapes", num_epochs=1, savedir=str(tmp_path / "run"), **TINY)
    tr = build_trainer(cfg)
    p_before = jax.tree.map(np.asarray, tr.ts.params)
    final = tr.fit()
    assert np.isfinite(final["train_loss"])
    # both encoder and decoder moved (no frozen groups)
    enc_moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(p_before["encoder"]), jax.tree.leaves(tr.ts.params["encoder"]))
    )
    dec_moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(p_before["decoders"]), jax.tree.leaves(tr.ts.params["decoders"]))
    )
    assert enc_moved and dec_moved


def test_uneval_epoch_never_best(tmp_path):
    """With eval_every=2 only evaluated epochs may write best/ — an
    uneval'd epoch's -0.0 placeholder must not win (reference compares
    val-IoU epochs only, train_RAPFT_step1.py:347-352)."""
    cfg = C.step1(num_epochs=4, eval_every=2, savedir=str(tmp_path / "run"), **TINY)
    tr = build_trainer(cfg)
    tr.fit()
    # epochs 2 and 4 evaluated (the final epoch always does); 1 and 3 did not
    # and must never hold best/
    best_txt = open(tmp_path / "run" / "best.txt").read()
    _, epoch, _, _ = orbax_io.restore(
        str(tmp_path / "run" / "best"), tr.ts
    )
    assert epoch in (2, 4), best_txt


@pytest.mark.slow
def test_multitask_uneval_epoch_never_best(tmp_path):
    """Multitask: epochs where only the OTHER domains were validated
    (eval_old_every < eval_every) must not compete for best — a 2-domain
    mean must never shadow the all-domain mean the reference compares
    (train_multi_task.py:304-308)."""
    cfg = C.multitask(num_epochs=2, eval_every=2, eval_old_every=1,
                      savedir=str(tmp_path / "run"), **TINY)
    tr = build_trainer(cfg)
    tr.fit()
    best_txt = open(tmp_path / "run" / "best.txt").read()
    assert "Best epoch is 2" in best_txt, best_txt
    _, epoch, _, _ = orbax_io.restore(str(tmp_path / "run" / "best"), tr.ts)
    assert epoch == 2


@pytest.mark.slow
def test_iou_train_column(tmp_path):
    """--iou-train fills the automated_log Train-IoU column from the fused
    in-step confusion matrix (reference --iouTrain, train_RAPFT_step1.py:311)."""
    cfg = C.step1(num_epochs=1, iou_train=True, savedir=str(tmp_path / "run"), **TINY)
    tr = build_trainer(cfg)
    final = tr.fit()
    assert 0.0 <= final["train_iou"] <= 1.0
    row = open(tmp_path / "run" / "automated_log.txt").read().strip().splitlines()[-1]
    train_iou = float(row.split("\t\t")[3])
    assert train_iou == pytest.approx(final["train_iou"], abs=1e-4)


@pytest.mark.slow
def test_profiler_trace_written(tmp_path):
    cfg = C.step1(num_epochs=1, savedir=str(tmp_path / "run"),
                  profile_dir=str(tmp_path / "trace"), profile_steps=1, **TINY)
    tr = build_trainer(cfg)
    tr._tracer.start = 0  # tiny run: trace from the first batch
    tr.fit()
    found = [f for _, _, fs in os.walk(tmp_path / "trace") for f in fs]
    assert any(f.endswith((".trace.json.gz", ".xplane.pb")) for f in found), found


def test_accumulate_cms_is_overflow_safe():
    """Epoch confusion-matrix accumulation must not wrap int32: with x64
    disabled the per-batch device matrices are int32, and a val set with
    >2^31 pixels in one cell would silently go negative under a naive
    device-side sum (round-4 advisor finding). _accumulate_cms chunks the
    device reduction so each partial sum stays below 2^31 and accumulates the
    chunks on host in int64."""
    import jax.numpy as jnp

    from mdilss_tpu.metrics import IoUEvaluator
    from mdilss_tpu.train.loop import _accumulate_cms

    batch_pixels = 2**30  # each batch puts 2^30 counts in cell (0,0)
    cm = jnp.zeros((3, 3), jnp.int32).at[0, 0].set(batch_pixels)
    cms = [cm, cm, cm]  # naive int32 sum: 3*2^30 wraps negative

    ev = IoUEvaluator(3, ignore_index=2)
    _accumulate_cms(ev, cms, batch_pixels)
    assert ev._cm[0, 0] == 3 * 2**30  # > int32 max, exact in int64

    # sanity on the naive sum actually wrapping (guards the test's premise)
    assert int((cm + cm + cm)[0, 0]) < 0
