"""Experiment: does the step-3 teacher's LIVE Dropout2d matter?

The reference's step-3 trainer never switches the frozen teacher to eval mode
(train_new_task_step3.py:534-549 — no .eval() anywhere), so model_old's KD
targets carried BOTH batch-stat BN (reproduced by default,
steps.make_two_phase_distill_step teacher_training=True) AND active Dropout2d
channel noise. The rebuild ships the noise behind `teacher_dropout=True` but
defaulted it off on the argument that pure noise on a distillation target is
immaterial — an argument, not a measurement (round-4 verdict, "What's
missing" #3). This script is the measurement, in the same harness style as
tools/bn_semantics.py:

  Phase 0 (shared): train a 1-task RAP model on learnable-synthetic domain A
  (30 epochs) — the frozen teacher.
  Phase 1 (A/B): grow it by one task (ckpt surgery), then train the student
  on domain B with the faithful two-phase step (CE then KD, two Adam steps
  per batch), same seeds/batches in both arms:
    arm "nodrop": teacher forwards without dropout (the shipped default)
    arm "drop":   teacher forwards with live Dropout2d masks (the
                  reference's actual behavior)
  Report per-10-epoch val mIoU on the NEW domain and the OLD domain (KD's
  whole job is protecting the latter), final parameter divergence, and the
  mean |KLD| seen in training.

Run:  JAX_PLATFORMS=cpu python tools/teacher_dropout_exp.py
Findings recorded in docs/DESIGN.md ("Step-3 teacher dropout").
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import os

import jax

# honor JAX_PLATFORMS even where a site PJRT plugin pinned the platform at
# import (env alone does not win there; see .claude/skills/verify/SKILL.md)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from mdilss_tpu.ckpt import extend_for_new_task
from mdilss_tpu.data.loader import LearnableSource, Loader
from mdilss_tpu.data.transforms import augment_batch, prepare_batch
from mdilss_tpu.metrics import IoUEvaluator, confusion_matrix
from mdilss_tpu.models import erfnet_rap
from mdilss_tpu.models.topology import make_dropout_masks
from mdilss_tpu.ops import unpack_subpixel
from mdilss_tpu.train import masks, steps

NC = 6
TEACHER_EPOCHS = 30
EPOCHS = 40
BS = 4
H, W = 64, 128
LR = 2e-3
SHARED_LR = 1e-5  # reference-style tiny shared-encoder LR (scaled to the task)
LAMBDA_C = 0.1

DOM_A_TRAIN, DOM_A_VAL = 11, 22
DOM_B_TRAIN, DOM_B_VAL = 33, 44


def _loader(seed, n=16, shuffle=True):
    src = LearnableSource(NC, n=n, height=H, width=W, seed=seed)
    return Loader(src, batch_size=BS, height=H, width=W, shuffle=shuffle,
                  num_threads=2, seed=0)


def _eval_miou(params, bn, task, seed):
    @jax.jit
    def cm(p, s, x, y):
        logits, _ = erfnet_rap.apply(p, s, x, task, training=False, packed_head=True)
        preds = unpack_subpixel(jnp.argmax(logits, -1).astype(jnp.int32))
        return confusion_matrix(preds, y, num_classes=NC)

    ev = IoUEvaluator(NC, NC - 1)
    for imgs, lbls, _ in _loader(seed, n=8, shuffle=False):
        x, y = prepare_batch(jnp.asarray(imgs), jnp.asarray(lbls), num_classes=NC)
        ev.add_confusion(cm(params, bn, x, y))
    return float(ev.get_iou()[0])


def train_teacher():
    params, bn = erfnet_rap.init(jax.random.key(0), [NC], 1)
    lr_tree = masks.rap_lr_tree(params, current_task=0, shared_lr=LR, ds_lr=LR)
    w = np.ones(NC, np.float32)
    w[-1] = 0.0
    step = jax.jit(steps.make_ce_step(
        erfnet_rap.apply, task=0, class_weight=w, lr_tree=lr_tree,
        num_epochs=TEACHER_EPOCHS,
    ), donate_argnums=(0,))
    ts = steps.init_train_state(params, bn)
    ld = _loader(DOM_A_TRAIN)
    rng = jax.random.key(1)
    np_rng = np.random.default_rng(2)
    for epoch in range(1, TEACHER_EPOCHS + 1):
        ld.set_epoch(epoch)
        for imgs, lbls, _ in ld:
            rng, k = jax.random.split(rng)
            x, y = augment_batch(jnp.asarray(imgs), jnp.asarray(lbls), k, num_classes=NC)
            ts, _ = step(ts, x, y, make_dropout_masks(np_rng, BS), None, epoch)
    miou = _eval_miou(ts.params, ts.bn, 0, DOM_A_VAL)
    print(f"teacher: domain-A val mIoU {miou:.4f} after {TEACHER_EPOCHS} epochs")
    return ts.params, ts.bn


def run_arm(teacher_p, teacher_b, *, teacher_dropout: bool) -> dict:
    # fresh buffers per arm: the jitted step donates the student state, whose
    # shared-weight leaves alias the surgery inputs — without copies, arm 1's
    # donation deletes arm 2's teacher (train/protocols.py documents the same
    # hazard for the production path)
    teacher_p = jax.tree.map(jnp.array, teacher_p)
    teacher_b = jax.tree.map(jnp.array, teacher_b)
    student_p, student_b = extend_for_new_task(
        teacher_p, teacher_b, NC, jax.random.key(3)
    )
    lr_tree = masks.rap_lr_tree(student_p, current_task=1,
                                shared_lr=SHARED_LR, ds_lr=LR)
    w = np.ones(NC, np.float32)
    w[-1] = 0.0
    step = jax.jit(steps.make_two_phase_distill_step(
        erfnet_rap.apply, current_task=1, prev_tasks=(0,), class_weight=w,
        lr_tree=lr_tree, num_epochs=EPOCHS, lambda_c=LAMBDA_C,
        teacher_dropout=teacher_dropout,
    ), donate_argnums=(0,))
    teacher = steps.ModelState(jax.tree.map(jnp.array, teacher_p),
                               jax.tree.map(jnp.array, teacher_b))
    ts = steps.init_train_state(student_p, student_b)
    ld = _loader(DOM_B_TRAIN)
    rng = jax.random.key(4)
    np_rng = np.random.default_rng(5)
    curve = []
    klds = []
    n_masks = 2 + (1 if teacher_dropout else 0)
    for epoch in range(1, EPOCHS + 1):
        ld.set_epoch(epoch)
        for imgs, lbls, _ in ld:
            rng, k = jax.random.split(rng)
            x, y = augment_batch(jnp.asarray(imgs), jnp.asarray(lbls), k, num_classes=NC)
            mks = [make_dropout_masks(np_rng, BS) for _ in range(n_masks)]
            ts, m = step(ts, teacher, x, y, mks, None, epoch)
            klds.append(float(m["kld"]))
        if epoch % 10 == 0:
            new = _eval_miou(ts.params, ts.bn, 1, DOM_B_VAL)
            old = _eval_miou(ts.params, ts.bn, 0, DOM_A_VAL)
            curve.append((epoch, round(new, 4), round(old, 4)))
            tag = "drop" if teacher_dropout else "nodrop"
            print(f"  [{tag}] epoch {epoch}: new-domain {new:.4f}  old-domain {old:.4f}")
    return {"curve": curve, "params": ts.params,
            "mean_abs_kld": float(np.mean(np.abs(klds)))}


def main():
    t0 = time.time()
    teacher_p, teacher_b = train_teacher()
    res = {}
    for td in (False, True):
        # identical seeds/batches across arms: the ONLY difference is the
        # teacher's dropout noise (and the np_rng stream consuming one extra
        # mask per batch in the drop arm — the student masks stay aligned
        # because they are drawn first within each batch)
        res["drop" if td else "nodrop"] = run_arm(
            teacher_p, teacher_b, teacher_dropout=td
        )
    num = den = 0.0
    for a, b in zip(jax.tree.leaves(res["nodrop"]["params"]),
                    jax.tree.leaves(res["drop"]["params"])):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        num += float(np.sum((a - b) ** 2))
        den += float(np.sum(a ** 2))
    print("curves (epoch, new-domain mIoU, old-domain mIoU):")
    for k, v in res.items():
        print(f"  {k}: {v['curve']}  mean|KLD| {v['mean_abs_kld']:.5f}")
    print(f"relative param L2 divergence: {np.sqrt(num / den):.4f}")
    print(f"wall: {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
