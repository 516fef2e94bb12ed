"""Jittable train/eval steps for every training protocol of the reference.

Each maker closes over static configuration (task indices, class weights, the
LR tree, schedule length) and returns a pure function suitable for `jax.jit`
(the trainer loop jits it once with donated train state). Teacher and student
run inside the same step — the reference's step-3 GPU3->CPU->GPU0 activation
shipping (train_new_task_step3.py:310-340) disappears entirely on TPU.

Protocol fidelity notes:
  * Student forwards on *previous* tasks run in training mode (batch-stat BN +
    active dropout) exactly like the reference's `model(inputs, task-1)` under
    model.train() (train_new_task_step2.py:285-291); the teacher runs in eval
    mode (`model_old.eval()`, :272).
  * BN running stats thread through the forwards in reference order (current
    task first, then previous tasks newest-to-oldest).
  * Step 3's two optimizer steps per batch — CE first, then the summed KLDs
    against the *already-updated* weights (train_new_task_step3.py:317-356) —
    are reproduced by `make_two_phase_distill_step`. The fused single-backward
    variant (`make_distill_step` with 2 prev tasks) is the recommended fast
    path; fidelity is a flag, not a rewrite.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..losses import kld_faithful, weighted_cross_entropy
from ..metrics import confusion_matrix
from ..ops import pack_subpixel_targets, unpack_subpixel
from .optim import AdamState, apply_updates, poly_lr_factor
from . import optim


class TrainState(NamedTuple):
    params: Any
    bn: Any  # BatchNorm running-stats pytree
    opt: AdamState


class ModelState(NamedTuple):
    """Frozen teacher: params + BN running stats."""

    params: Any
    bn: Any


def _host_const(x):
    """Keep closure constants host-resident: device-resident constants are
    fetched back through the (slow) device tunnel at every lowering."""
    import numpy as np

    return np.asarray(x)


def init_train_state(params, bn) -> TrainState:
    return TrainState(params=params, bn=bn, opt=optim.init(params))


# Apply signature used throughout: apply_fn(params, bn, x, task, training=..., rng=...)
ApplyFn = Callable[..., tuple[jax.Array, Any]]


def _split(rng, n: int):
    """Split an optional PRNG key; rng=None disables dropout deterministically
    (used for trajectory-parity tests and would-be inference-time training)."""
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


def _fold_images(images):
    """Space-to-depth-fold the batch ONCE per step, outside every autodiff /
    remat region, so the step's several forwards over the same batch (current
    + previous tasks, teacher, remat replays) share one folded tensor instead
    of each paying the fold's layout copy (profiled ~0.7-0.9 ms per forward
    at 512x1024 bs-6; see models/blocks.fold_input).

    Returns (maybe_folded_images, folded: bool) — odd spatial dims skip the
    fold (the downsampler's conv path handles them)."""
    from ..models.blocks import fold_input

    if images.shape[1] % 2 == 0 and images.shape[2] % 2 == 0:
        return fold_input(images), True
    return images, False


def _train_cm(logits, labels, num_classes: int):
    """Confusion matrix of the training batch from the already-computed
    current-task logits (the reference's --iouTrain,
    train_RAPFT_step1.py:269-317) — fused into the train step, no extra
    forward."""
    preds = unpack_subpixel(
        jnp.argmax(jax.lax.stop_gradient(logits), axis=-1).astype(jnp.int32)
    )
    return confusion_matrix(preds, labels, num_classes=num_classes)


def make_ce_step(
    apply_fn: ApplyFn,
    *,
    task: int,
    class_weight: jax.Array,
    lr_tree,
    num_epochs: int,
    weight_decay: float = 1e-4,
    iou_train: bool = False,
):
    """Plain weighted-CE training step (step 1 / multi-task domain turn / FT).

    step(ts, images, labels, masks, rng, epoch) -> (ts', metrics)
    `masks` are host-generated dropout masks (topology.make_dropout_masks) or
    None (falls back to in-program RNG — slow on the axon runtime).
    `iou_train` adds the batch confusion matrix to metrics ("cm").
    """
    class_weight = _host_const(class_weight)

    def step(ts: TrainState, images, labels, masks, rng, epoch):
        labels_p = pack_subpixel_targets(labels)
        images, folded = _fold_images(images)

        def loss_fn(p):
            logits, new_bn = apply_fn(
                p, ts.bn, images, task, training=True, rng=rng, drop_masks=masks,
                packed_head=True, input_folded=folded,
            )
            return weighted_cross_entropy(logits, labels_p, class_weight), (new_bn, logits)

        (loss, (new_bn, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        new_p, new_opt = apply_updates(
            ts.params, grads, ts.opt, lr_tree,
            lr_scale=poly_lr_factor(epoch, num_epochs), weight_decay=weight_decay,
        )
        metrics = {"loss": loss, "ce": loss}
        if iou_train:
            metrics["cm"] = _train_cm(logits, labels, len(class_weight))
        return TrainState(new_p, new_bn, new_opt), metrics

    return step


def make_distill_step(
    apply_fn: ApplyFn,
    *,
    current_task: int,
    prev_tasks: Sequence[int],
    class_weight: jax.Array,
    lr_tree,
    num_epochs: int,
    lambda_c: float = 0.1,
    kld_fn=kld_faithful,
    weight_decay: float = 1e-4,
    remat_prev: bool = True,
    iou_train: bool = False,
):
    """Single-backward distillation step (the proposed method's step 2; also
    the fused fast path for step 3): total = CE + lambda_c * sum KLD_prev
    (train_new_task_step2.py:285-306).

    `remat_prev` checkpoints the previous-task student forwards: their
    activations are recomputed in the backward pass instead of stored, cutting
    peak HBM by roughly one forward per previous task (numerically identical).

    step(ts, teacher, images, labels, rng, epoch) -> (ts', metrics)
    """
    class_weight = _host_const(class_weight)
    t_apply = apply_fn

    def step(ts: TrainState, teacher: ModelState, images, labels, masks, rng, epoch):
        rngs = _split(rng, 1 + len(prev_tasks))
        mask_list = masks if isinstance(masks, (list, tuple)) else [masks] * (1 + len(prev_tasks))
        labels_p = pack_subpixel_targets(labels)
        images, folded = _fold_images(images)

        def loss_fn(p):
            bn = ts.bn
            logits, bn = apply_fn(
                p, bn, images, current_task, training=True, rng=rngs[0], drop_masks=mask_list[0],
                packed_head=True, input_folded=folded,
            )
            ce = weighted_cross_entropy(logits, labels_p, class_weight)
            kld = jnp.float32(0.0)
            for i, t in enumerate(prev_tasks):
                prev_fwd = lambda p_, bn_, x_, r_, mk_, t=t: apply_fn(
                    p_, bn_, x_, t, training=True, rng=r_, drop_masks=mk_,
                    packed_head=True, input_folded=folded,
                )
                if remat_prev:
                    prev_fwd = jax.checkpoint(prev_fwd)
                s_logits, bn = prev_fwd(p, bn, images, rngs[1 + i], mask_list[1 + i])
                t_logits, _ = t_apply(teacher.params, teacher.bn, images, t, training=False,
                                      packed_head=True, input_folded=folded)
                kld = kld + kld_fn(s_logits, jax.lax.stop_gradient(t_logits))
            return ce + lambda_c * kld, (bn, ce, kld, logits)

        (total, (new_bn, ce, kld, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        new_p, new_opt = apply_updates(
            ts.params, grads, ts.opt, lr_tree,
            lr_scale=poly_lr_factor(epoch, num_epochs), weight_decay=weight_decay,
        )
        metrics = {"loss": total, "ce": ce, "kld": kld}
        if iou_train:
            metrics["cm"] = _train_cm(logits, labels, len(class_weight))
        return TrainState(new_p, new_bn, new_opt), metrics

    return step


def make_two_phase_distill_step(
    apply_fn: ApplyFn,
    *,
    current_task: int,
    prev_tasks: Sequence[int],
    class_weight: jax.Array,
    lr_tree,
    num_epochs: int,
    lambda_c: float = 0.1,
    kld_fn=kld_faithful,
    weight_decay: float = 1e-4,
    iou_train: bool = False,
    teacher_training: bool = True,
    teacher_dropout: bool = False,
):
    """Faithful step-3 trajectory: backward+Adam on CE, then backward+Adam on
    lambda_c * (sum of previous-task KLDs) against the updated weights —
    two optimizer steps per batch (train_new_task_step3.py:317-356).

    `teacher_training=True` (default) reproduces a subtle reference detail:
    unlike step 2 (model_old.eval(), train_new_task_step2.py:272), the step-3
    trainer NEVER switches the teacher to eval mode — model_old stays in its
    construction-time train mode (train_new_task_step3.py:534-549, no .eval()
    anywhere), so its BN normalizes with the CURRENT BATCH's statistics, not
    running stats. That is what produced the paper numbers, so it is the
    default here; the teacher's running-stat buffers do update in the
    reference but are never read (the teacher is never evaluated) and are
    therefore not threaded out.

    The reference teacher also had ACTIVE Dropout2d (the other train-mode
    consequence) — independent channel noise on the KD target. That is off by
    default here; `teacher_dropout=True` reproduces it by feeding the teacher
    forwards their own host-generated masks (the step's `masks` argument then
    carries 1 + 2*len(prev_tasks) mask dicts: student forwards first, then
    one per teacher forward). Measured A/B on the learnable synthetic task
    (tools/teacher_dropout_exp.py, docs/DESIGN.md "Step-3 teacher dropout"):
    the noise is immaterial to final quality, hence the cleaner default.
    `teacher_training=False` gives the step-2-style eval-mode teacher.

    step(ts, teacher, images, labels, masks, rng, epoch) -> (ts', metrics)
    """
    if teacher_dropout and not teacher_training:
        raise ValueError(
            "teacher_dropout=True requires teacher_training=True (dropout is "
            "a train-mode behavior; the reference's eval-mode teacher in "
            "step 2 has neither)"
        )
    class_weight = _host_const(class_weight)
    t_apply = apply_fn

    n_masks = 1 + len(prev_tasks) * (2 if teacher_dropout else 1)

    def step(ts: TrainState, teacher: ModelState, images, labels, masks, rng, epoch):
        rngs = _split(rng, 1 + len(prev_tasks))
        mask_list = masks if isinstance(masks, (list, tuple)) else [masks] * n_masks
        lr_scale = poly_lr_factor(epoch, num_epochs)

        labels_p = pack_subpixel_targets(labels)
        images, folded = _fold_images(images)

        def ce_loss(p):
            logits, bn = apply_fn(
                p, ts.bn, images, current_task, training=True, rng=rngs[0], drop_masks=mask_list[0],
                packed_head=True, input_folded=folded,
            )
            return weighted_cross_entropy(logits, labels_p, class_weight), (bn, logits)

        (ce, (bn1, logits)), g1 = jax.value_and_grad(ce_loss, has_aux=True)(ts.params)
        p1, opt1 = apply_updates(
            ts.params, g1, ts.opt, lr_tree, lr_scale=lr_scale, weight_decay=weight_decay
        )

        def kd_loss(p):
            bn = bn1
            kld = jnp.float32(0.0)
            for i, t in enumerate(prev_tasks):
                prev_fwd = jax.checkpoint(
                    lambda p_, bn_, x_, r_, mk_, t=t: apply_fn(
                        p_, bn_, x_, t, training=True, rng=r_, drop_masks=mk_,
                        packed_head=True, input_folded=folded,
                    )
                )
                s_logits, bn = prev_fwd(p, bn, images, rngs[1 + i], mask_list[1 + i])
                # teacher_training=True: batch-stat BN, updated stats discarded
                # (never read by the reference either); dropout only under
                # teacher_dropout (its masks follow the student's in the list)
                t_masks = (mask_list[1 + len(prev_tasks) + i]
                           if teacher_dropout else None)
                t_logits, _ = t_apply(teacher.params, teacher.bn, images, t,
                                      training=teacher_training, rng=None,
                                      drop_masks=t_masks,
                                      packed_head=True, input_folded=folded)
                kld = kld + kld_fn(s_logits, jax.lax.stop_gradient(t_logits))
            return lambda_c * kld, (bn, kld)

        (kd, (bn2, kld)), g2 = jax.value_and_grad(kd_loss, has_aux=True)(p1)
        p2, opt2 = apply_updates(
            p1, g2, opt1, lr_tree, lr_scale=lr_scale, weight_decay=weight_decay
        )
        metrics = {"loss": ce + kd, "ce": ce, "kld": kld}
        if iou_train:
            metrics["cm"] = _train_cm(logits, labels, len(class_weight))
        return TrainState(p2, bn2, opt2), metrics

    return step


def make_eval_step(apply_fn: ApplyFn, *, task: int, class_weight: jax.Array, num_classes: int):
    """Fused eval step: forward -> weighted CE -> argmax -> confusion matrix,
    all on device. The host accumulates [C,C] int32 matrices (metrics.py).

    step(params, bn, images, labels) -> (loss, cm)
    """
    class_weight = _host_const(class_weight)

    def step(params, bn, images, labels):
        logits, _ = apply_fn(params, bn, images, task, training=False, packed_head=True)
        loss = weighted_cross_entropy(logits, pack_subpixel_targets(labels), class_weight)
        preds = unpack_subpixel(jnp.argmax(logits, axis=-1).astype(jnp.int32))
        return loss, confusion_matrix(preds, labels, num_classes=num_classes)

    return step
