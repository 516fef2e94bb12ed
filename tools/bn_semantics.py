"""Experiment: sync-BN (ours) vs per-replica BN (reference DataParallel).

SURVEY.md §7.3 flagged the open decision: torch DataParallel computes BN batch
statistics PER REPLICA (batch 3 per GPU at bs 6 on 2 GPUs,
train_RAPFT_step1.py:463), while the TPU rebuild normalizes over the global
batch under the mesh (sync-BN, ops/norm.py). This script measures what that
changes: two trainings from the same init on the same data/seeds —

  A. sync-BN:      one forward over the full batch (the framework's step)
  B. per-replica:  the batch split in two halves, each forward normalizing
                   over its own half (exactly DataParallel's per-GPU stats;
                   loss still the mean over the full gathered batch, and
                   running stats tracked from replica 0 only, which is what
                   torch DP's buffer handling keeps)

and reports per-epoch val mIoU + final parameter divergence on the learnable
synthetic task. Run on CPU or TPU:

    JAX_PLATFORMS=cpu python tools/bn_semantics.py

Findings recorded in docs/DESIGN.md ("BatchNorm semantics").
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mdilss_tpu.config import TrainConfig
from mdilss_tpu.data.loader import LearnableSource, Loader
from mdilss_tpu.data.transforms import augment_batch, prepare_batch
from mdilss_tpu.metrics import IoUEvaluator, confusion_matrix
from mdilss_tpu.models import erfnet_rap
from mdilss_tpu.models.topology import make_dropout_masks
from mdilss_tpu.train import masks, steps
from mdilss_tpu.losses import weighted_cross_entropy
from mdilss_tpu.ops import pack_subpixel_targets, unpack_subpixel
from mdilss_tpu.train.optim import apply_updates, poly_lr_factor

NC = 6
EPOCHS = 40
BS = 4
H, W = 64, 128
LR = 2e-3


def make_replica_ce_step(apply_fn, *, task, class_weight, lr_tree, num_epochs,
                         n_replicas=2):
    """CE step with DataParallel BN semantics: per-replica batch stats,
    replica-0 running stats, loss over the gathered full batch."""
    class_weight = np.asarray(class_weight)

    def step(ts, images, labels, mask_lists, rng, epoch):
        labels_p = pack_subpixel_targets(labels)
        n = images.shape[0]
        per = n // n_replicas

        def loss_fn(p):
            outs = []
            bn0 = None
            for r in range(n_replicas):
                sl = slice(r * per, (r + 1) * per)
                logits_r, bn_r = apply_fn(
                    p, ts.bn, images[sl], task, training=True, rng=None,
                    drop_masks=mask_lists[r], packed_head=True,
                )
                outs.append(logits_r)
                if r == 0:
                    bn0 = bn_r  # torch DP keeps replica 0's buffers
            logits = jnp.concatenate(outs, axis=0)
            return weighted_cross_entropy(logits, labels_p, class_weight), bn0

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        new_p, new_opt = apply_updates(
            ts.params, grads, ts.opt, lr_tree,
            lr_scale=poly_lr_factor(epoch, num_epochs), weight_decay=1e-4,
        )
        return steps.TrainState(new_p, new_bn, new_opt), {"loss": loss}

    return step


def run(variant: str) -> dict:
    params, bn = erfnet_rap.init(jax.random.key(0), [NC], 1)
    lr_tree = masks.rap_lr_tree(params, current_task=0, shared_lr=LR, ds_lr=LR)
    w = np.ones(NC, np.float32)
    w[-1] = 0.0
    if variant == "sync":
        step = steps.make_ce_step(
            erfnet_rap.apply, task=0, class_weight=w, lr_tree=lr_tree,
            num_epochs=EPOCHS,
        )
        jstep = jax.jit(step, donate_argnums=(0,))
    else:
        step = make_replica_ce_step(
            erfnet_rap.apply, task=0, class_weight=w, lr_tree=lr_tree,
            num_epochs=EPOCHS,
        )
        jstep = jax.jit(step, donate_argnums=(0,))

    train_src = LearnableSource(NC, n=16, height=H, width=W, seed=11)
    val_src = LearnableSource(NC, n=8, height=H, width=W, seed=22)
    train_ld = Loader(train_src, batch_size=BS, height=H, width=W, shuffle=True,
                      num_threads=2, seed=0)
    val_ld = Loader(val_src, batch_size=BS, height=H, width=W, num_threads=2)

    @jax.jit
    def eval_cm(p, s, x, y):
        logits, _ = erfnet_rap.apply(p, s, x, 0, training=False, packed_head=True)
        preds = unpack_subpixel(jnp.argmax(logits, -1).astype(jnp.int32))
        return confusion_matrix(preds, y, num_classes=NC)

    ts = steps.init_train_state(params, bn)
    rng = jax.random.key(1)
    np_rng = np.random.default_rng(2)
    curve = []
    for epoch in range(1, EPOCHS + 1):
        train_ld.set_epoch(epoch)
        for imgs, lbls, _ in train_ld:
            rng, k = jax.random.split(rng)
            x, y = augment_batch(jnp.asarray(imgs), jnp.asarray(lbls), k, num_classes=NC)
            if variant == "sync":
                mk = make_dropout_masks(np_rng, BS)
                ts, m = jstep(ts, x, y, mk, None, epoch)
            else:
                mks = [make_dropout_masks(np_rng, BS // 2) for _ in range(2)]
                ts, m = jstep(ts, x, y, mks, None, epoch)
        if epoch % 10 == 0:
            ev = IoUEvaluator(NC, NC - 1)
            for imgs, lbls, _ in val_ld:
                x, y = prepare_batch(jnp.asarray(imgs), jnp.asarray(lbls), num_classes=NC)
                ev.add_confusion(eval_cm(ts.params, ts.bn, x, y))
            miou, _ = ev.get_iou()
            curve.append((epoch, round(float(miou), 4)))
            print(f"  [{variant}] epoch {epoch}: val mIoU {miou:.4f}")
    return {"curve": curve, "params": ts.params, "final_loss": float(m["loss"])}


def main():
    t0 = time.time()
    res = {v: run(v) for v in ("sync", "replica")}
    # parameter divergence between the two trajectories
    num = den = 0.0
    for a, b in zip(jax.tree.leaves(res["sync"]["params"]),
                    jax.tree.leaves(res["replica"]["params"])):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        num += float(np.sum((a - b) ** 2))
        den += float(np.sum(a ** 2))
    print("curves:", {v: res[v]["curve"] for v in res})
    print(f"relative param L2 divergence: {np.sqrt(num / den):.4f}")
    print(f"wall: {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
