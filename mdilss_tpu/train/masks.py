"""Per-element learning-rate trees: freeze masks + differential LR in one pytree.

Encodes the reference's requires_grad patterns and optimizer param groups
(SURVEY.md §2.5, §7.3) against the task-stacked parameter layout:

  * RAP incremental steps (train_new_task_step2.py:95-106,202-215,229-239):
      - shared encoder convs           -> `shared_lr` (5e-6 at steps>1,
                                          5e-4 at step 1 where nothing is frozen)
      - current task's encoder DS slices (RAP 1x1 convs + BN scale/bias rows)
        and the current decoder        -> `ds_lr` (5e-4)
      - every other task's DS slices and decoders -> 0 (frozen)
  * Joint multi-task baseline (train_multi_task.py:107-110,210-217):
      whole encoder (incl. BN) at 5e-4/nb_tasks, every decoder at 5e-4.
  * FT baselines (main_ftp1_enc_newbn.py:228-242): old decoders frozen;
      FT = encoder + new decoder at 5e-4; FE = new decoder only.

An lr-tree leaf is either a scalar or an array broadcastable against the
parameter leaf (task-stacked leaves get a [T, 1, ...] column so only one
task's slice moves). lr == 0 means frozen (optim.apply_updates masks the
gradient before the moment update).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _task_col(nb_tasks: int, hot: int | None, lr: float, ndim_tail: int):
    """[T, 1, 1, ...] array: `lr` at row `hot` (or all rows if hot is None)."""
    col = np.full((nb_tasks,), lr if hot is None else 0.0, np.float32)
    if hot is not None:
        col[hot] = lr
    return jnp.asarray(col.reshape((nb_tasks,) + (1,) * ndim_tail))


def _const_tree(tree, value: float):
    return jax.tree.map(lambda _: jnp.float32(value), tree)


def rap_lr_tree(params, *, current_task: int, shared_lr: float, ds_lr: float):
    """LR tree for the RAP model in incremental step `current_task`."""
    enc = params["encoder"]
    nb = enc["initial"]["bn"]["scale"].shape[0]

    def bn_lrs(p):
        return {
            "scale": _task_col(nb, current_task, ds_lr, p["scale"].ndim - 1),
            "bias": _task_col(nb, current_task, ds_lr, p["bias"].ndim - 1),
        }

    def rap_lrs(p):
        return {
            "w": _task_col(nb, current_task, ds_lr, p["w"].ndim - 1),
            "b": _task_col(nb, current_task, ds_lr, p["b"].ndim - 1),
        }

    enc_lr = {"initial": {"conv": _const_tree(enc["initial"]["conv"], shared_lr),
                          "bn": bn_lrs(enc["initial"]["bn"])}}
    blocks = []
    for p in enc["blocks"]:
        if "conv" in p:  # downsampler
            blocks.append({"conv": _const_tree(p["conv"], shared_lr), "bn": bn_lrs(p["bn"])})
        else:  # RAP block
            blocks.append({
                "conv3x1_1": _const_tree(p["conv3x1_1"], shared_lr),
                "conv1x3_1": _const_tree(p["conv1x3_1"], shared_lr),
                "rap1": rap_lrs(p["rap1"]),
                "bns1": bn_lrs(p["bns1"]),
                "conv3x1_2": _const_tree(p["conv3x1_2"], shared_lr),
                "conv1x3_2": _const_tree(p["conv1x3_2"], shared_lr),
                "rap2": rap_lrs(p["rap2"]),
                "bns2": bn_lrs(p["bns2"]),
            })
    enc_lr["blocks"] = blocks
    dec_lr = [
        _const_tree(d, ds_lr if t == current_task else 0.0)
        for t, d in enumerate(params["decoders"])
    ]
    return {"encoder": enc_lr, "decoders": dec_lr}


def multihead_lr_tree(
    params,
    *,
    encoder_lr: float,
    decoder_lrs: list[float] | None = None,
    decoder_lr: float | None = None,
):
    """LR tree for shared-encoder multi-head models.

    `decoder_lrs` gives one LR per head (0 freezes a head); `decoder_lr`
    applies one LR to all heads.
    """
    if decoder_lrs is None:
        decoder_lrs = [float(decoder_lr)] * len(params["decoders"])
    return {
        "encoder": _const_tree(params["encoder"], encoder_lr),
        "decoders": [
            _const_tree(d, lr) for d, lr in zip(params["decoders"], decoder_lrs)
        ],
    }


def trainable_fraction(lr_tree, params) -> float:
    """Diagnostic: fraction of parameter elements with lr > 0."""
    tot = 0
    active = 0.0
    for p, lr in zip(jax.tree.leaves(params), jax.tree.leaves(lr_tree)):
        tot += p.size
        active += float(jnp.sum(jnp.broadcast_to(jnp.asarray(lr) > 0, p.shape)))
    return active / tot
