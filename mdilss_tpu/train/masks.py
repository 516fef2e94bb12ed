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


# LR-tree leaves are deliberately HOST (numpy) arrays: they enter jitted steps
# as closure constants, and device-resident constants must be fetched back at
# lowering time — through the axon tunnel that costs ~0.4 s per leaf (~80 s
# for a full model's lr tree). Host constants lower in milliseconds.


def _task_col(nb_tasks: int, hot: int | None, lr: float, axis: int, ndim: int):
    """Array with the task axis at `axis` of an ndim-leaf: `lr` at row `hot`
    (or all rows if hot is None), 0 elsewhere; broadcasts against the leaf."""
    col = np.full((nb_tasks,), lr if hot is None else 0.0, np.float32)
    if hot is not None:
        col[hot] = lr
    shape = (1,) * axis + (nb_tasks,) + (1,) * (ndim - axis - 1)
    return col.reshape(shape)


def _const_tree(tree, value: float):
    return jax.tree.map(lambda _: np.float32(value), tree)


def rap_lr_tree(params, *, current_task: int, shared_lr: float, ds_lr: float):
    """LR tree for the RAP model in incremental step `current_task`.

    Task axis: 0 on downsampler BN leaves, 1 on grouped (scan-stacked) leaves.
    """
    enc = params["encoder"]
    nb = enc["initial"]["bn"]["scale"].shape[0]

    def ds_leaf(leaf, axis):
        return _task_col(nb, current_task, ds_lr, axis, leaf.ndim)

    def down_lrs(p):
        return {
            "conv": _const_tree(p["conv"], shared_lr),
            "bn": {k: ds_leaf(p["bn"][k], 0) for k in ("scale", "bias")},
        }

    def nb_lrs(p):
        return {
            "conv3x1_1": _const_tree(p["conv3x1_1"], shared_lr),
            "conv1x3_1": _const_tree(p["conv1x3_1"], shared_lr),
            "rap1": {k: ds_leaf(p["rap1"][k], 1) for k in ("w", "b")},
            "bns1": {k: ds_leaf(p["bns1"][k], 1) for k in ("scale", "bias")},
            "conv3x1_2": _const_tree(p["conv3x1_2"], shared_lr),
            "conv1x3_2": _const_tree(p["conv1x3_2"], shared_lr),
            "rap2": {k: ds_leaf(p["rap2"][k], 1) for k in ("w", "b")},
            "bns2": {k: ds_leaf(p["bns2"][k], 1) for k in ("scale", "bias")},
        }

    enc_lr = {
        "initial": down_lrs(enc["initial"]),
        "down1": down_lrs(enc["down1"]),
        "group64": nb_lrs(enc["group64"]),
        "down2": down_lrs(enc["down2"]),
        "group128": {dk: nb_lrs(enc["group128"][dk]) for dk in enc["group128"]},
    }
    dec_lr = [
        _const_tree(d, ds_lr if t == current_task else 0.0)
        for t, d in enumerate(params["decoders"])
    ]
    return {"encoder": enc_lr, "decoders": dec_lr}


def ablation_lr_tree(params, *, variant: str, current_task: int, shared_lr: float, ds_lr: float):
    """LR tree for the reconstructed ablation models (models/erfnet_ablations).

    Mirrors the reference's per-variant freeze rules
    (train_RAPFT_step1.py:176-242): shared encoder convs at `shared_lr`;
    the current task's DS slices (per-task BN rows and/or adapter slices per
    variant) and the current decoder at `ds_lr`; other tasks' DS slices and
    decoders frozen. Two documented judgment calls where the reference
    snippets are loose (the model files are absent upstream):
      * onlyrap: BN is shared — the freeze code never touches BN names, which
        leaves them requires_grad=True; here shared BN moves with the shared
        group (`shared_lr`), consistent with how shared convs are treated.
      * ras: the snippet also never gates the series-adapter conv names
        (only 'bn' ones), which would leave OLD tasks' adapters training;
        that contradicts the method's freeze-previous-domains contract, so
        old-task adapters are frozen here like RAP's.
    """
    from ..models.blocks import PER_TASK_BN_VARIANTS

    enc = params["encoder"]
    per_task_bn = variant in PER_TASK_BN_VARIANTS
    nb = len(params["decoders"])

    def ds_leaf(leaf, axis):
        return _task_col(nb, current_task, ds_lr, axis, leaf.ndim)

    def down_lrs(p):
        bn = (
            {k: ds_leaf(p["bn"][k], 0) for k in ("scale", "bias")}
            if per_task_bn
            else _const_tree(p["bn"], shared_lr)
        )
        return {"conv": _const_tree(p["conv"], shared_lr), "bn": bn}

    adapter_keys = {
        "bn": (), "onlyrap": ("rap1", "rap2"),
        "ras": ("ser1", "ser2"), "rcm": ("wt1", "wt2"),
    }[variant]

    def nb_lrs(p):
        out = {}
        for k, v in p.items():
            if k.startswith("conv"):
                out[k] = _const_tree(v, shared_lr)
            elif k in ("bns1", "bns2"):
                out[k] = {kk: ds_leaf(v[kk], 1) for kk in ("scale", "bias")}
            elif k in ("bn1", "bn2"):  # onlyrap: shared BN
                out[k] = _const_tree(v, shared_lr)
            elif k in adapter_keys:
                out[k] = jax.tree.map(lambda a: ds_leaf(a, 1), v)
            else:
                raise KeyError(f"unexpected leaf {k!r} in {variant} block")
        return out

    enc_lr = {
        "initial": down_lrs(enc["initial"]),
        "down1": down_lrs(enc["down1"]),
        "group64": nb_lrs(enc["group64"]),
        "down2": down_lrs(enc["down2"]),
        "group128": {dk: nb_lrs(enc["group128"][dk]) for dk in enc["group128"]},
    }
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
