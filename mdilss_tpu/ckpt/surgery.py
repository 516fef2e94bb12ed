"""Incremental-learning checkpoint surgery as pytree operations.

Reproduces the reference's load-time key-string surgery (SURVEY.md §2.6;
train_new_task_step2.py:499-530, train_new_task_step3.py:562-595,
train_RAPFT_step1.py:482-491) as explicit array ops on the task-stacked
pytrees — no string rewriting needed at the new framework's native layer.

Rules replicated exactly:
  1. Step t>1 init (`extend_for_new_task`):
     - all weights shared with the previous checkpoint are kept verbatim;
     - the new task's encoder DS slots (RAP convs + BN scale/bias) are seeded
       from task t-1's (`.{t-1}.weight|bias` duplicated to `.{t}.`), while the
       new task's BN *running stats* start fresh (the reference only copies
       weight/bias keys — running_mean/var fall through strict=False);
     - the new decoder is a copy of decoder t-1 *including* its BN running
       stats, except `output_conv` which is freshly initialized (class count
       differs).
  2. Step 1 init (`load_imagenet_encoder`): ImageNet-pretrained encoder with
     `module.features.*` keys renamed to `module.*` and merged strict=False —
     in the RAP model only the shared encoder convs match (per-task bn/adapter
     names differ from the single-task pretrained encoder).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import topology as T
from ..models import blocks as B
from ..ops.norm import BNState
from .pth_converter import convert_state_dict, export_state_dict


def _append_slot(arr: jax.Array, axis: int, fresh_value: float | None) -> jax.Array:
    """Append one slot along the task axis; seeded from the last existing slot
    when `fresh_value` is None, else filled with the constant."""
    last = jax.lax.slice_in_dim(arr, arr.shape[axis] - 1, arr.shape[axis], axis=axis)
    new = last if fresh_value is None else jnp.full_like(last, fresh_value)
    return jnp.concatenate([arr, new], axis=axis)


ADAPTER_KEYS = ("rap1", "rap2", "ser1", "ser2", "wt1", "wt2")


def extend_for_new_task(params, state, new_num_classes: int, rng, dtype=jnp.float32):
    """Grow nb_tasks -> nb_tasks+1 with the reference init scheme. Covers the
    RAP model and every reconstructed ablation variant: any task-stacked
    adapter leaf (rap/ser/wt) and any task-stacked BN grows by one slot seeded
    from task t-1; shared leaves (convs, onlyrap's shared BN) pass through.

    Task axis position: 0 on the downsampler BN leaves, 1 on grouped
    (scan-stacked) leaves (see models/topology.py docstring).
    """

    def grow_bn(p, s, axis: int):
        # scale/bias seeded from task t-1; running stats fresh (0 mean, 1 var)
        new_p = {
            "scale": _append_slot(p["scale"], axis, None),
            "bias": _append_slot(p["bias"], axis, None),
        }
        new_s = BNState(
            mean=_append_slot(s.mean, axis, 0.0),
            var=_append_slot(s.var, axis, 1.0),
        )
        return new_p, new_s

    def grow_nb(p, s, axis: int):
        new_p, new_s = {}, {}
        for k, v in p.items():
            if k in ("bns1", "bns2"):  # per-task BN
                new_p[k], new_s[k] = grow_bn(v, s[k], axis)
            elif k in ("bn1", "bn2"):  # shared BN (onlyrap): untouched
                new_p[k], new_s[k] = v, s[k]
            elif k in ADAPTER_KEYS:  # task-stacked adapters: seed from t-1
                new_p[k] = jax.tree.map(lambda a: _append_slot(a, axis, None), v)
            else:  # shared convs
                new_p[k] = v
        return new_p, new_s

    def grow_down(p, s):
        if p["bn"]["scale"].ndim == 1:  # shared bn_ini (onlyrap)
            return {"conv": p["conv"], "bn": p["bn"]}, {"bn": s["bn"]}
        bn_p, bn_s = grow_bn(p["bn"], s["bn"], 0)
        return {"conv": p["conv"], "bn": bn_p}, {"bn": bn_s}

    enc_p, enc_s = params["encoder"], state["encoder"]
    new_enc_p, new_enc_s = {}, {}
    for seg in ("initial", "down1", "down2"):
        new_enc_p[seg], new_enc_s[seg] = grow_down(enc_p[seg], enc_s[seg])
    new_enc_p["group64"], new_enc_s["group64"] = grow_nb(enc_p["group64"], enc_s["group64"], 1)
    new_enc_p["group128"], new_enc_s["group128"] = {}, {}
    for dkey in enc_p["group128"]:
        new_enc_p["group128"][dkey], new_enc_s["group128"][dkey] = grow_nb(
            enc_p["group128"][dkey], enc_s["group128"][dkey], 1
        )

    # New decoder: deep-copy of decoder t-1 (params AND running stats,
    # train_new_task_step2.py:524-528) with a fresh output_conv. A REAL copy:
    # aliased buffers inside one train state break donation ("attempt to
    # donate the same buffer twice").
    prev_dec_p, prev_dec_s = params["decoders"][-1], state["decoders"][-1]
    new_dec_p = dict(jax.tree.map(jnp.array, prev_dec_p))
    new_dec_s = jax.tree.map(jnp.array, prev_dec_s)
    new_dec_p["output_conv"] = B.conv_transpose_init(rng, 2, 2, 16, new_num_classes, dtype)

    return (
        {"encoder": new_enc_p, "decoders": [*params["decoders"], new_dec_p]},
        {"encoder": new_enc_s, "decoders": [*state["decoders"], new_dec_s]},
    )


def merge_state_dict(params, state, sd: dict[str, np.ndarray], *, kind: str):
    """torch `load_state_dict(..., strict=False)` semantics on pytrees.

    Overlays every key of `sd` that exists (with matching shape) in the
    reference-format export of (params, state); everything else is kept.
    """
    current = export_state_dict(params, state, kind=kind)
    merged = dict(current)
    for k, v in sd.items():
        k = k.removeprefix("module.")
        if k in merged and tuple(merged[k].shape) == tuple(np.shape(v)):
            merged[k] = np.asarray(v)
    nb = len(params["decoders"]) if "decoders" in params else 1
    return convert_state_dict(merged, kind=kind, nb_tasks=nb)


def graft_shared_encoder(dst_params, src_enc_params):
    """Copy the SHARED encoder conv leaves (downsampler convs + every nb1d
    conv pair) from `src_enc_params` into `dst_params["encoder"]`, leaving
    DS leaves (adapters, BN) untouched.

    Used to seed the reconstructed ablation models from the same
    ImageNet-pretrained encoder as step 1 (train_RAPFT_step1.py:482-502): the
    torch converter grammar only exists for the shipped model kinds, but the
    shared-conv sublayout is identical across variants, so the pretrained
    convs are loaded into a RAP template and grafted leaf-wise."""
    dst_enc = dst_params["encoder"]
    new_enc = {}
    for seg in ("initial", "down1", "down2"):
        new_enc[seg] = {**dst_enc[seg], "conv": jax.tree.map(jnp.array, src_enc_params[seg]["conv"])}
    conv_keys = ("conv3x1_1", "conv1x3_1", "conv3x1_2", "conv1x3_2")

    def graft_group(dst_g, src_g):
        return {**dst_g, **{k: jax.tree.map(jnp.array, src_g[k]) for k in conv_keys}}

    new_enc["group64"] = graft_group(dst_enc["group64"], src_enc_params["group64"])
    new_enc["group128"] = {
        dk: graft_group(dst_enc["group128"][dk], src_enc_params["group128"][dk])
        for dk in dst_enc["group128"]
    }
    return {**dst_params, "encoder": new_enc}


def load_imagenet_encoder(params, state, sd: dict[str, np.ndarray], *, kind: str = "rap"):
    """Step-1 init: rename `module.features.*` -> `module.*`, merge strict=False
    (train_RAPFT_step1.py:482-502)."""
    renamed = {}
    for k, v in sd.items():
        nk = k.replace("module.features", "module") if k.startswith("module.features") else k
        renamed[nk] = v
    return merge_state_dict(params, state, renamed, kind=kind)
