"""Checkpoint evaluation: the Evaluation_Notebook workflow as a library/CLI.

Reproduces the released-checkpoint "serve" flow (SURVEY.md §3.5): build the
model for a given incremental configuration, load a .pth.tar (reference) or
Orbax (ours) checkpoint, and compute per-domain val mIoU with the notebook's
protocol — batch size 1, ignore = last class, argmax predictions
(Evaluation_Notebook cells 4-5; iouEval.py:10-12).
"""
from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .data import Loader, SyntheticSource, make_source
from .data.transforms import prepare_batch
from .metrics import IoUEvaluator
from .models import erfnet, erfnet_ablations, erfnet_multihead, erfnet_rap
from .ckpt import convert_state_dict, load_pth_tar
from .train import steps
from .utils.logging import getColorEntry

_MODEL = {
    "rap": (erfnet_rap, True),
    "erfnet": (erfnet, False),
    "multi_task": (erfnet_multihead, False),
    "ftp1": (erfnet_multihead, False),
    "ftp2": (erfnet_multihead, False),
    # reconstructed step-1 ablation factory entries (Orbax runs only — no
    # reference checkpoints/torch grammar exist; models/erfnet_ablations.py)
    **{
        name: (erfnet_ablations.model_module(v), True)
        for name, v in erfnet_ablations.REFERENCE_NAMES.items()
    },
}


def load_expected(setting: str) -> dict[str, float]:
    """Reference-recorded mIoU for one setting (expected_miou.json — the
    Evaluation notebook's executed outputs, cells 8-22)."""
    import json

    path = os.path.join(os.path.dirname(__file__), "expected_miou.json")
    with open(path) as f:
        table = json.load(f)
    if setting not in table:
        known = [k for k in table if not k.startswith("_")]
        raise KeyError(f"unknown setting {setting!r}; known: {known}")
    return {k: v for k, v in table[setting].items() if not k.startswith("_")}


def check_expected(
    results: dict[str, float], setting: str, *, tolerance_points: float = 0.5
) -> tuple[bool, str]:
    """Compare measured per-domain mIoU against the reference record.

    `tolerance_points` is in mIoU percentage points (the north-star target:
    within 0.5 of the paper/notebook numbers, BASELINE.md). Returns
    (ok, human-readable report)."""
    expected = load_expected(setting)
    lines, ok = [], True
    for d, exp in expected.items():
        if d not in results:
            lines.append(f"{d}: expected {exp * 100:.2f} but not evaluated")
            ok = False
            continue
        got = results[d]
        delta = (got - exp) * 100
        within = abs(delta) <= tolerance_points
        ok = ok and within
        lines.append(
            f"{d}: got {got * 100:.2f} expected {exp * 100:.2f} "
            f"(delta {delta:+.2f} pts) {'OK' if within else 'FAIL'}"
        )
    return ok, "\n".join(lines)


def infer_num_classes(path: str) -> list[int]:
    """Per-head class counts read from the checkpoint itself.

    Orbax dirs: tree metadata only (no array restore). Reference .pth.tar:
    the `*output_conv.bias` shapes of the torch state dict. The reference
    instead requires the caller to re-supply the exact NUM_CLASSES list on
    every evaluation (Evaluation_Notebook cell 4)."""
    if os.path.isdir(path):
        from .ckpt import orbax_io

        return orbax_io.infer_num_classes(path)
    import re

    heads: dict[int, int] = {}
    named: dict[str, int] = {}
    for k, v in load_pth_tar(path).items():
        if k.endswith("output_conv.bias"):
            m = re.search(r"\.(\d+)\.output_conv\.bias$", k)
            if m:  # RAP/multitask: digit-indexed ModuleList heads
                heads[int(m.group(1))] = int(v.shape[0])
            else:
                # erfnet: a single 'decoder'; ftp1/ftp2 heads are NAMED
                # modules in task order (erfnet_ftp1.py:139-141 decoder_old,
                # decoder_new; erfnet_ftp2.py:139-143 decoder_old1,
                # decoder_old2, decoder_new)
                name = k[: -len(".output_conv.bias")].split(".")[-1]
                named[name] = int(v.shape[0])
    if heads:
        return [heads[i] for i in sorted(heads)]
    if named:
        rank = {"decoder": 0, "decoder_old": 0, "decoder_old1": 0,
                "decoder_old2": 1, "decoder_new": 9}
        return [named[n] for n in sorted(named, key=lambda n: (rank.get(n, 0), n))]
    raise ValueError(f"no output_conv heads found in {path}")


def load_checkpoint(path: str, *, kind: str, num_classes: Sequence[int] | None = None):
    """Returns (apply_fn(params,bn,x,task,...), params, bn).

    `num_classes=None` infers the per-head class counts from the checkpoint
    (see `infer_num_classes`)."""
    mod, is_rap = _MODEL[kind]
    if num_classes is None:
        num_classes = infer_num_classes(path)
    nb = len(num_classes)
    if os.path.isdir(path):  # orbax
        from .ckpt import orbax_io

        if is_rap:
            p0, b0 = mod.init(jax.random.key(0), list(num_classes), nb)
        else:
            p0, b0 = erfnet_multihead.init(jax.random.key(0), list(num_classes))
        ts, *_ = orbax_io.restore(path, steps.init_train_state(p0, b0))
        params, bn = ts.params, ts.bn
        if kind == "erfnet":
            # this framework's own singletask runs checkpoint the multi-head
            # pytree with one head; erfnet.apply expects {encoder, decoder}
            # (same remap as train.protocols._load_params)
            params = {"encoder": params["encoder"], "decoder": params["decoders"][0]}
            bn = {"encoder": bn["encoder"], "decoder": bn["decoders"][0]}
    else:
        if kind in erfnet_ablations.REFERENCE_NAMES:
            raise ValueError(
                f"{kind} has no torch checkpoint grammar (reconstructed "
                f"variant; Orbax dirs only)"
            )
        params, bn = convert_state_dict(load_pth_tar(path), kind=kind, nb_tasks=nb)
    if kind == "erfnet":
        apply_fn = lambda p, s, x, task, **kw: erfnet.apply(p, s, x, **kw)
    else:
        apply_fn = mod.apply
    return apply_fn, params, bn


def evaluate_domain(
    apply_fn, params, bn, *, task: int, num_classes: int, loader: Loader
) -> tuple[float, np.ndarray]:
    """Per-domain (mIoU, per-class IoU) with the notebook protocol."""
    fwd = jax.jit(
        lambda p, s, x: jnp.argmax(apply_fn(p, s, x, task, training=False)[0], axis=-1)
    )
    ev = IoUEvaluator(num_classes, num_classes - 1)
    for imgs, lbls, valid in loader:
        x, y = prepare_batch(jnp.asarray(imgs), jnp.asarray(lbls), num_classes=num_classes)
        y = jnp.where(jnp.asarray(valid)[:, None, None], y, num_classes - 1)
        preds = fwd(params, bn, x)
        ev.add_batch(np.asarray(preds), np.asarray(y))
    return ev.get_iou()


def evaluate_checkpoint(
    ckpt: str,
    *,
    kind: str,
    datasets: Sequence[str],
    num_classes: Sequence[int] | None = None,
    data_roots: dict[str, str] | None = None,
    subset: str = "val",
    batch_size: int = 1,
    height: int = 512,
    width: int = 1024,
    synthetic: bool = False,
    compute_dtype: str = "float32",
    return_per_class: bool = False,
) -> dict[str, float] | tuple[dict[str, float], dict[str, np.ndarray]]:
    """Evaluate every domain head of a checkpoint; prints + returns mIoUs.

    `compute_dtype="float64"` runs the forward in f64 (params upcast, x64
    enabled): cross-implementation logit differences drop below any plausible
    argmax tie gap, so per-class IoU becomes BIT-comparable against the
    reference torch stack (tests/test_eval_parity.py). `return_per_class`
    additionally returns {dataset: per-class IoU float64 array}.
    """
    if num_classes is None:
        num_classes = infer_num_classes(ckpt)
        print(f"inferred num_classes {list(num_classes)} from {ckpt}")
    if len(num_classes) != len(datasets):
        raise ValueError(
            f"{len(datasets)} datasets but {len(num_classes)} heads "
            f"({list(num_classes)}) in {ckpt}"
        )
    apply_fn, params, bn = load_checkpoint(ckpt, kind=kind, num_classes=num_classes)
    if compute_dtype == "float64":
        jax.config.update("jax_enable_x64", True)
        params, bn = jax.tree.map(
            lambda a: a.astype(jnp.float64) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            (params, bn),
        )
        inner = apply_fn
        apply_fn = lambda p, s, x, task, **kw: inner(p, s, x.astype(jnp.float64), task, **kw)
    elif compute_dtype != "float32":
        raise ValueError(f"compute_dtype={compute_dtype!r}: float32 or float64")
    results = {}
    per_class_by_dataset: dict[str, np.ndarray] = {}
    data_roots = data_roots or {}
    from .analysis.names import NAMES_BY_DATASET

    for t, (d, nc) in enumerate(zip(datasets, num_classes)):
        if synthetic or d not in data_roots:
            source = SyntheticSource(nc, n=8, height=height, width=width)
        else:
            source = make_source(d, data_roots[d], subset)
        loader = Loader(source, batch_size=batch_size, height=height, width=width)
        miou, per_class = evaluate_domain(
            apply_fn, params, bn, task=t, num_classes=nc, loader=loader
        )
        # per-class IoU table with class names, ANSI-colored like the
        # notebook's eval cell (Evaluation_Notebook cell 5; iouEval.py:92-104)
        names = NAMES_BY_DATASET.get(d, [])
        for ci, iou in enumerate(per_class):
            name = names[ci] if ci < len(names) else f"class {ci}"
            print(f"  {getColorEntry(float(iou))}{iou * 100:6.2f}\033[0m%  {name}")
        color = getColorEntry(miou)
        print(f"{d}: mIoU {color}{miou * 100:.2f}\033[0m% over {len(per_class)} classes")
        results[d] = miou
        per_class_by_dataset[d] = per_class
    if return_per_class:
        return results, per_class_by_dataset
    return results
