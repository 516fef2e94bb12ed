"""Serving artifacts: portable AOT-exported inference functions.

The reference's "serving" story is a notebook that rebuilds the nn.Module and
loads a .pth.tar in-process (Evaluation_Notebook cells 8-22, SURVEY.md §3.5).
The TPU-native equivalent exports each domain head as a **self-contained
StableHLO artifact** via `jax.export`: parameters are baked in as constants,
the batch/resolution is fixed (or symbolic over batch), and the artifact
replays on any compatible JAX runtime — no model code, checkpoint format, or
Python class needed at serving time.

Layout of an export directory:

    serving/
      meta.json           kind, per-task class counts, shapes, output mode,
                          dtype, jax version, platforms
      head0.stablehlo     task-0 inference fn (serialized jax.export.Exported)
      head1.stablehlo     ...

`load_head(dir, task)` deserializes and returns a jitted `fn(x) -> logits`
(or `-> labels` when exported with output="labels": argmax int32 on-device —
a ~40x smaller device->host transfer per image, the serving default choice
for segmentation).

Default compute dtype is bfloat16, measured against the f32 eval protocol
(the Evaluation notebook's, cells 4-5) on the export path itself
(tests/test_serving.py::test_bf16_default_vs_f32_quantified): relative
logit max-delta ~0.6%, label disagreement 0.03-0.05% of pixels, every flip
on a top-2 near-tie — well under per-class mIoU reporting precision, so
bf16 stays the shipped default; pass compute_dtype="float32" to `export`
for a bit-faithful artifact when reproducing expected_miou.json exactly.
"""
from __future__ import annotations

import json
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

_FMT = "head{t}.stablehlo"


def build_infer_fn(apply_fn, params, bn, task: int, *, output: str = "logits",
                   compute_dtype=jnp.bfloat16):
    """Closure over (params, bn): `fn(x[N,H,W,3] f32 in [0,1]) -> logits f32
    [N,H,W,C]` or int32 labels [N,H,W]. Math matches the eval protocol
    (training=False, running BN stats)."""
    assert output in ("logits", "labels"), output

    def fn(x):
        logits, _ = apply_fn(params, bn, x.astype(compute_dtype), task, training=False)
        if output == "labels":
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return logits.astype(jnp.float32)

    return fn


def export_head(apply_fn, params, bn, task: int, *, height: int, width: int,
                batch_size: int | None = 1, output: str = "logits",
                compute_dtype=jnp.bfloat16,
                platforms: Sequence[str] | None = ("cpu", "tpu")) -> bytes:
    """Serialize one head. `batch_size=None` exports with a symbolic batch
    dimension (shape-polymorphic over N); static batch compiles leaner on
    TPU and is the default."""
    fn = build_infer_fn(apply_fn, params, bn, task, output=output,
                        compute_dtype=compute_dtype)
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, height, width, 3), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, height, width, 3), jnp.float32)
    exp = jexport.export(jax.jit(fn), platforms=tuple(platforms) if platforms else None)(spec)
    return exp.serialize()


def export_checkpoint(ckpt: str, *, kind: str, num_classes: Sequence[int] | None = None,
                      out_dir: str, tasks: Sequence[int] | None = None,
                      height: int = 512, width: int = 1024,
                      batch_size: int | None = 1, output: str = "logits",
                      compute_dtype: str = "bfloat16",
                      platforms: Sequence[str] = ("cpu", "tpu")) -> dict:
    """Export every (or the selected) domain head of a checkpoint —
    reference .pth.tar or this framework's Orbax dir — into `out_dir`."""
    from .evaluate import infer_num_classes, load_checkpoint

    if num_classes is None:
        num_classes = infer_num_classes(ckpt)
    apply_fn, params, bn = load_checkpoint(ckpt, kind=kind, num_classes=list(num_classes))
    dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    if tasks is None:
        tasks = list(range(len(num_classes)))
    os.makedirs(out_dir, exist_ok=True)
    sizes = {}
    for t in tasks:
        blob = export_head(
            apply_fn, params, bn, t, height=height, width=width,
            batch_size=batch_size, output=output, compute_dtype=dt,
            platforms=platforms,
        )
        path = os.path.join(out_dir, _FMT.format(t=t))
        with open(path, "wb") as f:
            f.write(blob)
        sizes[t] = len(blob)
    meta = {
        "kind": kind,
        "num_classes": list(num_classes),
        "tasks": list(tasks),
        "height": height,
        "width": width,
        "batch_size": batch_size,  # null => symbolic batch
        "output": output,
        "compute_dtype": compute_dtype,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "artifact_bytes": sizes,
        "source_checkpoint": os.path.abspath(ckpt),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def load_meta(export_dir: str) -> dict:
    with open(os.path.join(export_dir, "meta.json")) as f:
        return json.load(f)


def load_head(export_dir: str, task: int):
    """Deserialize one exported head; returns a jitted `fn(x)`."""
    with open(os.path.join(export_dir, _FMT.format(t=task)), "rb") as f:
        exp = jexport.deserialize(f.read())
    return jax.jit(exp.call)


def serve_batches(export_dir: str, task: int, batches):
    """Convenience driver: run an exported head over an iterable of
    host uint8/float batches, yielding numpy outputs."""
    fn = load_head(export_dir, task)
    meta = load_meta(export_dir)
    h, w = meta["height"], meta["width"]
    for x in batches:
        x = np.asarray(x)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        if x.shape[1:3] != (h, w):
            raise ValueError(f"batch is {x.shape[1:3]}, artifact expects ({h}, {w})")
        got = fn(jnp.asarray(x))
        yield np.asarray(got)
