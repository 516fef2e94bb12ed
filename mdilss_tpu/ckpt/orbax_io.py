"""Orbax checkpointing with true resume.

The reference saved torch dicts {epoch, arch, state_dict, best_acc, optimizer}
every epoch and tracked a best-on-val-IoU copy (train_RAPFT_step1.py:364-376),
but its `--resume` flag was parsed and never used (SURVEY.md §5) — recovery
meant hand-editing. Here `save`/`restore` round-trip the full training state
(params, BN stats, optimizer moments/count, epoch, best metric, PRNG key), so
resume reproduces the exact trajectory.

Layout: <savedir>/ckpt/<step>/... (orbax), plus `best/` mirroring the
reference's model_best_* convention.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..train.steps import TrainState
from ..train.optim import AdamState


def _manager(directory: str, max_to_keep: int = 2) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save(directory: str, epoch: int, ts: TrainState, *, best_acc: float, rng) -> None:
    """Write a full training checkpoint for `epoch`."""
    mgr = _manager(directory)
    payload = {
        "params": ts.params,
        "bn": ts.bn,
        "opt_m": ts.opt.m,
        "opt_v": ts.opt.v,
        "opt_count": ts.opt.count,
        "meta": np.asarray([epoch, float(best_acc)], np.float64),
        "rng": jax.random.key_data(rng),
    }
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def latest_epoch(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def infer_num_classes(directory: str, *, epoch: int | None = None) -> list[int]:
    """Per-head class counts from checkpoint *metadata* (no array restore).

    The head bias `decoders[i]/output_conv/b` has shape (num_classes,), so the
    saved tree metadata alone determines the heads. This spares eval/predict/
    tsne callers the hand-specified --num-classes list that must exactly match
    the checkpoint (the reference requires the matching NUM_CLASSES on every
    evaluation, Evaluation_Notebook cell 4; a mismatch here used to surface as
    a raw Orbax shape error)."""
    step = epoch if epoch is not None else latest_epoch(directory)
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    ckptr = ocp.StandardCheckpointer()
    md = ckptr.metadata(
        os.path.join(os.path.abspath(directory), str(step), "default")
    )
    params = md.item_metadata["params"]
    keys = set(params.keys())
    if "decoders" in keys:
        return [int(d["output_conv"]["b"].shape[0]) for d in params["decoders"]]
    return [int(params["decoder"]["output_conv"]["b"].shape[0])]


def restore(directory: str, template_ts: TrainState, *, epoch: int | None = None):
    """Restore (ts, epoch, best_acc, rng); template supplies the pytree shape."""
    mgr = _manager(directory)
    step = epoch if epoch is not None else mgr.latest_step()
    template = {
        "params": template_ts.params,
        "bn": template_ts.bn,
        "opt_m": template_ts.opt.m,
        "opt_v": template_ts.opt.v,
        "opt_count": template_ts.opt.count,
        "meta": np.zeros(2, np.float64),
        "rng": jax.random.key_data(jax.random.key(0)),
    }
    payload = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    ts = TrainState(
        params=payload["params"],
        bn=payload["bn"],
        opt=AdamState(m=payload["opt_m"], v=payload["opt_v"], count=payload["opt_count"]),
    )
    epoch_restored = int(payload["meta"][0])
    best_acc = float(payload["meta"][1])
    rng = jax.random.wrap_key_data(payload["rng"])
    return ts, epoch_restored, best_acc, rng
