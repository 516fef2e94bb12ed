"""One-shot incremental pipeline: step1 -> step2 -> step3 (+ optional baselines).

The reference chained the three training steps through sbatch scripts that
pass each step's best checkpoint to the next
(trainer_files/trainer_OURS.sh:49-63: step1 best .pth.tar -> step2 --state,
step2 best -> step3 --state). This module is that chain as one command:

    python -m mdilss_tpu pipeline --order CS_BDD_IDD --savedir runs/ours ...

Each stage trains under `<savedir>/<stage>/` and the next stage restores
`<savedir>/<prev>/best` (Orbax; .pth.tar also accepted for the first stage
via --state / --pretrained-encoder). `--with-baselines` additionally runs
the ft/fe chain and the joint multitask baseline on the same data.
"""
from __future__ import annotations

import os
from typing import Any

from .. import config as C
from .protocols import build_trainer


def _order_steps(order: str) -> tuple[str, str]:
    """Map a 3-domain order to the step-2 preset name."""
    return {"CS_BDD_IDD": "CS_BDD", "CS_IDD_BDD": "CS_IDD"}[order], order


def run_pipeline(
    *,
    order: str = "CS_BDD_IDD",
    savedir: str = "runs/pipeline",
    common: dict[str, Any] | None = None,
    pretrained_encoder: str | None = None,
    state: str | None = None,
    with_baselines: bool = False,
    stages: tuple[str, ...] = ("step1", "step2", "step3"),
) -> dict[str, dict]:
    """Run the incremental protocol end-to-end; returns per-stage final rows.

    `common` holds TrainConfig kwargs shared by every stage (epochs, batch,
    data roots, dtype, ...); per-stage savedir/state are derived here. An
    existing `<savedir>/<stage>/best` short-circuits that stage (so a crashed
    pipeline rerun skips finished stages; pass resume=True in `common` to
    also resume the interrupted one mid-stage).
    """
    common = dict(common or {})
    common.pop("savedir", None)
    common.pop("state", None)
    order2, order3 = _order_steps(order)
    results: dict[str, dict] = {}
    prev_best = state

    def stage_dir(stage: str) -> str:
        return os.path.join(savedir, stage)

    def done(stage: str) -> bool:
        from ..ckpt import orbax_io

        best = os.path.join(stage_dir(stage), "best")
        return os.path.isdir(best) and orbax_io.latest_epoch(best) is not None

    def run(stage: str, cfg) -> None:
        nonlocal prev_best
        if done(stage):
            print(f"[pipeline] {stage}: found existing {stage_dir(stage)}/best, skipping")
        else:
            print(f"[pipeline] {stage}: training -> {cfg.savedir}")
            results[stage] = build_trainer(cfg).fit()
        prev_best = os.path.join(stage_dir(stage), "best")

    def require_prev(stage: str, prev_stage: str) -> str:
        """Checkpoint for an incremental stage whose predecessor didn't run
        in this invocation (e.g. --stages step3 to redo the last stage).

        Without this, state=None would silently hit _build_incremental's
        random-teacher smoke path and distill against garbage."""
        if prev_best is not None:
            return prev_best
        best = os.path.join(stage_dir(prev_stage), "best")
        if os.path.isdir(best):
            from ..ckpt import orbax_io

            if orbax_io.latest_epoch(best) is not None:
                return best
        raise ValueError(
            f"pipeline stage '{stage}' needs the previous step's checkpoint: "
            f"no {best} found — include '{prev_stage}' in --stages or pass "
            f"--state"
        )

    if "step1" in stages:
        run("step1", C.step1(
            savedir=stage_dir("step1"), state=prev_best,
            pretrained_encoder=pretrained_encoder, **common,
        ))
    if "step2" in stages:
        run("step2", C.step2(
            order=order2, savedir=stage_dir("step2"),
            state=require_prev("step2", "step1"), **common,
        ))
    if "step3" in stages:
        run("step3", C.step3(
            order=order3, savedir=stage_dir("step3"),
            state=require_prev("step3", "step2"), **common,
        ))

    if with_baselines:
        # The reference's baseline chains: the fine-tuning chain starts from
        # the single-task Cityscapes baseline's best checkpoint
        # (trainer_fine_tune.sh:54 --state model_best_cityscapes_prenc),
        # which itself — like the multitask baseline — starts from the
        # ImageNet-pretrained encoder (trainer_single_task.sh:46,
        # trainer_multi_task.sh:50).
        single = C.singletask(
            "cityscapes", savedir=stage_dir("single_cs"),
            pretrained_encoder=pretrained_encoder, **common,
        )
        if not done("single_cs"):
            print(f"[pipeline] single_cs: training -> {single.savedir}")
            results["single_cs"] = build_trainer(single).fit()
        # the ft chain follows --order like the proposed chain does (the
        # notebook records both 3-head ft chains, cells 21-22): ft_step2
        # fine-tunes the order's second domain, ft_step3 its third
        ft2 = C.ft_step(
            order=order2, savedir=stage_dir("ft_step2"),
            state=os.path.join(stage_dir("single_cs"), "best"), **common,
        )
        if not done("ft_step2"):
            print(f"[pipeline] ft_step2: training -> {ft2.savedir}")
            results["ft_step2"] = build_trainer(ft2).fit()
        ft3 = C.ft_step(
            order=order3, savedir=stage_dir("ft_step3"),
            state=os.path.join(stage_dir("ft_step2"), "best"), **common,
        )
        if not done("ft_step3"):
            print(f"[pipeline] ft_step3: training -> {ft3.savedir}")
            results["ft_step3"] = build_trainer(ft3).fit()
        mt = C.multitask(
            savedir=stage_dir("multitask"),
            pretrained_encoder=pretrained_encoder, **common,
        )
        if not done("multitask"):
            print(f"[pipeline] multitask: training -> {mt.savedir}")
            results["multitask"] = build_trainer(mt).fit()
    return results
