"""Protocol builders: checkpoint-loading rules per incremental step.

Implements the init schemes of SURVEY.md §2.6 end-to-end:

  step1      ImageNet-pretrained encoder, module.features->module, strict=False
             (train_RAPFT_step1.py:482-502)
  step2/3    previous-step checkpoint: teacher loads it verbatim; the student
             grows by one task via pytree surgery (new DS slots seeded from
             task t-1, new decoder = copy sans output_conv)
             (train_new_task_step2.py:480-532)
  ft / fe    single-task CS checkpoint: decoder -> head 0, new head fresh
             (main_ftp1_enc_newbn.py:212-221); 3-head variant remaps
             decoder_old->head0, decoder_new->head1 (main_FT2_flexible_new.py:200-213)

Checkpoints may be reference .pth.tar files (via the converter) or this
framework's own Orbax runs (<savedir>/best).
"""
from __future__ import annotations

import os

import jax

from ..ckpt import (
    convert_state_dict,
    extend_for_new_task,
    graft_shared_encoder,
    load_imagenet_encoder,
    load_pth_tar,
    orbax_io,
)
from ..config import TrainConfig
from ..models import erfnet_ablations, erfnet_multihead, erfnet_rap
from . import steps
from .loop import Trainer


def _load_params(path: str, *, kind: str, nb_tasks: int, num_classes, seed=0):
    """Load (params, bn) from a .pth.tar or an Orbax checkpoint directory.

    Every model kind round-trips through this framework's own Orbax runs
    (<savedir>/best), so e.g. an ft 2-head run can seed a 3-head step-3 chain
    without passing through the torch format
    (main_FT2_flexible_new.py:200-213 chained .pth.tar files)."""
    if os.path.isdir(path):
        if kind == "rap":
            template_p, template_b = erfnet_rap.init(
                jax.random.key(seed), list(num_classes), nb_tasks
            )
        elif kind in erfnet_ablations.REFERENCE_NAMES:
            # ablation variants exist only as this framework's Orbax runs
            # (no torch grammar; models/erfnet_ablations.py docstring)
            template_p, template_b = erfnet_ablations.init(
                jax.random.key(seed), list(num_classes), nb_tasks,
                variant=erfnet_ablations.REFERENCE_NAMES[kind],
            )
        else:
            # erfnet / ftp1 / ftp2 / multi_task runs all checkpoint the
            # shared-encoder multi-head pytree ({encoder, decoders:[...]})
            template_p, template_b = erfnet_multihead.init(
                jax.random.key(seed), list(num_classes)
            )
        ts, *_ = orbax_io.restore(path, steps.init_train_state(template_p, template_b))
        params, bn = ts.params, ts.bn
        if kind == "erfnet":
            # callers of the single-task kind expect the erfnet layout
            # ({encoder, decoder}); our own singletask runs store one head
            params = {"encoder": params["encoder"], "decoder": params["decoders"][0]}
            bn = {"encoder": bn["encoder"], "decoder": bn["decoders"][0]}
        return params, bn
    sd = load_pth_tar(path)
    return convert_state_dict(sd, kind=kind, nb_tasks=nb_tasks)


def build_trainer(cfg: TrainConfig) -> Trainer:
    if cfg.protocol == "step1":
        return _build_step1(cfg)
    if cfg.protocol in ("step2", "step3"):
        return _build_incremental(cfg)
    if cfg.protocol in ("ft", "fe"):
        return _build_ft(cfg)
    if cfg.protocol in ("multitask", "singletask"):
        return _build_plain(cfg)
    raise ValueError(cfg.protocol)


def _build_plain(cfg: TrainConfig) -> Trainer:
    """multitask / singletask init: the reference starts both from the
    ImageNet-pretrained encoder — train_multi_task.py:414-423 loads --state
    with the module.features->module rename, and the single-task baseline's
    main.py takes --pretrainedEncoder (trainer_single_task.sh:46-52,
    trainer_multi_task.sh:50-55). An Orbax dir restores a full same-shape
    run instead."""
    src = cfg.pretrained_encoder or cfg.state
    if not src:
        return Trainer(cfg)
    if os.path.isdir(src):
        params, bn = _load_params(
            src, kind="multi_task", nb_tasks=len(cfg.num_classes),
            num_classes=cfg.num_classes, seed=cfg.seed,
        )
    else:
        params, bn = erfnet_multihead.init(
            jax.random.key(cfg.seed), list(cfg.num_classes)
        )
        sd = load_pth_tar(src)
        params, bn = load_imagenet_encoder(params, bn, sd, kind="multi_task")
    return Trainer(cfg, init_params=params, init_bn=bn)


def _is_ablation(cfg: TrainConfig) -> bool:
    return cfg.model in erfnet_ablations.REFERENCE_NAMES


def _task_stacked_init(cfg: TrainConfig, rng, num_classes, nb_tasks):
    """Fresh params for the step1/2/3 model family: RAP or an ablation
    variant (train_RAPFT_step1.py:451-460 factory)."""
    if _is_ablation(cfg):
        return erfnet_ablations.init(
            rng, list(num_classes), nb_tasks,
            variant=erfnet_ablations.REFERENCE_NAMES[cfg.model],
        )
    return erfnet_rap.init(rng, list(num_classes), nb_tasks)


def _build_step1(cfg: TrainConfig) -> Trainer:
    params, bn = _task_stacked_init(cfg, jax.random.key(cfg.seed), cfg.num_classes, 1)
    kind = cfg.model if _is_ablation(cfg) else "rap"
    src = cfg.pretrained_encoder or cfg.state
    if src and os.path.isdir(src):
        # full Orbax checkpoint of a 1-task run (e.g. a pipeline rerun)
        params, bn = _load_params(
            src, kind=kind, nb_tasks=1, num_classes=cfg.num_classes, seed=cfg.seed
        )
    elif src and _is_ablation(cfg):
        # no torch grammar for the reconstructed variants: load the ImageNet
        # encoder into a RAP template, then graft the shared convs
        tpl_p, tpl_b = erfnet_rap.init(jax.random.key(cfg.seed), list(cfg.num_classes), 1)
        tpl_p, _ = load_imagenet_encoder(tpl_p, tpl_b, load_pth_tar(src), kind="rap")
        params = graft_shared_encoder(params, tpl_p["encoder"])
    elif src:
        sd = load_pth_tar(src)
        params, bn = load_imagenet_encoder(params, bn, sd, kind="rap")
    return Trainer(cfg, init_params=params, init_bn=bn)


def _build_incremental(cfg: TrainConfig) -> Trainer:
    nb_prev = len(cfg.num_classes) - 1
    kind = cfg.model if _is_ablation(cfg) else "rap"
    if cfg.state:
        prev_p, prev_b = _load_params(
            cfg.state, kind=kind, nb_tasks=nb_prev,
            num_classes=cfg.num_classes[:nb_prev], seed=cfg.seed,
        )
    else:  # smoke runs without a real previous checkpoint
        prev_p, prev_b = _task_stacked_init(
            cfg, jax.random.key(cfg.seed + 1), cfg.num_classes[:nb_prev], nb_prev
        )
    import jax.numpy as jnp

    # the student's shared weights alias prev_p after surgery; the teacher
    # must own distinct buffers or donation of the student train state would
    # invalidate them (`f(donate(a), a)`)
    teacher = steps.ModelState(
        jax.tree.map(jnp.array, prev_p), jax.tree.map(jnp.array, prev_b)
    )
    params, bn = extend_for_new_task(
        prev_p, prev_b, cfg.num_classes[-1], jax.random.key(cfg.seed)
    )
    return Trainer(cfg, teacher=teacher, init_params=params, init_bn=bn)


def _build_ft(cfg: TrainConfig) -> Trainer:
    params, bn = erfnet_multihead.init(jax.random.key(cfg.seed), list(cfg.num_classes))
    if cfg.state:
        if len(cfg.num_classes) == 2:
            # single-task erfnet ckpt: encoder + decoder -> head 0
            loaded_p, loaded_b = _load_params(
                cfg.state, kind="erfnet", nb_tasks=1, num_classes=cfg.num_classes[:1]
            )
            params = {"encoder": loaded_p["encoder"],
                      "decoders": [loaded_p["decoder"], params["decoders"][1]]}
            bn = {"encoder": loaded_b["encoder"],
                  "decoders": [loaded_b["decoder"], bn["decoders"][1]]}
        else:
            # ftp1 ckpt: decoder_old -> head0, decoder_new -> head1
            loaded_p, loaded_b = _load_params(
                cfg.state, kind="ftp1", nb_tasks=2, num_classes=cfg.num_classes[:2]
            )
            params = {"encoder": loaded_p["encoder"],
                      "decoders": [*loaded_p["decoders"], params["decoders"][2]]}
            bn = {"encoder": loaded_b["encoder"],
                  "decoders": [*loaded_b["decoders"], bn["decoders"][2]]}
    return Trainer(cfg, init_params=params, init_bn=bn)
