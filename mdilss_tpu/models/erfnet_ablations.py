"""Ablation model variants of ERFNet-RAP (reconstructions).

The reference's step-1 trainer dispatches on five model names
(train_RAPFT_step1.py:451-460) and carries per-variant freeze rules
(:176-242), but only `erfnet_RA_parallel` ships in the repo — the four
ablation files are absent upstream ("can be requested", README.md:44). These
reconstructions infer each variant's domain-specific parameter surface from
the freeze rules' key patterns (see models/blocks.py's ablation section for
the per-variant derivation):

  erfnet_bn          DSBN-only: shared convs, per-task BN
  erfnet_onlyRAP     per-task parallel 1x1 adapters, shared BN
  erfnet_RA_series   per-task series (residual) 1x1 adapters + per-task BN
  erfnet_RCM         per-task CxC reparameterization matrices + per-task BN

All variants keep entirely per-task decoders, exactly like the RAP model.
Pytree layout mirrors erfnet_rap (task-stacked DS leaves, scan block groups),
so checkpoint surgery (`ckpt.surgery.extend_for_new_task`) and Orbax IO work
unchanged. There are no released reference checkpoints for these variants, so
no .pth.tar converter grammar exists — they round-trip through this
framework's own Orbax format only.
"""
from __future__ import annotations

import functools
from types import SimpleNamespace
from typing import Sequence

import jax
import jax.numpy as jnp

from . import topology as T
from .blocks import ABLATION_VARIANTS

# reference --model flag values -> internal variant keys
REFERENCE_NAMES = {
    "erfnet_bn": "bn",
    "erfnet_onlyRAP": "onlyrap",
    "erfnet_RA_series": "ras",
    "erfnet_RCM": "rcm",
}


def init(rng, num_classes: Sequence[int], nb_tasks: int, *, variant: str, dtype=jnp.float32):
    assert variant in ABLATION_VARIANTS, variant
    assert len(num_classes) == nb_tasks
    rngs = jax.random.split(rng, 1 + nb_tasks)
    enc_p, enc_s = T.encoder_init(
        rngs[0], rap=False, nb_tasks=nb_tasks, dtype=dtype, variant=variant
    )
    dec = [T.decoder_init(r, nc, dtype) for r, nc in zip(rngs[1:], num_classes)]
    return (
        {"encoder": enc_p, "decoders": [p for p, _ in dec]},
        {"encoder": enc_s, "decoders": [s for _, s in dec]},
    )


def apply(params, state, x, task: int, *, variant: str, training: bool = False,
          rng=None, remat: bool = False, drop_masks=None, return_features: bool = False,
          packed_head: bool = False, input_folded: bool = False,
          fused_infer: bool = False, fused_train: bool = False):
    """Same contract as erfnet_rap.apply; fused Pallas paths are rap/plain
    only (encoder_apply raises if requested for an ablation variant)."""
    feats, enc_s = T.encoder_apply(
        params["encoder"], state["encoder"], x, rap=False, task=task,
        training=training, rng=rng, remat=remat, drop_masks=drop_masks,
        input_folded=input_folded, variant=variant,
        fused_infer=fused_infer, fused_train=fused_train,
    )
    dec_out = T.decoder_apply(
        params["decoders"][task], state["decoders"][task], feats,
        training=training, remat=remat, return_penultimate=return_features,
        packed_head=packed_head,
    )
    logits, dec_s = dec_out[0], dec_out[1]
    new_dec = list(state["decoders"])
    new_dec[task] = dec_s
    new_state = {"encoder": enc_s, "decoders": new_dec}
    if return_features:
        return logits, new_state, {"encoder": feats, "penultimate": dec_out[2]}
    return logits, new_state


def nb_tasks_of(params) -> int:
    return len(params["decoders"])


@functools.lru_cache(maxsize=None)
def model_module(variant: str) -> SimpleNamespace:
    """A module-like namespace with the (init, apply, nb_tasks_of) surface the
    Trainer expects, closed over one variant."""
    assert variant in ABLATION_VARIANTS, variant
    return SimpleNamespace(
        variant=variant,
        init=functools.partial(init, variant=variant),
        apply=functools.partial(apply, variant=variant),
        nb_tasks_of=nb_tasks_of,
    )
