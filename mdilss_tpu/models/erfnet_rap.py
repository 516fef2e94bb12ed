"""ERFNet-RAP: the proposed multi-domain incremental model.

Shared encoder convs + per-task RAP 1x1 adapters + per-task BN in the encoder;
entirely per-task decoders (reference models/erfnet_RA_parallel.py:194-212).

Differences from the reference implementation (by design, TPU-first):
  * No module-global `current_task` mutated inside forward
    (erfnet_RA_parallel.py:11,199-211 — a documented hazard in SURVEY.md §2.2);
    the task is an explicit static argument to `apply`.
  * Domain-specific leaves are stacked on a leading task axis [T, ...], so the
    incremental-step parameter surgery (SURVEY.md §2.6) is pure array indexing
    (see ckpt/surgery.py), and freeze masks are per-task slices of one array.
  * Decoders with different class counts (20/20/27) live as separate pytrees in
    a list; selecting a head is static => at most `nb_tasks` compiled variants.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from . import topology as T


def init(rng, num_classes: Sequence[int] = (20,), nb_tasks: int = 1, dtype=jnp.float32):
    """Build params/state for `nb_tasks` tasks with per-task class counts."""
    assert len(num_classes) == nb_tasks
    rngs = jax.random.split(rng, 1 + nb_tasks)
    enc_p, enc_s = T.encoder_init(rngs[0], rap=True, nb_tasks=nb_tasks, dtype=dtype)
    dec = [T.decoder_init(r, nc, dtype) for r, nc in zip(rngs[1:], num_classes)]
    return (
        {"encoder": enc_p, "decoders": [p for p, _ in dec]},
        {"encoder": enc_s, "decoders": [s for _, s in dec]},
    )


def apply(params, state, x, task: int, *, training: bool = False, rng=None, remat: bool = False, fused_infer: bool = False, drop_masks=None, return_features: bool = False, packed_head: bool = False, fused_train: bool = False, input_folded: bool = False):
    """x: [N, H, W, 3] -> logits [N, H, W, num_classes[task]].

    `task` must be a static Python int (selects adapters/BN slices and the
    decoder head at trace time). `remat=True` rematerializes the encoder's
    scan groups in the backward pass (activation memory for FLOPs).

    `return_features=True` additionally returns latent features
    {"encoder": [N,H/8,W/8,128], "penultimate": [N,H/2,W/2,16]} — the
    notebooks' `erfnet_RA_parallel_latent_space` variant's
    (output, output_penultimate, output_enc) (Plot_Tsne_Notebook cells 13,24).
    """
    feats, enc_s = T.encoder_apply(
        params["encoder"], state["encoder"], x, rap=True, task=task,
        training=training, rng=rng, remat=remat, fused_infer=fused_infer,
        drop_masks=drop_masks, fused_train=fused_train, input_folded=input_folded,
    )
    dec_out = T.decoder_apply(
        params["decoders"][task], state["decoders"][task], feats,
        training=training, remat=remat, fused_infer=fused_infer,
        return_penultimate=return_features, packed_head=packed_head,
        fused_train=fused_train,
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
