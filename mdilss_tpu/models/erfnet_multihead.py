"""Plain shared encoder + N per-domain decoder heads.

One model family covers three reference baselines (they are structurally
identical, differing only in head naming and selection API):
  * erfnet_multi_task.py:146-160 — joint multi-task baseline
    (`decoder` ModuleList, selected by task index);
  * erfnet_ftp1.py:135-151 — 2-head fine-tuning baseline
    (`decoder_old` / `decoder_new`, selected by bool flags);
  * erfnet_ftp2.py:135-152 — 3-head fine-tuning baseline
    (`decoder_old1` / `decoder_old2` / `decoder_new`).

Here heads are always a list indexed by a static int; the FT baselines' flag
API maps to head indices (old=0[,old2=1], new=last). The encoder BN is shared
(not task-stacked), exactly as in those baselines.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from . import topology as T


def init(rng, num_classes: Sequence[int], dtype=jnp.float32):
    nb = len(num_classes)
    rngs = jax.random.split(rng, 1 + nb)
    enc_p, enc_s = T.encoder_init(rngs[0], rap=False, nb_tasks=None, dtype=dtype)
    dec = [T.decoder_init(r, nc, dtype) for r, nc in zip(rngs[1:], num_classes)]
    return (
        {"encoder": enc_p, "decoders": [p for p, _ in dec]},
        {"encoder": enc_s, "decoders": [s for _, s in dec]},
    )


def apply(params, state, x, task: int, *, training: bool = False, rng=None, remat: bool = False, fused_infer: bool = False, drop_masks=None, return_features: bool = False, packed_head: bool = False, fused_train: bool = False, input_folded: bool = False):
    """`return_features=True` additionally returns {"encoder", "penultimate"}
    latent features (the notebooks' `erfnet_ftp1_latent_space` variants)."""
    feats, enc_s = T.encoder_apply(
        params["encoder"], state["encoder"], x, rap=False, task=None,
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
