"""Vanilla single-task ERFNet (reference models/erfnet.py:140-149).

Used for single-task baselines and as the eval path for the upstream
Eromera-style checkpoints. Pure-functional: `init` builds (params, state)
pytrees, `apply` returns NHWC logits and the updated BN state.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import topology as T


def init(rng, num_classes: int = 20, dtype=jnp.float32):
    enc_rng, dec_rng = jax.random.split(rng)
    enc_p, enc_s = T.encoder_init(enc_rng, rap=False, nb_tasks=None, dtype=dtype)
    dec_p, dec_s = T.decoder_init(dec_rng, num_classes, dtype)
    return {"encoder": enc_p, "decoder": dec_p}, {"encoder": enc_s, "decoder": dec_s}


def apply(params, state, x, *, training: bool = False, rng=None, remat: bool = False, fused_infer: bool = False, drop_masks=None, return_features: bool = False, packed_head: bool = False, fused_train: bool = False, input_folded: bool = False):
    """x: [N, H, W, 3] -> logits [N, H, W, num_classes].

    `return_features=True` additionally returns {"encoder", "penultimate"}
    latent features (the notebooks' `erfnet_latent_space` variant)."""
    feats, enc_s = T.encoder_apply(
        params["encoder"], state["encoder"], x, rap=False, task=None,
        training=training, rng=rng, remat=remat, fused_infer=fused_infer,
        drop_masks=drop_masks, fused_train=fused_train, input_folded=input_folded,
    )
    dec_out = T.decoder_apply(
        params["decoder"], state["decoder"], feats, training=training,
        remat=remat, fused_infer=fused_infer, return_penultimate=return_features,
        packed_head=packed_head, fused_train=fused_train,
    )
    new_state = {"encoder": enc_s, "decoder": dec_out[1]}
    if return_features:
        return dec_out[0], new_state, {"encoder": feats, "penultimate": dec_out[2]}
    return dec_out[0], new_state
