"""ERFNet topology: encoder/decoder assembly shared by all model variants.

Topology (identical across all 5 reference model files, models/erfnet.py:65-135):
  Encoder: Down(3->16); Down(16->64); 5x nb1d(64, p=.03, d=1); Down(64->128);
           2x [nb1d(128, .3, 2), nb1d(128, .3, 4), nb1d(128, .3, 8),
               nb1d(128, .3, 16)]  -> 128ch @ H/8 x W/8
  Decoder: Up(128->64); 2x nb1d(64,0,1); Up(64->16); 2x nb1d(16,0,1);
           ConvTranspose2d(16->num_classes, k2 s2).

The RAP encoder swaps nb1d for nb1d_RAP and makes every BN per-task
(models/erfnet_RA_parallel.py:123-149). Decoders never carry RAP adapters.
"""
from __future__ import annotations

from typing import Any

import jax

from . import blocks as B

# (kind, *args): ("down", nin, nout) | ("nb", ch, dropprob, dilated)
ENCODER_PLAN: tuple = (
    ("down", 16, 64),
    *[("nb", 64, 0.03, 1)] * 5,
    ("down", 64, 128),
    *[("nb", 128, 0.3, d) for _ in range(2) for d in (2, 4, 8, 16)],
)

DECODER_PLAN: tuple = (
    ("up", 128, 64),
    ("nb", 64, 0.0, 1),
    ("nb", 64, 0.0, 1),
    ("up", 64, 16),
    ("nb", 16, 0.0, 1),
    ("nb", 16, 0.0, 1),
)


def encoder_init(rng, *, rap: bool, nb_tasks: int | None, dtype):
    """`rap=True` builds RAP blocks + per-task BN; else plain shared blocks.

    For plain encoders pass nb_tasks=None (BN not task-stacked).
    """
    n_rngs = 1 + len(ENCODER_PLAN)
    rngs = jax.random.split(rng, n_rngs)
    init_p, init_s = B.downsampler_init(rngs[0], 3, 16, nb_tasks, dtype)
    blocks_p, blocks_s = [], []
    for r, spec in zip(rngs[1:], ENCODER_PLAN):
        if spec[0] == "down":
            p, s = B.downsampler_init(r, spec[1], spec[2], nb_tasks, dtype)
        elif rap:
            p, s = B.nb1d_rap_init(r, spec[1], spec[3], nb_tasks, dtype)
        else:
            p, s = B.nb1d_init(r, spec[1], spec[3], dtype)
        blocks_p.append(p)
        blocks_s.append(s)
    return {"initial": init_p, "blocks": blocks_p}, {"initial": init_s, "blocks": blocks_s}


def encoder_apply(
    params, state, x, *, rap: bool, task: int | None, training: bool, rng=None
) -> tuple[Any, Any]:
    """Run the 16-block encoder. `task` must be a static int for RAP encoders."""
    n_drop = sum(1 for s in ENCODER_PLAN if s[0] == "nb")
    drop_rngs = list(jax.random.split(rng, n_drop)) if rng is not None else [None] * n_drop
    out, init_s = B.downsampler_apply(params["initial"], state["initial"], x, task=task, training=training)
    new_blocks = []
    di = 0
    for p, s, spec in zip(params["blocks"], state["blocks"], ENCODER_PLAN):
        if spec[0] == "down":
            out, ns = B.downsampler_apply(p, s, out, task=task, training=training)
        else:
            _, ch, dropprob, dilated = spec
            if rap:
                out, ns = B.nb1d_rap_apply(
                    p, s, out, task=task, dilated=dilated, dropprob=dropprob,
                    training=training, rng=drop_rngs[di],
                )
            else:
                out, ns = B.nb1d_apply(
                    p, s, out, dilated=dilated, dropprob=dropprob,
                    training=training, rng=drop_rngs[di],
                )
            di += 1
        new_blocks.append(ns)
    return out, {"initial": init_s, "blocks": new_blocks}


def decoder_init(rng, num_classes: int, dtype):
    rngs = jax.random.split(rng, len(DECODER_PLAN) + 1)
    blocks_p, blocks_s = [], []
    for r, spec in zip(rngs[:-1], DECODER_PLAN):
        if spec[0] == "up":
            p, s = B.upsampler_init(r, spec[1], spec[2], dtype)
        else:
            p, s = B.nb1d_init(r, spec[1], spec[3], dtype)
        blocks_p.append(p)
        blocks_s.append(s)
    out_p = B.conv_transpose_init(rngs[-1], 2, 2, 16, num_classes, dtype)
    return {"blocks": blocks_p, "output_conv": out_p}, {"blocks": blocks_s}


def decoder_apply(params, state, x, *, training: bool):
    from ..ops import conv_transpose2d

    out = x
    new_blocks = []
    for p, s, spec in zip(params["blocks"], state["blocks"], DECODER_PLAN):
        if spec[0] == "up":
            out, ns = B.upsampler_apply(p, s, out, training=training)
        else:
            # decoder nb1d blocks have dropprob=0 => no rng needed
            out, ns = B.nb1d_apply(p, s, out, dilated=spec[3], dropprob=0.0, training=training)
        new_blocks.append(ns)
    out = conv_transpose2d(
        out, params["output_conv"]["w"], params["output_conv"]["b"],
        stride=2, padding=0, output_padding=0,
    )
    return out, {"blocks": new_blocks}
