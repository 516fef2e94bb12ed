"""ERFNet topology: encoder/decoder assembly shared by all model variants.

Topology (identical across all 5 reference model files, models/erfnet.py:65-135):
  Encoder: Down(3->16); Down(16->64); 5x nb1d(64, p=.03, d=1); Down(64->128);
           2x [nb1d(128, .3, 2), nb1d(128, .3, 4), nb1d(128, .3, 8),
               nb1d(128, .3, 16)]  -> 128ch @ H/8 x W/8
  Decoder: Up(128->64); 2x nb1d(64,0,1); Up(64->16); 2x nb1d(16,0,1);
           ConvTranspose2d(16->num_classes, k2 s2).

The RAP encoder swaps nb1d for nb1d_RAP and makes every BN per-task
(models/erfnet_RA_parallel.py:123-149). Decoders never carry RAP adapters.

TPU-native structure: repeated homogeneous blocks are *stacked* on a leading
group axis and executed with `lax.scan` — the XLA program contains each block
body once instead of N times. This cuts lowering/compile time ~4x (the axon
PJRT path lowers per-op) and gives a natural `jax.checkpoint` boundary for
rematerialization. Group axes:

  encoder: initial (Down 3->16) | down1 (16->64) | group64 [5] x nb(64,.03,1)
           | down2 (64->128)    | group128 [2] x chain(d2, d4, d8, d16)
  decoder: up1 | group64 [2] x nb(64,0,1) | up2 | group16 [2] x nb(16,0,1)
           | output_conv

Stacked leaves carry the group axis FIRST, before any task axis: a RAP leaf in
group64 is [5, T, ...]; scan slices off the leading axis so block code always
sees the same per-block layout.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from . import blocks as B
from ..ops import conv_transpose2d
from ..ops.norm import BNState

# Rematerialization policy for the `remat=True` checkpointed block bodies.
# None (the default) is jax.checkpoint's save-nothing policy: the whole body,
# dot_generals included, replays in the backward pass. Set to e.g.
# jax.checkpoint_policies.dots_saveable to save matmul outputs and replay only
# the elementwise glue — trades HBM for replay FLOPs (tools/remat_policy_exp.py
# measures the trade; see docs/DESIGN.md for the verdict).
REMAT_POLICY = None


def _ckpt(fn):
    if REMAT_POLICY is None:
        return jax.checkpoint(fn)
    return jax.checkpoint(fn, policy=REMAT_POLICY)

# Flat per-layer view (still used by the checkpoint converter to map the
# reference's encoder.layers.{i} key grammar onto the grouped layout):
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

GROUP128_DILATIONS = (2, 4, 8, 16)


def _stack_group(inits: list[tuple[Any, Any]]):
    """Stack per-block (params, state) pytrees on a new leading group axis."""
    params = jax.tree.map(lambda *xs: jnp.stack(xs), *[p for p, _ in inits])
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *[s for _, s in inits])
    return params, states


def encoder_init(rng, *, rap: bool, nb_tasks: int | None, dtype, variant: str | None = None):
    """`rap=True` builds RAP blocks + per-task BN; else plain shared blocks
    (pass nb_tasks=None). `variant` selects an ablation encoder instead
    (blocks.ABLATION_VARIANTS; overrides `rap`)."""
    if variant is None:
        variant = "rap" if rap else "plain"
    rngs = jax.random.split(rng, 16)

    def nb_init(r, ch, dil):
        if variant == "rap":
            return B.nb1d_rap_init(r, ch, dil, nb_tasks, dtype)
        if variant == "plain":
            return B.nb1d_init(r, ch, dil, dtype)
        return B.nb1d_ablation_init(r, ch, dil, nb_tasks, variant, dtype)

    # downsampler BN (the reference's `bn_ini`) is task-stacked exactly when
    # the variant's BN is per-task; onlyrap keeps it shared
    ds_tasks = nb_tasks if variant in B.PER_TASK_BN_VARIANTS else None
    init_p, init_s = B.downsampler_init(rngs[0], 3, 16, ds_tasks, dtype)
    down1_p, down1_s = B.downsampler_init(rngs[1], 16, 64, ds_tasks, dtype)
    g64_p, g64_s = _stack_group([nb_init(rngs[2 + i], 64, 1) for i in range(5)])
    down2_p, down2_s = B.downsampler_init(rngs[7], 64, 128, ds_tasks, dtype)
    # group128: [2] x chain over the 4 dilations; one dict entry per dilation
    g128 = {}
    g128_s = {}
    for j, d in enumerate(GROUP128_DILATIONS):
        p, s = _stack_group([nb_init(rngs[8 + 4 * rep + j], 128, d) for rep in range(2)])
        g128[f"d{d}"] = p
        g128_s[f"d{d}"] = s
    return (
        {"initial": init_p, "down1": down1_p, "group64": g64_p, "down2": down2_p, "group128": g128},
        {"initial": init_s, "down1": down1_s, "group64": g64_s, "down2": down2_s, "group128": g128_s},
    )


# lax.scan vs unrolled: measured on the target chip the scan version is
# FASTER (332 vs 405 ms/step for the full distill step) in addition to
# compiling quicker, so scan is the default. The flag remains for profiling.
UNROLL_GROUPS = False


def _scan_blocks(body, x, params, state, rngs, *, training: bool, unroll: bool = False):
    """Run `body(carry_x, params_i, state_i, rng_i) -> (x', state_i')` over
    the leading group axis; returns (x_out, stacked new states)."""
    if UNROLL_GROUPS or unroll:
        n = jax.tree.leaves(params)[0].shape[0]
        outs = []
        for i in range(n):
            p_i = jax.tree.map(lambda a: a[i], params)
            s_i = jax.tree.map(lambda a: a[i], state)
            x, ns = body(x, p_i, s_i, rngs[i])
            outs.append(ns)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
        return x, stacked

    def step(carry, xs):
        p_i, s_i, r_i = xs
        out, ns = body(carry, p_i, s_i, r_i)
        return out, ns

    x_out, new_states = jax.lax.scan(step, x, (params, state, rngs))
    return x_out, new_states


def dropout_mask_shapes(batch: int) -> dict:
    """Shapes of the encoder's per-group dropout masks (host-generated).

    ANY in-program RNG (threefry or rbg) feeding the scan bodies costs ~120 ms
    per train step on the target chip (measured; the same masks passed as jit
    INPUTS cost nothing), so mask generation lives on the host: the trainer
    draws numpy bernoulli masks per batch and ships ~10 KB with the images.
    Keep-probabilities: group64 1-0.03, group128 1-0.3 (models/erfnet.py:75-83).
    """
    return {
        "g64": (5, batch, 1, 1, 64),
        "g128": (2, len(GROUP128_DILATIONS), batch, 1, 1, 128),
    }


def make_dropout_masks(np_rng, batch: int) -> dict:
    """Host-side (numpy) bernoulli KEEP-masks for one training step."""
    import numpy as np

    shapes = dropout_mask_shapes(batch)
    return {
        "g64": np_rng.random(shapes["g64"]) < (1 - 0.03),
        "g128": np_rng.random(shapes["g128"]) < (1 - 0.3),
    }


def _group_masks(rng, shape, keep: float):
    """Fallback in-program mask draw (slow on the axon runtime — prefer
    passing host-generated masks via `drop_masks`)."""
    if rng is None:
        return jnp.zeros(shape, jnp.bool_), False
    return jax.random.bernoulli(rng, keep, shape), True


def encoder_apply(
    params, state, x, *, rap: bool, task: int | None, training: bool, rng=None,
    remat: bool = False, fused_infer: bool = False, drop_masks: dict | None = None,
    fused_train: bool = False, input_folded: bool = False, variant: str | None = None,
) -> tuple[Any, Any]:
    """Run the encoder. `task` must be a static int for RAP encoders.

    `fused_infer=True` (eval mode only) runs each nb1d block as ONE Pallas
    kernel (folded BN, whole block in VMEM) instead of ~10 XLA ops.
    `fused_train=True` (training mode) runs each nb1d block through the fused
    Pallas conv-pair kernels with a custom VJP (ops/pallas/nb1d_train.py).
    `input_folded=True` means x is `blocks.fold_input(raw)` — train steps fold
    the batch once and share it across all their forwards.
    `variant` selects an ablation encoder (XLA path only).
    """
    if variant is None:
        variant = "rap" if rap else "plain"
    if variant not in ("rap", "plain") and (fused_infer or fused_train):
        raise ValueError(
            f"fused paths cover the rap/plain encoders only, not {variant!r}"
        )
    # onlyrap's downsampler BN is shared; other task-stacked variants index it
    ds_task = task if variant in B.PER_TASK_BN_VARIANTS else None
    fused = fused_infer and not training
    ftrain = fused_train and training
    r = list(jax.random.split(rng, 2)) if rng is not None else [None, None]
    out, init_s = B.downsampler_apply(params["initial"], state["initial"], x, task=ds_task,
                                      training=training, x_folded=input_folded)
    out, down1_s = B.downsampler_apply(params["down1"], state["down1"], out, task=ds_task, training=training)

    def nb_apply(p, s, xin, dil, drop, mask):
        if fused:
            from ..ops.pallas.nb1d import nb1d_fused_infer

            bn_keys = ("bns1", "bns2") if rap else ("bn1", "bn2")
            y = nb1d_fused_infer(xin, p, s[bn_keys[0]], s[bn_keys[1]], dilated=dil, task=task)
            return y, s
        # fused-train coverage: d=16 trips a Mosaic lowering blowup and
        # C<64 a lane-padding failure on the current libtpu; those blocks
        # (2 of 17 + the two 16-channel decoder blocks) use the XLA path
        if ftrain and dil < 16 and xin.shape[-1] >= 64:
            return B.nb1d_fused_train_apply(
                p, s, xin, task=task, dilated=dil, dropprob=drop, drop_mask=mask,
            )
        if variant == "rap":
            return B.nb1d_rap_apply(
                p, s, xin, task=task, dilated=dil, dropprob=drop, training=training,
                drop_mask=mask,
            )
        if variant == "plain":
            return B.nb1d_apply(
                p, s, xin, dilated=dil, dropprob=drop, training=training, drop_mask=mask
            )
        return B.nb1d_ablation_apply(
            p, s, xin, variant=variant, task=task, dilated=dil, dropprob=drop,
            training=training, drop_mask=mask,
        )

    # ---- group64: scan over 5 identical nb(64, .03, 1) blocks ----
    n = x.shape[0]
    if drop_masks is not None and training:
        masks64, has_m64 = jnp.asarray(drop_masks["g64"]), True
    else:
        masks64, has_m64 = _group_masks(r[0], (5, n, 1, 1, 64), 1 - 0.03)

    def body64(xin, p_i, s_i, mk):
        return nb_apply(p_i, s_i, xin, 1, 0.03, mk if has_m64 else None)

    if remat:
        body64 = _ckpt(body64)
    # pallas_call inside a scanned body trips a lowering-cache bug; the fused
    # path unrolls (inference does not retrace per epoch, compile cost is one-off)
    out, g64_s = _scan_blocks(body64, out, params["group64"], state["group64"], masks64,
                              training=training, unroll=fused or ftrain)

    out, down2_s = B.downsampler_apply(params["down2"], state["down2"], out, task=ds_task, training=training)

    # ---- group128: scan [2] x chain(d2, d4, d8, d16) ----
    if drop_masks is not None and training:
        masks128, has_m128 = jnp.asarray(drop_masks["g128"]), True
    else:
        masks128, has_m128 = _group_masks(
            r[1], (2, len(GROUP128_DILATIONS), n, 1, 1, 128), 1 - 0.3
        )

    def body128(xin, p_i, s_i, mk):
        new_s = {}
        for j, d in enumerate(GROUP128_DILATIONS):
            xin, new_s[f"d{d}"] = nb_apply(
                p_i[f"d{d}"], s_i[f"d{d}"], xin, d, 0.3, mk[j] if has_m128 else None
            )
        return xin, new_s

    if remat:
        body128 = _ckpt(body128)
    out, g128_s = _scan_blocks(body128, out, params["group128"], state["group128"], masks128,
                               training=training, unroll=fused or ftrain)

    return out, {
        "initial": init_s, "down1": down1_s, "group64": g64_s,
        "down2": down2_s, "group128": g128_s,
    }


def decoder_init(rng, num_classes: int, dtype):
    rngs = jax.random.split(rng, 7)
    up1_p, up1_s = B.upsampler_init(rngs[0], 128, 64, dtype)
    g64_p, g64_s = _stack_group([B.nb1d_init(rngs[1 + i], 64, 1, dtype) for i in range(2)])
    up2_p, up2_s = B.upsampler_init(rngs[3], 64, 16, dtype)
    g16_p, g16_s = _stack_group([B.nb1d_init(rngs[4 + i], 16, 1, dtype) for i in range(2)])
    out_p = B.conv_transpose_init(rngs[6], 2, 2, 16, num_classes, dtype)
    return (
        {"up1": up1_p, "group64": g64_p, "up2": up2_p, "group16": g16_p, "output_conv": out_p},
        {"up1": up1_s, "group64": g64_s, "up2": up2_s, "group16": g16_s},
    )


def decoder_apply(params, state, x, *, training: bool, remat: bool = False,
                  fused_infer: bool = False, return_penultimate: bool = False,
                  packed_head: bool = False, fused_train: bool = False):
    """`return_penultimate=True` additionally returns the 16-channel features
    entering `output_conv` (the notebooks' `*_latent_space` model variants'
    `output_penultimate`, Plot_Tsne_Notebook cell 24).

    `packed_head=True` returns logits in sub-pixel-packed layout
    [N, H/2, W/2, 4, C] (ops.conv_transpose2d_packed) — the training fast
    path; losses/argmax consume it directly, `ops.unpack_subpixel` restores
    spatial layout."""
    out, up1_s = B.upsampler_apply(params["up1"], state["up1"], x, training=training)
    fused = fused_infer and not training
    ftrain = fused_train and training

    def body(xin, p_i, s_i, _):
        if fused:
            from ..ops.pallas.nb1d import nb1d_fused_infer

            return nb1d_fused_infer(xin, p_i, s_i["bn1"], s_i["bn2"], dilated=1), s_i
        if ftrain and xin.shape[-1] >= 64:
            return B.nb1d_fused_train_apply(
                p_i, s_i, xin, task=None, dilated=1, dropprob=0.0,
            )
        return B.nb1d_apply(p_i, s_i, xin, dilated=1, dropprob=0.0, training=training)

    if remat:
        body = _ckpt(body)
    dummy = jnp.zeros((2, 1))
    # unroll only where a Pallas body is actually active (pallas_call inside
    # a scanned body trips a lowering-cache bug; scan stays for XLA bodies —
    # unrolled XLA blocks lose the hoisting the scan body enjoys; unrolling
    # the 2-block decoder scans is measured perf-neutral, 118.0 vs 118.7
    # ms/step — the big boundary copies are MSA prefetches into VMEM (S(1)),
    # not scan-carry canonicalization)
    out, g64_s = _scan_blocks(body, out, params["group64"], state["group64"], dummy,
                              training=training, unroll=fused or (ftrain and out.shape[-1] >= 64))
    out, up2_s = B.upsampler_apply(params["up2"], state["up2"], out, training=training)
    out, g16_s = _scan_blocks(body, out, params["group16"], state["group16"], dummy,
                              training=training, unroll=fused or (ftrain and out.shape[-1] >= 64))
    penultimate = out
    if packed_head:
        from ..ops import conv_transpose2d_packed

        out = conv_transpose2d_packed(
            out, params["output_conv"]["w"], params["output_conv"]["b"]
        )
    else:
        out = conv_transpose2d(
            out, params["output_conv"]["w"], params["output_conv"]["b"],
            stride=2, padding=0, output_padding=0,
        )
    new_state = {"up1": up1_s, "group64": g64_s, "up2": up2_s, "group16": g16_s}
    if return_penultimate:
        return out, new_state, penultimate
    return out, new_state


# ---------------------------------------------------------------------------
# Flat <-> grouped addressing (used by converter / surgery / masks)
# ---------------------------------------------------------------------------

def encoder_layer_address(i: int) -> tuple[str, int | tuple[int, str] | None]:
    """Map reference `encoder.layers.{i}` to (segment, index-within-segment).

    Returns ("down1"|"down2", None) or ("group64", k) or ("group128", (rep, "d{d}")).
    """
    if i == 0:
        return "down1", None
    if 1 <= i <= 5:
        return "group64", i - 1
    if i == 6:
        return "down2", None
    j = i - 7
    rep, pos = divmod(j, 4)
    return "group128", (rep, f"d{GROUP128_DILATIONS[pos]}")


def decoder_layer_address(j: int) -> tuple[str, int | None]:
    """Map reference `decoder.layers.{j}` to (segment, index)."""
    return [
        ("up1", None), ("group64", 0), ("group64", 1),
        ("up2", None), ("group16", 0), ("group16", 1),
    ][j]
