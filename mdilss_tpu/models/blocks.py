"""ERFNet building blocks as pure functions over param/state pytrees.

Behavioral spec from the reference model definitions:
  * DownsamplerBlock = concat(conv3x3/s2 (nout-nin ch), maxpool2x2) -> BN -> relu
    (reference models/erfnet.py:12-23; RAP variant with per-task `bn_ini`,
    models/erfnet_RA_parallel.py:13-25).
  * non_bottleneck_1d = 3x1 -> relu -> 1x3 -> BN -> relu -> 3x1(dil) -> relu
    -> 1x3(dil) -> BN -> dropout2d -> relu(out + residual)
    (models/erfnet.py:26-62).
  * non_bottleneck_1d_RAP inserts `out += rap_k[task](block_input)` 1x1 convs
    before each BN and makes both BNs per-task
    (models/erfnet_RA_parallel.py:67-113).
  * UpsamplerBlock = ConvTranspose2d(3, s2, p1, op1) -> BN -> relu
    (models/erfnet.py:97-107).

TPU-first choices: NHWC layout; domain-specific (DS) leaves carry a leading
task axis [T, ...] so incremental-step surgery is array indexing; the task
index is a *static* Python int at trace time (3 heads => at most 3 compiled
variants, the encoder math itself is identical so XLA caches aggressively).

Initialization matches torch defaults (kaiming-uniform a=sqrt(5) => bound
1/sqrt(fan_in) for both weight and bias) so from-scratch training follows the
same distributional recipe as the reference.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import batch_norm_apply, bn_init, conv2d, conv_transpose2d, dropout2d, maxpool2d
from ..ops.norm import BNState

Params = dict[str, Any]
State = dict[str, Any]

BN_EPS = 1e-3  # reference uses eps=1e-3 on every BN (models/erfnet.py:18)


# ---------------------------------------------------------------------------
# Initializers (torch nn.Conv2d / nn.ConvTranspose2d defaults)
# ---------------------------------------------------------------------------

def conv_init(rng, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32) -> Params:
    """U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for weight [kh,kw,cin,cout] and bias."""
    fan_in = cin * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    kw_rng, b_rng = jax.random.split(rng)
    return {
        "w": jax.random.uniform(kw_rng, (kh, kw, cin, cout), dtype, -bound, bound),
        "b": jax.random.uniform(b_rng, (cout,), dtype, -bound, bound),
    }


def conv_transpose_init(rng, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32) -> Params:
    """Torch ConvTranspose2d default: fan computed positionally on the
    (cin, cout, kh, kw) weight, i.e. fan_in = cout * kh * kw."""
    fan_in = cout * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    kw_rng, b_rng = jax.random.split(rng)
    return {
        "w": jax.random.uniform(kw_rng, (kh, kw, cin, cout), dtype, -bound, bound),
        "b": jax.random.uniform(b_rng, (cout,), dtype, -bound, bound),
    }


def stacked_conv1x1_init(rng, nb_tasks: int, ch: int, dtype=jnp.float32) -> Params:
    """Per-task RAP 1x1 convs stacked on a leading task axis [T,1,1,C,C]."""
    rngs = jax.random.split(rng, nb_tasks)
    inits = [conv_init(r, 1, 1, ch, ch, dtype) for r in rngs]
    return {
        "w": jnp.stack([i["w"] for i in inits]),
        "b": jnp.stack([i["b"] for i in inits]),
    }


# ---------------------------------------------------------------------------
# BN helpers for optionally task-stacked layers
# ---------------------------------------------------------------------------

def _bn_apply(p: Params, s: BNState, x, *, task: int | None, training: bool):
    """Apply BN; if `task` is given, params/state have a leading task axis."""
    if task is None:
        return batch_norm_apply(x, p["scale"], p["bias"], s, eps=BN_EPS, training=training)
    sub = BNState(mean=s.mean[task], var=s.var[task])
    out, new_sub = batch_norm_apply(
        x, p["scale"][task], p["bias"][task], sub, eps=BN_EPS, training=training
    )
    if training:
        s = BNState(mean=s.mean.at[task].set(new_sub.mean), var=s.var.at[task].set(new_sub.var))
    return out, s


# ---------------------------------------------------------------------------
# DownsamplerBlock
# ---------------------------------------------------------------------------

def downsampler_init(rng, nin: int, nout: int, nb_tasks: int | None, dtype=jnp.float32):
    bn_p, bn_s = bn_init(nout, nb_tasks, dtype)
    return (
        {"conv": conv_init(rng, 3, 3, nin, nout - nin, dtype), "bn": bn_p},
        {"bn": bn_s},
    )


def fold_input(x):
    """Space-to-depth fold [N,H,W,C] -> [N,H/2,W/2,4C] (fold cells row-major:
    (0,0),(0,1),(1,0),(1,1)) — the layout `_downsampler_s2d` consumes.

    Data-only, so a train step whose loss runs several forwards over ONE batch
    (student current + prev tasks, frozen teacher, plus remat replays) can
    fold once OUTSIDE all autodiff/checkpoint regions and pass the folded
    tensor to every forward (`apply(..., input_folded=True)`). Profiled on
    512x1024 bs-6: each in-forward fold materializes a ~0.7-0.9 ms layout
    copy, repeated per forward/replay — hoisting removes all but one."""
    n, h, w, c = x.shape
    return (x.reshape(n, h // 2, 2, w // 2, 2, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(n, h // 2, w // 2, 4 * c))


def downsampler_apply(p: Params, s: State, x, *, task: int | None, training: bool,
                      x_folded: bool = False):
    if x_folded:
        # x is fold_input(raw): valid only for the s2d path
        out = _downsampler_s2d(p, x, folded=True)
    elif training and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        # Space-to-depth form: the stride-2 conv becomes 4 shifted matmuls on
        # the [N,H/2,W/2,4C] tensor and the maxpool a max over the 4 fold
        # groups. Same math; measured faster fwd+bwd than conv_general_dilated
        # + reduce_window (whose backward lowers to select-and-scatter).
        out = _downsampler_s2d(p, x)
    else:
        conv = conv2d(x, p["conv"]["w"], p["conv"]["b"], stride=2, padding=1)
        pool = maxpool2d(x, 2, 2)
        out = jnp.concatenate([conv, pool], axis=-1)  # conv first, as in torch.cat
    out, bn_s = _bn_apply(p["bn"], s["bn"], out, task=task, training=training)
    return jax.nn.relu(out), {"bn": bn_s}


def _downsampler_s2d(p: Params, x, *, folded: bool = False):
    import numpy as np

    w3 = p["conv"]["w"]  # [3, 3, cin, cout-cin]
    cout = w3.shape[3]
    if folded:
        xs = x
        n, h2, w2, c4 = x.shape
        c = c4 // 4
    else:
        n, h, w, c = x.shape
        h2, w2 = h // 2, w // 2
        xs = x.reshape(n, h2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(n, h2, w2, 4 * c)
    # out[i,j] spans input rows 2i-1..2i+1 / cols 2j-1..2j+1 = fold cells
    # (i+a, j+b), a,b in {-1,0}; fold slot (p,q) of cell (i+a, j+b) is input
    # row 2i + 2a + p -> kernel tap kh = 2a + p + 1 (kept when 0 <= kh <= 2)
    xp = jnp.pad(xs, ((0, 0), (1, 0), (1, 0), (0, 0)))
    out = None
    for a in (-1, 0):
        for b in (-1, 0):
            sel = np.zeros((2, 2, 3, 3), np.float32)
            for pp in (0, 1):
                for q in (0, 1):
                    kh, kw = 2 * a + pp + 1, 2 * b + q + 1
                    if 0 <= kh <= 2 and 0 <= kw <= 2:
                        sel[pp, q, kh, kw] = 1.0
            m = jnp.einsum("pqhw,hwio->pqio", jnp.asarray(sel), w3).reshape(4 * c, cout)
            tap = xp[:, 1 + a : 1 + a + h2, 1 + b : 1 + b + w2]
            t = jax.lax.dot_general(tap, m.astype(x.dtype), (((3,), (0,)), ((), ())))
            out = t if out is None else out + t
    out = out + p["conv"]["b"].astype(out.dtype)
    pool = jnp.max(xs.reshape(n, h2, w2, 4, c), axis=3)
    return jnp.concatenate([out, pool], axis=-1)


# ---------------------------------------------------------------------------
# non_bottleneck_1d (plain, used in all decoders + plain encoders)
# ---------------------------------------------------------------------------

def nb1d_init(rng, ch: int, dilated: int, dtype=jnp.float32):
    r = jax.random.split(rng, 4)
    bn1_p, bn1_s = bn_init(ch, None, dtype)
    bn2_p, bn2_s = bn_init(ch, None, dtype)
    params = {
        "conv3x1_1": conv_init(r[0], 3, 1, ch, ch, dtype),
        "conv1x3_1": conv_init(r[1], 1, 3, ch, ch, dtype),
        "bn1": bn1_p,
        "conv3x1_2": conv_init(r[2], 3, 1, ch, ch, dtype),
        "conv1x3_2": conv_init(r[3], 1, 3, ch, ch, dtype),
        "bn2": bn2_p,
    }
    return params, {"bn1": bn1_s, "bn2": bn2_s}


def nb1d_apply(p: Params, s: State, x, *, dilated: int, dropprob: float, training: bool, rng=None, drop_mask=None):
    out = jax.nn.relu(conv2d(x, p["conv3x1_1"]["w"], p["conv3x1_1"]["b"], padding=(1, 0)))
    out = conv2d(out, p["conv1x3_1"]["w"], p["conv1x3_1"]["b"], padding=(0, 1))
    out, bn1_s = _bn_apply(p["bn1"], s["bn1"], out, task=None, training=training)
    out = jax.nn.relu(out)
    out = jax.nn.relu(
        conv2d(out, p["conv3x1_2"]["w"], p["conv3x1_2"]["b"], padding=(dilated, 0), dilation=(dilated, 1))
    )
    out = conv2d(out, p["conv1x3_2"]["w"], p["conv1x3_2"]["b"], padding=(0, dilated), dilation=(1, dilated))
    out, bn2_s = _bn_apply(p["bn2"], s["bn2"], out, task=None, training=training)
    out = dropout2d(out, dropprob, rng, training=training, mask=drop_mask)
    return jax.nn.relu(out + x), {"bn1": bn1_s, "bn2": bn2_s}


# ---------------------------------------------------------------------------
# non_bottleneck_1d_RAP (encoder block with per-task adapters + BN)
# ---------------------------------------------------------------------------

def nb1d_rap_init(rng, ch: int, dilated: int, nb_tasks: int, dtype=jnp.float32):
    r = jax.random.split(rng, 6)
    bn1_p, bn1_s = bn_init(ch, nb_tasks, dtype)
    bn2_p, bn2_s = bn_init(ch, nb_tasks, dtype)
    params = {
        "conv3x1_1": conv_init(r[0], 3, 1, ch, ch, dtype),
        "conv1x3_1": conv_init(r[1], 1, 3, ch, ch, dtype),
        "rap1": stacked_conv1x1_init(r[2], nb_tasks, ch, dtype),
        "bns1": bn1_p,
        "conv3x1_2": conv_init(r[3], 3, 1, ch, ch, dtype),
        "conv1x3_2": conv_init(r[4], 1, 3, ch, ch, dtype),
        "rap2": stacked_conv1x1_init(r[5], nb_tasks, ch, dtype),
        "bns2": bn2_p,
    }
    return params, {"bns1": bn1_s, "bns2": bn2_s}


def nb1d_rap_apply(
    p: Params, s: State, x, *, task: int, dilated: int, dropprob: float, training: bool,
    rng=None, drop_mask=None,
):
    out = jax.nn.relu(conv2d(x, p["conv3x1_1"]["w"], p["conv3x1_1"]["b"], padding=(1, 0)))
    out = conv2d(out, p["conv1x3_1"]["w"], p["conv1x3_1"]["b"], padding=(0, 1))
    out = out + conv2d(x, p["rap1"]["w"][task], p["rap1"]["b"][task])
    out, bn1_s = _bn_apply(p["bns1"], s["bns1"], out, task=task, training=training)
    mid = jax.nn.relu(out)
    out = jax.nn.relu(
        conv2d(mid, p["conv3x1_2"]["w"], p["conv3x1_2"]["b"], padding=(dilated, 0), dilation=(dilated, 1))
    )
    out = conv2d(out, p["conv1x3_2"]["w"], p["conv1x3_2"]["b"], padding=(0, dilated), dilation=(1, dilated))
    out = out + conv2d(mid, p["rap2"]["w"][task], p["rap2"]["b"][task])
    out, bn2_s = _bn_apply(p["bns2"], s["bns2"], out, task=task, training=training)
    out = dropout2d(out, dropprob, rng, training=training, mask=drop_mask)
    return jax.nn.relu(out + x), {"bns1": bn1_s, "bns2": bn2_s}


# ---------------------------------------------------------------------------
# Ablation-variant non_bottleneck_1d blocks (reconstructions)
#
# The reference's step-1 trainer carries a model factory and freeze rules for
# four ablation models (train_RAPFT_step1.py:451-460, 176-242) whose
# definition files are absent upstream ("can be requested", README.md:44).
# The per-task parameter surface below is inferred from the freeze rules'
# key patterns; the adapter math follows the cited lineage (parallel/series
# residual adapters; RCM's per-task Wt reparameterization matrices):
#
#   bn       DSBN-only: shared convs, per-task BN — freeze gates only
#            bns_1/bns_2/bn_ini.{t} (train_RAPFT_step1.py:232-242)
#   onlyrap  per-task parallel 1x1 adapters, SHARED BN — freeze gates only
#            parallel_conv.{t}; BN names are untouched (:191-204)
#   ras      series adapters: per-task 1x1 conv applied residually to each
#            conv pair's output, per-task BN (:206-216)
#   rcm      per-task CxC reparameterization Wt_1/Wt_2 (no bias, no residual,
#            identity-initialized) composed onto each conv pair's output,
#            per-task BN — freeze gates Wt_1.{t}/Wt_2.{t} weights (:218-230)
# ---------------------------------------------------------------------------

ABLATION_VARIANTS = ("bn", "onlyrap", "ras", "rcm")
# variants whose BN (incl. the downsampler bn_ini) carries a task axis
PER_TASK_BN_VARIANTS = ("rap", "bn", "ras", "rcm")


def stacked_identity_init(nb_tasks: int, ch: int, dtype=jnp.float32):
    """Per-task reparameterization matrices [T, C, C], identity-initialized so
    the RCM block starts exactly equal to the plain nb1d block."""
    return jnp.broadcast_to(jnp.eye(ch, dtype=dtype), (nb_tasks, ch, ch)).copy()


def nb1d_ablation_init(rng, ch: int, dilated: int, nb_tasks: int, variant: str, dtype=jnp.float32):
    assert variant in ABLATION_VARIANTS, variant
    r = jax.random.split(rng, 6)
    bn_tasks = nb_tasks if variant in PER_TASK_BN_VARIANTS else None
    bn1_p, bn1_s = bn_init(ch, bn_tasks, dtype)
    bn2_p, bn2_s = bn_init(ch, bn_tasks, dtype)
    bnk = ("bns1", "bns2") if bn_tasks is not None else ("bn1", "bn2")
    params = {
        "conv3x1_1": conv_init(r[0], 3, 1, ch, ch, dtype),
        "conv1x3_1": conv_init(r[1], 1, 3, ch, ch, dtype),
        bnk[0]: bn1_p,
        "conv3x1_2": conv_init(r[2], 3, 1, ch, ch, dtype),
        "conv1x3_2": conv_init(r[3], 1, 3, ch, ch, dtype),
        bnk[1]: bn2_p,
    }
    if variant == "onlyrap":
        params["rap1"] = stacked_conv1x1_init(r[4], nb_tasks, ch, dtype)
        params["rap2"] = stacked_conv1x1_init(r[5], nb_tasks, ch, dtype)
    elif variant == "ras":
        params["ser1"] = stacked_conv1x1_init(r[4], nb_tasks, ch, dtype)
        params["ser2"] = stacked_conv1x1_init(r[5], nb_tasks, ch, dtype)
    elif variant == "rcm":
        params["wt1"] = stacked_identity_init(nb_tasks, ch, dtype)
        params["wt2"] = stacked_identity_init(nb_tasks, ch, dtype)
    return params, {bnk[0]: bn1_s, bnk[1]: bn2_s}


def nb1d_ablation_apply(
    p: Params, s: State, x, *, variant: str, task: int, dilated: int,
    dropprob: float, training: bool, rng=None, drop_mask=None,
):
    """One ablation-variant nb1d block. Adapter placement mirrors the RAP
    block's: the first adapter applies around conv pair 1, the second around
    conv pair 2; parallel adapters tap the segment INPUT (x / mid), while
    series/RCM transforms apply to the conv pair's OUTPUT."""
    per_task_bn = variant in PER_TASK_BN_VARIANTS
    bnk = ("bns1", "bns2") if per_task_bn else ("bn1", "bn2")
    bt = task if per_task_bn else None

    def adapt(out, seg_in, which: int):
        if variant == "onlyrap":
            a = p[f"rap{which}"]
            return out + conv2d(seg_in, a["w"][task], a["b"][task])
        if variant == "ras":
            a = p[f"ser{which}"]
            return out + conv2d(out, a["w"][task], a["b"][task])
        if variant == "rcm":
            wt = p[f"wt{which}"][task].astype(out.dtype)
            return jax.lax.dot_general(out, wt, (((3,), (0,)), ((), ())))
        return out  # "bn": no adapter

    out = jax.nn.relu(conv2d(x, p["conv3x1_1"]["w"], p["conv3x1_1"]["b"], padding=(1, 0)))
    out = conv2d(out, p["conv1x3_1"]["w"], p["conv1x3_1"]["b"], padding=(0, 1))
    out = adapt(out, x, 1)
    out, bn1_s = _bn_apply(p[bnk[0]], s[bnk[0]], out, task=bt, training=training)
    mid = jax.nn.relu(out)
    out = jax.nn.relu(
        conv2d(mid, p["conv3x1_2"]["w"], p["conv3x1_2"]["b"], padding=(dilated, 0), dilation=(dilated, 1))
    )
    out = conv2d(out, p["conv1x3_2"]["w"], p["conv1x3_2"]["b"], padding=(0, dilated), dilation=(1, dilated))
    out = adapt(out, mid, 2)
    out, bn2_s = _bn_apply(p[bnk[1]], s[bnk[1]], out, task=bt, training=training)
    out = dropout2d(out, dropprob, rng, training=training, mask=drop_mask)
    return jax.nn.relu(out + x), {bnk[0]: bn1_s, bnk[1]: bn2_s}


# ---------------------------------------------------------------------------
# Fused training block (Pallas): whole nb1d / nb1d_RAP in 4 fused conv-pair
# kernels + XLA batch-stat glue (ops/pallas/nb1d_train.py)
# ---------------------------------------------------------------------------

import functools as _functools


@_functools.lru_cache(maxsize=None)
def _fused_train_block(d: int, use_rap: bool, interpret: bool):
    from ..ops.pallas.nb1d_train import make_nb1d_train

    return make_nb1d_train(d=d, use_rap=use_rap, eps=BN_EPS, interpret=interpret)


def nb1d_fused_train_apply(
    p: Params, s: State, x, *, task: int | None, dilated: int, dropprob: float,
    drop_mask=None, interpret: bool = False,
):
    """Training-mode nb1d / nb1d_RAP via the fused Pallas kernels.

    Numerically equivalent to nb1d_apply / nb1d_rap_apply with training=True
    (goldens: tests/test_pallas_train.py); BN running stats update with
    torch-parity semantics (the pre-BN per-channel biases, absorbed exactly
    by the batch mean inside the kernels, are added back to the recorded
    running mean).
    """
    rap = "rap1" in p
    n, h, w, c = x.shape
    m_count = n * h * w
    if dropprob > 0.0 and drop_mask is None:
        # The fused kernels take dropout as a precomputed host mask; silently
        # training without dropout here would diverge from the XLA path
        # (which draws rng-based dropout2d). Fail loudly instead.
        raise ValueError(
            "nb1d_fused_train_apply requires host-generated drop_masks when "
            "dropprob > 0 (models/topology.py make_dropout_masks)"
        )
    if drop_mask is not None and dropprob > 0.0:
        mask_scaled = drop_mask.astype(jnp.float32) / (1.0 - dropprob)
    else:
        mask_scaled = jnp.ones((n, 1, 1, c), jnp.float32)
    mask_scaled = jax.lax.stop_gradient(mask_scaled)

    if rap:
        bn1p, bn2p = p["bns1"], p["bns2"]
        g1, be1 = bn1p["scale"][task], bn1p["bias"][task]
        g2, be2 = bn2p["scale"][task], bn2p["bias"][task]
        rap1w = p["rap1"]["w"][task][0, 0]
        rap2w = p["rap2"]["w"][task][0, 0]
        bias1 = p["conv1x3_1"]["b"] + p["rap1"]["b"][task]
        bias2 = p["conv1x3_2"]["b"] + p["rap2"]["b"][task]
        st1, st2 = s["bns1"], s["bns2"]
        old1 = BNState(mean=st1.mean[task], var=st1.var[task])
        old2 = BNState(mean=st2.mean[task], var=st2.var[task])
    else:
        g1, be1 = p["bn1"]["scale"], p["bn1"]["bias"]
        g2, be2 = p["bn2"]["scale"], p["bn2"]["bias"]
        zc = jnp.zeros((c, c), jnp.float32)
        rap1w = rap2w = zc
        bias1 = p["conv1x3_1"]["b"]
        bias2 = p["conv1x3_2"]["b"]
        old1, old2 = s["bn1"], s["bn2"]

    block = _fused_train_block(dilated, rap, interpret)
    out, mu1, var1, mu2, var2 = block(
        x, p["conv3x1_1"]["w"], p["conv3x1_1"]["b"], p["conv1x3_1"]["w"], rap1w,
        g1, be1,
        p["conv3x1_2"]["w"], p["conv3x1_2"]["b"], p["conv1x3_2"]["w"], rap2w,
        g2, be2, mask_scaled,
    )

    unbias = m_count / max(m_count - 1, 1)
    mom = 0.1

    def upd(old: BNState, mu, var, bias) -> BNState:
        return BNState(
            mean=(1 - mom) * old.mean + mom * (mu + bias.astype(jnp.float32)),
            var=(1 - mom) * old.var + mom * var * unbias,
        )

    new1 = upd(old1, mu1, var1, bias1)
    new2 = upd(old2, mu2, var2, bias2)
    if rap:
        new_s = {
            "bns1": BNState(mean=st1.mean.at[task].set(new1.mean), var=st1.var.at[task].set(new1.var)),
            "bns2": BNState(mean=st2.mean.at[task].set(new2.mean), var=st2.var.at[task].set(new2.var)),
        }
    else:
        new_s = {"bn1": new1, "bn2": new2}
    return out, new_s


# ---------------------------------------------------------------------------
# UpsamplerBlock
# ---------------------------------------------------------------------------

def upsampler_init(rng, nin: int, nout: int, dtype=jnp.float32):
    bn_p, bn_s = bn_init(nout, None, dtype)
    return (
        {"conv": conv_transpose_init(rng, 3, 3, nin, nout, dtype), "bn": bn_p},
        {"bn": bn_s},
    )


def upsampler_apply(p: Params, s: State, x, *, training: bool):
    # Measured negative result (r3): rewriting this ConvTranspose2d(3,s2,p1,
    # op1) as 9 sub-pixel shifted matmuls (the packed-head trick) timed 110.5
    # vs 111.7 ms/step on the full distill step — the lhs-dilated conv's
    # layout copies are not on the critical path; keep the simple form.
    out = conv_transpose2d(x, p["conv"]["w"], p["conv"]["b"], stride=2, padding=1, output_padding=1)
    out, bn_s = _bn_apply(p["bn"], s["bn"], out, task=None, training=training)
    return jax.nn.relu(out), {"bn": bn_s}
