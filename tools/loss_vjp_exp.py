"""Experiment: analytic custom-VJP losses vs autodiff-through-f32-cast.

tools/profile_step.py attributes ~18 ms/step of the 112 ms step-2 step to
layout-conversion copies, the two largest being 126 MB relayouts of the
packed logits [6,256,512,4,20] in the LOSS BACKWARD (tools/hlo_copies.py).
Hypothesis: those copies come from autodiff materializing f32 residuals /
cotangents across the `logits.astype(f32)` boundary inside the losses.

This script times the step-2 distill step (same harness as tools/time_step.py)
with the losses replaced by custom_vjp versions whose backward recomputes
softmax from the saved bf16 logits and emits the cotangent analytically in
the primal dtype and layout:

  CE:   dz = (g * w_pix / W) * (softmax(z) - onehot)
  KLDf: dz_s = -(g / M) * p_s * (p_t - sum_c p_t * p_s)   (teacher: zero)

Run: timeout 900 python tools/loss_vjp_exp.py [xla|fused|both]
Verdict recorded in docs/DESIGN.md (kept only if measured faster).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mdilss_tpu.data import CLASS_WEIGHTS
from mdilss_tpu.data.transforms import augment_batch
from mdilss_tpu.models import erfnet_rap
from mdilss_tpu.models.topology import make_dropout_masks
from mdilss_tpu.train import masks, steps
from mdilss_tpu import losses


# ---------------------------------------------------------------- fused CE
def _onehot_w(logits_shape, ndim, targets, wvec):
    classes = jax.lax.broadcasted_iota(jnp.int32, logits_shape, ndim - 1)
    onehot = classes == targets[..., None]
    w = jnp.sum(jnp.where(onehot, wvec, 0.0), axis=-1)
    return onehot, w


@jax.custom_vjp
def wce_fused(logits, targets, wvec):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot, w = _onehot_w(logp.shape, logp.ndim, targets, wvec)
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    return jnp.sum(w * nll) / jnp.sum(w)


def _wce_fwd(logits, targets, wvec):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot, w = _onehot_w(logp.shape, logp.ndim, targets, wvec)
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    wsum = jnp.sum(w)
    return jnp.sum(w * nll) / wsum, (logits, targets, wvec, wsum)


def _wce_bwd(res, g):
    logits, targets, wvec, wsum = res
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot, w = _onehot_w(p.shape, p.ndim, targets, wvec)
    scale = (g / wsum) * w
    dz = (p - onehot.astype(jnp.float32)) * scale[..., None]
    return (
        dz.astype(logits.dtype),
        jnp.zeros(targets.shape, jax.dtypes.float0),
        jnp.zeros_like(wvec),
    )


wce_fused.defvjp(_wce_fwd, _wce_bwd)


# --------------------------------------------------------------- fused KLDf
@jax.custom_vjp
def kldf_fused(s_logits, t_logits):
    return losses.kld_faithful(s_logits, t_logits)


def _kldf_fwd(s_logits, t_logits):
    return losses.kld_faithful(s_logits, t_logits), (s_logits, t_logits)


def _kldf_bwd(res, g):
    s_logits, t_logits = res
    p_s = jax.nn.softmax(s_logits.astype(jnp.float32), axis=-1)
    p_t = jax.nn.softmax(t_logits.astype(jnp.float32), axis=-1)
    m = float(np.prod(s_logits.shape))
    f = jnp.sum(p_t * p_s, axis=-1, keepdims=True)
    ds = (-(g / m)) * p_s * (p_t - f)
    return ds.astype(s_logits.dtype), jnp.zeros_like(t_logits)


kldf_fused.defvjp(_kldf_fwd, _kldf_bwd)


# ------------------------------------------------------------- verification
def verify():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(2, 8, 16, 4, 6)).astype(np.float32)).astype(jnp.bfloat16)
    t = jnp.asarray(rng.integers(0, 6, (2, 8, 16, 4)).astype(np.int32))
    w = jnp.asarray(np.abs(rng.normal(size=6)).astype(np.float32) + 0.1)
    zt = jnp.asarray(rng.normal(size=z.shape).astype(np.float32)).astype(jnp.bfloat16)

    for name, ref_fn, new_fn in [
        ("wce", lambda zz: losses.weighted_cross_entropy(zz, t, w), lambda zz: wce_fused(zz, t, w)),
        ("kldf", lambda zz: losses.kld_faithful(zz, jax.lax.stop_gradient(zt)),
         lambda zz: kldf_fused(zz, jax.lax.stop_gradient(zt))),
    ]:
        v0, g0 = jax.value_and_grad(ref_fn)(z)
        v1, g1 = jax.value_and_grad(new_fn)(z)
        dv = abs(float(v0) - float(v1))
        dg = float(jnp.max(jnp.abs(g0.astype(jnp.float32) - g1.astype(jnp.float32))))
        gmax = float(jnp.max(jnp.abs(g0.astype(jnp.float32))))
        print(f"verify {name}: |dloss|={dv:.3e}  max|dgrad|={dg:.3e} (grad scale {gmax:.3e})",
              file=sys.stderr)
        assert dv < 1e-5 and dg <= 2e-2 * max(gmax, 1e-8), name


# ------------------------------------------------------------------ timing
def build_step(fused: bool):
    batch, height, width, C = 6, 512, 1024, 20
    s_params, s_bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
    t_params, t_bn = erfnet_rap.init(jax.random.key(1), [C], 1)
    lr_tree = masks.rap_lr_tree(s_params, current_task=1, shared_lr=5e-6, ds_lr=5e-4)

    def apply_fn(p, s, x, task, **kw):
        return erfnet_rap.apply(p, s, x.astype(jnp.bfloat16), task, remat=True, **kw)

    saved = steps.weighted_cross_entropy
    if fused:
        steps.weighted_cross_entropy = wce_fused
    try:
        step = jax.jit(
            steps.make_distill_step(
                apply_fn, current_task=1, prev_tasks=(0,),
                class_weight=CLASS_WEIGHTS["BDD"], lr_tree=lr_tree, num_epochs=150,
                kld_fn=kldf_fused if fused else losses.kld_faithful,
            ),
            donate_argnums=(0,),
        )
    finally:
        steps.weighted_cross_entropy = saved
    ts = steps.init_train_state(s_params, s_bn)
    teacher = steps.ModelState(t_params, t_bn)
    return step, ts, teacher, batch, height, width, C


class Arm:
    def __init__(self, name: str, fused: bool):
        self.name = name
        step, ts, teacher, batch, height, width, C = build_step(fused)
        self.step, self.ts, self.teacher = step, ts, teacher
        rng_np = np.random.default_rng(0)
        self.xs = [jnp.asarray(rng_np.integers(0, 256, (batch, height, width, 3), np.uint8))
                   for _ in range(3)]
        self.ys = [jnp.asarray(rng_np.integers(0, C, (batch, height, width)).astype(np.uint8))
                   for _ in range(3)]
        self.mask_rng = np.random.default_rng(3)
        self.key = jax.random.key(7)
        self.C = C
        self.times = []

    def one(self, i):
        self.key, k_aug, k_drop = jax.random.split(self.key, 3)
        x, y = augment_batch(self.xs[i % 3], self.ys[i % 3], k_aug,
                             num_classes=self.C, out_dtype=jnp.bfloat16)
        m = [make_dropout_masks(self.mask_rng, 6) for _ in range(2)]
        self.ts, met = self.step(self.ts, self.teacher, x, y, m, k_drop, 1)
        return met

    def block(self, n=8):
        t0 = time.perf_counter()
        for i in range(n):
            met = self.one(i)
        float(met["loss"])
        self.times.append((time.perf_counter() - t0) / n * 1000)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    verify()
    names = ["xla", "fused"] if mode == "both" else [mode]
    arms = [Arm(n, n == "fused") for n in names]
    for a in arms:  # compile + warm
        met = a.one(0)
        print(f"[{a.name}] compiled, loss {float(met['loss']):.4f}", file=sys.stderr)
    # interleave 8-step blocks A/B/A/B... so tunnel-window drift hits both arms
    for rep in range(3):
        for a in arms:
            a.block()
    for a in arms:
        ts = sorted(a.times)
        print(f"{a.name}: median {ts[1]:.2f} ms/step  all {[f'{t:.1f}' for t in ts]}")
