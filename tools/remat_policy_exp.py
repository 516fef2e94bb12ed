"""Experiment: remat policy sweep on the step-2 distill step.

The profiled step replays every checkpointed block body — dot_generals
included — in the backward pass (save-nothing jax.checkpoint, the round-1
default that beat remat-OFF 117 vs 246 ms because OFF spills). Untried
middle ground: `jax.checkpoint_policies.dots_saveable` saves the matmul
outputs and replays only the elementwise glue, trading HBM for replay FLOPs.

Arms (interleaved 8-step blocks, 3 blocks per arm):
  none      save-nothing bodies (production default)
  dots      topology.REMAT_POLICY = dots_saveable (encoder/decoder bodies)
  dots_all  dots + the step-level jax.checkpoint around the previous-task
            student forwards also carries the policy

Run: timeout 1200 python tools/remat_policy_exp.py [arm ...]
Verdict recorded in docs/DESIGN.md.
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
from mdilss_tpu.models import erfnet_rap, topology
from mdilss_tpu.models.topology import make_dropout_masks
from mdilss_tpu.train import masks, steps

DOTS = jax.checkpoint_policies.dots_saveable


class Arm:
    def __init__(self, name: str):
        self.name = name
        batch, height, width, C = 6, 512, 1024, 20
        s_params, s_bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
        t_params, t_bn = erfnet_rap.init(jax.random.key(1), [C], 1)
        lr_tree = masks.rap_lr_tree(s_params, current_task=1, shared_lr=5e-6, ds_lr=5e-4)

        def apply_fn(p, s, x, task, **kw):
            return erfnet_rap.apply(p, s, x.astype(jnp.bfloat16), task, remat=True, **kw)

        self.step = jax.jit(
            steps.make_distill_step(
                apply_fn, current_task=1, prev_tasks=(0,),
                class_weight=CLASS_WEIGHTS["BDD"], lr_tree=lr_tree, num_epochs=150,
            ),
            donate_argnums=(0,),
        )
        self.ts = steps.init_train_state(s_params, s_bn)
        self.teacher = steps.ModelState(t_params, t_bn)
        rng_np = np.random.default_rng(0)
        self.xs = [jnp.asarray(rng_np.integers(0, 256, (batch, height, width, 3), np.uint8))
                   for _ in range(3)]
        self.ys = [jnp.asarray(rng_np.integers(0, C, (batch, height, width)).astype(np.uint8))
                   for _ in range(3)]
        self.mask_rng = np.random.default_rng(3)
        self.key = jax.random.key(7)
        self.C = C
        self.times = []

    def compile(self):
        """Trace+compile under this arm's patches (jit traces lazily, so the
        policy knobs must be live during the FIRST call, not construction)."""
        saved_policy = topology.REMAT_POLICY
        saved_ckpt = jax.checkpoint
        if self.name in ("dots", "dots_all"):
            topology.REMAT_POLICY = DOTS
        if self.name == "dots_all":
            def patched(f, **kw):
                kw.setdefault("policy", DOTS)
                return saved_ckpt(f, **kw)
            jax.checkpoint = patched
        try:
            met = self.one(0)
            print(f"[{self.name}] compiled, loss {float(met['loss']):.4f}", file=sys.stderr)
        finally:
            topology.REMAT_POLICY = saved_policy
            jax.checkpoint = saved_ckpt

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
    names = sys.argv[1:] or ["none", "dots", "dots_all"]
    arms = [Arm(n) for n in names]
    for a in arms:
        a.compile()
    for rep in range(3):
        for a in arms:
            a.block()
    for a in arms:
        ts = sorted(a.times)
        print(f"{a.name}: median {ts[1]:.2f} ms/step  all {[f'{t:.1f}' for t in ts]}")
