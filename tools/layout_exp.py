"""Bounded layout experiment on the loss-backward relayouts (round-4 ask).

The round-3 profile (docs/DESIGN.md "Step-time attribution") pins 18.1
ms/step on layout-conversion copies, the two largest being ~126 MB relayouts
of the packed logits [6,256,512,4,20] at the loss / conv-backward boundary.
The analytic-VJP experiment (tools/loss_vjp_exp.py) proved they are inserted
by XLA *layout assignment*, not by the loss autodiff. This tool tries the one
remaining lever: an explicit `jax.experimental.layout.with_layout_constraint`
on the logits at the loss boundary, so XLA's layout solver is forced to keep
one layout across the boundary instead of materializing both.

Pre-registered stop rule (VERDICT.md round-3 #4): ONE experiment, interleaved
medians, a >= 5 ms/step win adopts the constraint in train/steps.py; anything
less adds the final negative-results ledger entry and closes the perf chapter
at ~30% of the HBM roofline.

Usage (real TPU chip):
  timeout 900  python tools/layout_exp.py --inspect        # big copies + layouts
  timeout 1800 python tools/layout_exp.py --order default  # A/B vs baseline
  timeout 1800 python tools/layout_exp.py --order 0,1,2,3,4 [--where ce|kld|both]

--order is the major_to_minor permutation for the rank-5 packed logits
("default" = (0,1,2,3,4), row-major; NOTE jax Layout lists MAJOR first —
the reverse of HLO's {minor,...,major} braces, so the profiled copies'
HLO target {2,1,4,3,0} is --order 0,3,4,1,2). The constraint applies to the
primal logits; `layout_constraint_p`'s transpose applies the SAME constraint
to the cotangent, which is exactly the tensor the profiled copies relayout.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SHAPE = [6, 512, 1024]  # batch, height, width (CLI-overridable for smoke)


def build_step(constraint_order=None, where="both"):
    """Returns (jitted step, example args). constraint_order: major_to_minor
    tuple for the rank-5 packed logits, or None for the unconstrained
    baseline."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mdilss_tpu.data import CLASS_WEIGHTS
    from mdilss_tpu.losses import kld_faithful, weighted_cross_entropy
    from mdilss_tpu.models import erfnet_rap
    from mdilss_tpu.models.topology import make_dropout_masks
    from mdilss_tpu.train import masks, steps

    (batch, height, width), C = SHAPE, 20

    if constraint_order is not None:
        from jax.experimental.layout import Layout, with_layout_constraint

        lay = Layout(major_to_minor=tuple(constraint_order))

        def pin(t):
            return with_layout_constraint(t, lay)

        def ce_fn(logits, targets, weight):
            return weighted_cross_entropy(pin(logits), targets, weight)

        def kld(s_logits, t_logits):
            return kld_faithful(pin(s_logits), pin(t_logits))

        # make_distill_step reads weighted_cross_entropy from the module
        # namespace of train/steps.py; patch it there for the variant build
        orig_ce = steps.weighted_cross_entropy
        steps.weighted_cross_entropy = ce_fn if where in ("ce", "both") else orig_ce
        kld_fn = kld if where in ("kld", "both") else kld_faithful
    else:
        orig_ce = None
        kld_fn = kld_faithful

    s_params, s_bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
    t_params, t_bn = erfnet_rap.init(jax.random.key(1), [C], 1)
    lr_tree = masks.rap_lr_tree(s_params, current_task=1, shared_lr=5e-6, ds_lr=5e-4)

    def apply_fn(p, s, x, task, **kw):
        return erfnet_rap.apply(p, s, x.astype(jnp.bfloat16), task, remat=True, **kw)

    step = jax.jit(
        steps.make_distill_step(
            apply_fn, current_task=1, prev_tasks=(0,),
            class_weight=CLASS_WEIGHTS["BDD"], lr_tree=lr_tree, num_epochs=150,
            kld_fn=kld_fn,
        ),
    )
    if orig_ce is not None:
        steps.weighted_cross_entropy = orig_ce

    ts = steps.init_train_state(s_params, s_bn)
    teacher = steps.ModelState(t_params, t_bn)
    rng_np = np.random.default_rng(0)
    mask_rng = np.random.default_rng(3)
    x = jnp.asarray(rng_np.random((batch, height, width, 3), np.float32))
    y = jnp.asarray(rng_np.integers(0, C, (batch, height, width)), jnp.int32)
    m = [make_dropout_masks(mask_rng, batch) for _ in range(2)]
    return step, (ts, teacher, x, y, m, jax.random.key(7), 1)


def inspect():
    """Print every >=1 MB copy/transpose in the optimized baseline HLO with
    operand -> result layouts (same lens as tools/hlo_copies.py, inlined so
    this experiment is one self-contained file)."""
    step, args = build_step(None)
    compiled = step.lower(*args).compile()
    txt = compiled.as_text()

    def nbytes(shape_str):
        mo = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
        if not mo:
            return 0
        dt, dims = mo.groups()
        sz = {"bf16": 2, "f32": 4, "s32": 4, "u8": 1, "pred": 1, "f16": 2,
              "s8": 1, "u32": 4}.get(dt, 4)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * sz

    rows = []
    for line in txt.splitlines():
        s = line.strip()
        mo = re.match(r"(\S+)\s*=\s*(\S+?\{[^}]*\})?\s*(copy|transpose)\(", s)
        if not mo:
            # shapes like bf16[6,256,512,4,20]{4,3,2,1,0} precede the op name
            mo2 = re.match(r"\S+ = (\w+\[[\d,]*\]\{[\d,]*\}) (copy|transpose)\((\S+?)\)", s)
            if not mo2:
                continue
            shape, op, operand = mo2.groups()
            if nbytes(shape) < (1 << 20):
                continue
            rows.append((nbytes(shape), op, s[:240]))
            continue
    rows.sort(reverse=True)
    for nb, op, line in rows[:40]:
        print(f"{nb / 1e6:8.1f} MB  {op}: {line}")
    if not rows:
        print("no >=1MB copy/transpose matched — dump the HLO and grep by hand")


def timed(step, args, n):
    ts = args[0]
    rest = args[1:]
    ts, m = step(ts, *rest)
    float(m["loss"])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n):
        ts, m = step(ts, *rest)
    float(m["loss"])
    return 1000.0 * (time.perf_counter() - t0) / n


def ab(order, where, n_steps, n_passes):
    base_step, base_args = build_step(None)
    var_step, var_args = build_step(order, where)
    base, var = [], []
    for i in range(n_passes):
        base.append(timed(base_step, base_args, n_steps))
        var.append(timed(var_step, var_args, n_steps))
    print(json.dumps({
        "order": list(order), "where": where,
        "baseline_ms": [round(v, 1) for v in base],
        "variant_ms": [round(v, 1) for v in var],
        "baseline_median_ms": round(statistics.median(base), 1),
        "variant_median_ms": round(statistics.median(var), 1),
        "win_ms": round(statistics.median(base) - statistics.median(var), 1),
    }))


if __name__ == "__main__":
    # the axon sitecustomize pins the config platform at register() time;
    # honor JAX_PLATFORMS explicitly (same as bench.py) so CPU smoke works
    _plat = os.environ.get("JAX_PLATFORMS")
    if _plat:
        import jax

        jax.config.update("jax_platforms", _plat)
    p = argparse.ArgumentParser()
    p.add_argument("--inspect", action="store_true")
    p.add_argument("--order", default=None,
                   help="'default' (4,3,2,1,0) or comma list, e.g. 0,1,2,3,4")
    p.add_argument("--where", default="both", choices=["ce", "kld", "both"])
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--passes", type=int, default=3)
    p.add_argument("--shape", default=None,
                   help="B,H,W override (CPU smoke: 2,64,128)")
    a = p.parse_args()
    if a.shape:
        SHAPE[:] = [int(v) for v in a.shape.split(",")]
    if a.inspect:
        inspect()
    elif a.order:
        order = ((0, 1, 2, 3, 4) if a.order == "default"
                 else tuple(int(v) for v in a.order.split(",")))
        ab(order, a.where, a.steps, a.passes)
    else:
        p.print_help()
