"""Profile the step-2 distill train step on the current device and print an
HLO-category cost breakdown.

Captures a jax.profiler trace of a few steady-state steps, then parses the
trace JSON directly ('XLA Ops' thread events grouped by args.hlo_category /
long_name) — the tensorboard-plugin converter is broken in this env, and ops
inside `while` (lax.scan) bodies double-count with their enclosing while
event, so the parser subtracts nested spans.

Usage:  timeout 600 python tools/profile_step.py [N_STEPS]
Output: per-category ms/step table + the top individual ops.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_traced_steps(trace_dir: str, n_steps: int) -> None:
    import jax
    import jax.numpy as jnp

    from mdilss_tpu.data import CLASS_WEIGHTS
    from mdilss_tpu.data.transforms import augment_batch
    from mdilss_tpu.models import erfnet_rap
    from mdilss_tpu.models.topology import make_dropout_masks
    from mdilss_tpu.train import masks, steps

    batch, height, width, C = 6, 512, 1024, 20
    s_params, s_bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
    t_params, t_bn = erfnet_rap.init(jax.random.key(1), [C], 1)
    lr_tree = masks.rap_lr_tree(s_params, current_task=1, shared_lr=5e-6, ds_lr=5e-4)

    def apply_fn(p, s, x, task, **kw):
        return erfnet_rap.apply(p, s, x.astype(jnp.bfloat16), task, remat=True, **kw)

    step = jax.jit(
        steps.make_distill_step(
            apply_fn, current_task=1, prev_tasks=(0,),
            class_weight=CLASS_WEIGHTS["BDD"], lr_tree=lr_tree, num_epochs=150,
        ),
        donate_argnums=(0,),
    )
    ts = steps.init_train_state(s_params, s_bn)
    teacher = steps.ModelState(t_params, t_bn)

    rng_np = np.random.default_rng(0)
    xs = [jnp.asarray(rng_np.integers(0, 256, (batch, height, width, 3), np.uint8))
          for _ in range(3)]
    ys = [jnp.asarray(rng_np.integers(0, C, (batch, height, width)).astype(np.uint8))
          for _ in range(3)]
    key = jax.random.key(7)
    mask_rng = np.random.default_rng(3)

    def one(i, ts):
        nonlocal key
        key, k_aug, k_drop = jax.random.split(key, 3)
        x, y = augment_batch(xs[i % 3], ys[i % 3], k_aug, num_classes=C,
                             out_dtype=jnp.bfloat16)
        m = [make_dropout_masks(mask_rng, batch) for _ in range(2)]
        return step(ts, teacher, x, y, m, k_drop, 1)

    ts, m = one(0, ts)  # compile
    float(m["loss"])
    import jax.profiler

    with jax.profiler.trace(trace_dir):
        for i in range(n_steps):
            ts, m = one(i, ts)
        float(m["loss"])


def parse_trace(trace_dir: str, n_steps: int) -> None:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace file found under", trace_dir)
        return
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # find the 'XLA Ops' thread(s)
    op_tids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            if "XLA Ops" in e.get("args", {}).get("name", ""):
                op_tids.add((e["pid"], e["tid"]))
    ops = [e for e in events
           if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids]

    # subtract nested spans (scan bodies double-count with their `while` op)
    ops.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
    by_cat: dict[str, float] = {}
    by_cat_nested: dict[str, float] = {}
    by_op: dict[str, float] = {}
    open_stack: list[tuple[float, float]] = []  # (end_ts, dur)
    for e in ops:
        dur = e.get("dur", 0.0)
        ts0, ts1 = e["ts"], e["ts"] + dur
        while open_stack and open_stack[-1][0] <= ts0:
            open_stack.pop()
        nested = bool(open_stack)  # inside an enclosing op span (a while)
        cat = e.get("args", {}).get("hlo_category", "?")
        name = e.get("name", "?")
        if not nested:
            by_cat[cat] = by_cat.get(cat, 0.0) + dur
            if cat != "while":
                by_op[name] = by_op.get(name, 0.0) + dur
        else:
            by_cat_nested[cat] = by_cat_nested.get(cat, 0.0) + dur
            by_op["(scan) " + name] = by_op.get("(scan) " + name, 0.0) + dur
        if dur > 0:
            open_stack.append((ts1, dur))

    total = sum(by_cat.values())
    print(f"\n== HLO categories (device time, {n_steps} steps) ==")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<40s} {us/1000/n_steps:8.2f} ms/step  "
              f"{100*us/total:5.1f}%")
    print(f"  {'TOTAL':<40s} {total/1000/n_steps:8.2f} ms/step")
    print(f"\n== inside-scan categories (share of the 'while' bucket) ==")
    for cat, us in sorted(by_cat_nested.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<40s} {us/1000/n_steps:8.2f} ms/step")
    print(f"\n== top 25 ops (scan-internal prefixed) ==")
    for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us/1000/n_steps:8.2f} ms/step  {name[:110]}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    trace_dir = os.environ.get("MDILSS_TRACE_DIR", "/tmp/mdilss_prof")
    run_traced_steps(trace_dir, n)
    parse_trace(trace_dir, n)
