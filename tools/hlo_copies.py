"""Identify the shapes/layouts behind the 'data formatting' copies the
profiler attributes ~18 ms/step to (tools/profile_step.py output).

Compiles the step-2 distill step on the current backend, then prints every
`copy` / `transpose` / `bitcast-convert` instruction in the optimized HLO
whose operand is big enough to matter (>= 1 MB), with operand -> result
layout so the mismatch is visible.

Usage: timeout 600 python tools/hlo_copies.py [op_name_filter ...]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(filters):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mdilss_tpu.data import CLASS_WEIGHTS
    from mdilss_tpu.models import erfnet_rap
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
    from mdilss_tpu.models.topology import make_dropout_masks

    mask_rng = np.random.default_rng(3)
    m = [make_dropout_masks(mask_rng, batch) for _ in range(2)]
    x = jnp.zeros((batch, height, width, 3), jnp.bfloat16)
    y = jnp.zeros((batch, height, width), jnp.int32)
    compiled = step.lower(ts, teacher, x, y, m, jax.random.key(0), 1).compile()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt) / 1e6:.1f} MB")

    def nbytes(shape_str: str) -> int:
        mo = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
        if not mo:
            return 0
        dt, dims = mo.groups()
        sz = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2, "s8": 1,
              "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8}.get(dt, 4)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * sz

    rows = []
    for line in txt.splitlines():
        ls = line.strip()
        mo = re.match(r"%?([\w.\-]+) = (\S+) (copy|transpose|bitcast-convert)\(", ls)
        if not mo:
            continue
        name, out_shape, kind = mo.groups()
        if filters and not any(f in name for f in filters):
            continue
        b = nbytes(out_shape)
        if b >= 1 << 20 or filters:
            rows.append((b, name, kind, ls[:240]))
    rows.sort(reverse=True)
    print(f"\n{len(rows)} copy/transpose ops >= 1 MB:")
    for b, name, kind, line in rows[:60]:
        print(f"  {b / 1e6:8.1f} MB  {line}")


if __name__ == "__main__":
    main(sys.argv[1:])
