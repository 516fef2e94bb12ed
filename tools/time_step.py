"""Time the step-2 distill step (the bench headline path) in isolation.

Usage: python tools/time_step.py ['{"xla_tpu_...": "..."}']
The optional argv is a JSON dict passed as per-jit `compiler_options`
(accepted by the PJRT plugin); XLA_FLAGS set in the environment apply too.
Prints one line: median ms/step over 3 blocks of 8 steps (one sync per
block — per-step syncs cost ~35 ms each on remote-tunnel backends).

Sweep results are recorded in docs/DESIGN.md (measured negative results):
the default scoped-vmem budget wins; 98304 KiB is 2x worse.
"""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
COPTS = json.loads(sys.argv[1]) if len(sys.argv) > 1 else None
import numpy as np
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
    compiler_options=COPTS,
)
ts = steps.init_train_state(s_params, s_bn)
teacher = steps.ModelState(t_params, t_bn)
rng_np = np.random.default_rng(0)
xs_h = [jnp.asarray(rng_np.integers(0, 256, (batch, height, width, 3), np.uint8)) for _ in range(3)]
ys_h = [jnp.asarray(rng_np.integers(0, C, (batch, height, width)).astype(np.uint8)) for _ in range(3)]
mask_rng = np.random.default_rng(3)
key = jax.random.key(7)

def one(i, ts):
    global key
    key, k_aug, k_drop = jax.random.split(key, 3)
    x, y = augment_batch(xs_h[i % 3], ys_h[i % 3], k_aug, num_classes=C,
                         out_dtype=jnp.bfloat16)
    m = [make_dropout_masks(mask_rng, batch) for _ in range(2)]
    return step(ts, teacher, x, y, m, k_drop, 1)

ts, met = one(0, ts)
print("compiled, loss", float(met["loss"]), file=sys.stderr)
times = []
for rep in range(3):
    t0 = time.perf_counter()
    for i in range(8):
        ts, met = one(i, ts)
    float(met["loss"])
    times.append((time.perf_counter() - t0) / 8 * 1000)
times.sort()
print(f"median {times[1]:.2f} ms/step  all {[f'{t:.1f}' for t in times]}")
