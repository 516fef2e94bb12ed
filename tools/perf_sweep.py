import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from mdilss_tpu.data import CLASS_WEIGHTS
from mdilss_tpu.models import erfnet_rap
from mdilss_tpu.models.topology import make_dropout_masks
from mdilss_tpu.train import masks, steps

C = 20
s_params, s_bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
t_params, t_bn = erfnet_rap.init(jax.random.key(1), [C], 1)
lr_tree = masks.rap_lr_tree(s_params, current_task=1, shared_lr=5e-6, ds_lr=5e-4)
teacher = steps.ModelState(t_params, t_bn)
mask_rng = np.random.default_rng(3)

def bench(dtype, remat, B, n=10):
    def apply_fn(p, s, x, task, **kw):
        return erfnet_rap.apply(p, s, x.astype(dtype), task, remat=remat, **kw)
    step = jax.jit(steps.make_distill_step(
        apply_fn, current_task=1, prev_tasks=(0,),
        class_weight=CLASS_WEIGHTS["BDD"], lr_tree=lr_tree, num_epochs=150,
    ), donate_argnums=(0,))
    ts = steps.init_train_state(jax.tree.map(jnp.array, s_params), jax.tree.map(jnp.array, s_bn))
    x = jax.random.normal(jax.random.key(2), (B, 512, 1024, 3))
    y = jax.random.randint(jax.random.key(3), (B, 512, 1024), 0, C)
    keys = list(jax.random.split(jax.random.key(9), n + 1))
    dm = [make_dropout_masks(mask_rng, B) for _ in range(2)]
    try:
        ts, m = step(ts, teacher, x, y, dm, keys[0], 1)
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(n):
            ts, m = step(ts, teacher, x, y, dm, keys[i + 1], 1)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / n
        print(f"dtype={dtype.__name__:9s} remat={remat} B={B:2d}: {dt*1000:6.1f} ms/step  {B/dt:6.1f} img/s", flush=True)
    except Exception as e:
        print(f"dtype={dtype.__name__:9s} remat={remat} B={B:2d}: FAILED {type(e).__name__} {str(e)[:120]}", flush=True)

for dtype in (jnp.float32, jnp.bfloat16):
    for remat in (False, True):
        bench(dtype, remat, 6)
bench(jnp.bfloat16, True, 12)
bench(jnp.bfloat16, False, 12)
bench(jnp.bfloat16, False, 24)
