import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from mdilss_tpu.models import erfnet_rap
from mdilss_tpu.train import masks, steps
C = 20
import time as _t; _t0 = _t.time()
s_params, s_bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
t_params, t_bn = erfnet_rap.init(jax.random.key(1), [C], 1)
jax.block_until_ready(s_params)
print(f"device init: {_t.time()-_t0:.1f}s", flush=True)
lr_tree = masks.rap_lr_tree(s_params, current_task=1, shared_lr=5e-6, ds_lr=5e-4)
w = jnp.ones(C).at[C-1].set(0.0)
step = jax.jit(steps.make_distill_step(
    erfnet_rap.apply, current_task=1, prev_tasks=(0,),
    class_weight=w, lr_tree=lr_tree, num_epochs=150,
), donate_argnums=(0,))
ts = steps.init_train_state(s_params, s_bn)
teacher = steps.ModelState(t_params, t_bn)
B = 6
x = jax.random.normal(jax.random.key(2), (B, 512, 1024, 3))
y = jax.random.randint(jax.random.key(3), (B, 512, 1024), 0, C)
t0 = time.time()
from mdilss_tpu.models.topology import make_dropout_masks
import numpy as _np
_dm = [make_dropout_masks(_np.random.default_rng(3), B) for _ in range(2)]
lowered = step.lower(ts, teacher, x, y, _dm, jax.random.key(4), 1)
print(f"lowered in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
compiled = lowered.compile()
print(f"compiled in {time.time()-t0:.1f}s", flush=True)
mem = compiled.memory_analysis()
print("memory:", mem, flush=True)
t0 = time.time()
ts, m = compiled(ts, teacher, x, y, _dm, jax.random.key(4), 1)
jax.block_until_ready(ts)
print(f"first step: {time.time()-t0:.2f}s loss={float(m['loss']):.4f} ce={float(m['ce']):.4f} kld={float(m['kld']):.5f}", flush=True)
N = 10
t0 = time.time()
for i in range(N):
    ts, m = compiled(ts, teacher, x, y, _dm, jax.random.key(5+i), 1)
jax.block_until_ready(ts)
dt = (time.time()-t0)/N
print(f"steady state: {dt*1000:.1f} ms/step -> {B/dt:.1f} img/s (train w/ distillation)", flush=True)
print(f"after 11 steps: loss={float(m['loss']):.4f} opt count={int(ts.opt.count)}", flush=True)
