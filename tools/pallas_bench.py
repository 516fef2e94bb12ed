import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from mdilss_tpu.models import blocks as B
from mdilss_tpu.ops.pallas.nb1d import nb1d_fused_infer

c, d = 128, 2
params, state = B.nb1d_init(jax.random.key(0), c, d)
x32 = jax.random.normal(jax.random.key(1), (6, 64, 128, c), jnp.float32)

# correctness on real TPU
ref, _ = B.nb1d_apply(params, state, x32, dilated=d, dropprob=0.0, training=False)
got = nb1d_fused_infer(x32, params, state["bn1"], state["bn2"], dilated=d)
err = float(jnp.max(jnp.abs(got - ref)))
print(f"TPU correctness f32: max err {err:.2e}", flush=True)

K = 20
def bench(name, f, x):
    g = jax.jit(lambda x: f(x))
    float(jnp.sum(g(x)))
    t0 = time.perf_counter(); reps = 5
    for _ in range(reps):
        out = g(x)
    float(jnp.sum(out))
    per = (time.perf_counter()-t0)/(reps*K)
    print(f"{name}: {per*1e6:7.1f} us/block", flush=True)

def chain_xla(x):
    for _ in range(K):
        x, _ = B.nb1d_apply(params, state, x, dilated=d, dropprob=0.0, training=False)
    return x

def chain_fused(x):
    for _ in range(K):
        x = nb1d_fused_infer(x, params, state["bn1"], state["bn2"], dilated=d)
    return x

for dt in (jnp.float32, jnp.bfloat16):
    x = x32.astype(dt)
    bench(f"xla   {dt.__name__}", chain_xla, x)
    bench(f"fused {dt.__name__}", chain_fused, x)
