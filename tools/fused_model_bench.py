import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from mdilss_tpu.models import erfnet_rap

C = 20
params, bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
B = 6
bf = jnp.bfloat16
x = jax.random.normal(jax.random.key(2), (B, 512, 1024, 3), bf)

# correctness: fused vs plain eval on TPU
a, _ = jax.jit(lambda p, s, x: erfnet_rap.apply(p, s, x, 1))(params, bn, x)
b, _ = jax.jit(lambda p, s, x: erfnet_rap.apply(p, s, x, 1, fused_infer=True))(params, bn, x)
print("fused vs plain max err:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))), flush=True)

K = 10
def bench(name, fused):
    @jax.jit
    def chain(p, s, x):
        acc = jnp.float32(0)
        for i in range(K):
            out, _ = erfnet_rap.apply(p, s, x * (1 + 1e-6 * i), 1, fused_infer=fused)
            acc += jnp.sum(out.astype(jnp.float32))
        return acc
    float(chain(params, bn, x))
    t0 = time.perf_counter(); n = 3
    for _ in range(n):
        r = chain(params, bn, x)
    float(r)
    per = (time.perf_counter()-t0)/(n*K)
    print(f"{name}: {per*1000:6.1f} ms/fwd -> {B/per:.0f} img/s", flush=True)

bench("plain eval fwd", False)
bench("fused eval fwd", True)
