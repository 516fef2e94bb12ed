import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp

K = 30
for mb, shape in [(12.6, (6,64,128,128)), (50, (6,128,256,128)), (201, (6,256,512,128))]:
    x = jax.random.normal(jax.random.key(0), shape, jnp.bfloat16)
    @jax.jit
    def chain(x):
        for i in range(K):
            x = x * 1.0001 + 0.001  # not collapsible? XLA may still fuse the chain...
        return x.sum()
    float(chain(x))
    t0 = time.perf_counter(); reps=5
    for _ in range(reps):
        out = chain(x)
    float(out)
    per = (time.perf_counter()-t0)/(reps*K)
    nbytes = x.size * 2
    print(f"{shape}: {per*1e6:7.1f} us/pass  {2*nbytes/per/1e9:6.0f} GB/s (r+w)", flush=True)

# matmul peak check: big square matmul
for M in (4096, 8192):
    a = jax.random.normal(jax.random.key(1), (M, M), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(2), (M, M), jnp.bfloat16)
    @jax.jit
    def mm(a, b):
        c = a
        for _ in range(8):
            c = jnp.dot(c, b, preferred_element_type=jnp.bfloat16)
        return c.sum()
    float(mm(a, b))
    t0 = time.perf_counter()
    for _ in range(3):
        out = mm(a, b)
    float(out)
    per = (time.perf_counter()-t0)/(3*8)
    print(f"matmul {M}: {per*1e3:6.2f} ms  {2*M**3/per/1e12:6.1f} TFLOP/s", flush=True)
