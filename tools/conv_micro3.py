import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from jax import lax

N, H, W, C = 6, 64, 128, 128
dt = jnp.bfloat16
K = 40

def run(name, body, fl):
    x = jax.random.normal(jax.random.key(0), (N, H, W, C), dt)
    w = jax.random.normal(jax.random.key(1), (3, C, C), dt) * 0.05
    @jax.jit
    def chain(x, w):
        for _ in range(K):
            x = body(x, w)
        return x.sum()
    float(chain(x, w))
    t0 = time.perf_counter(); reps = 5
    for _ in range(reps):
        out = chain(x, w)
    float(out)
    per = (time.perf_counter() - t0) / (reps * K)
    print(f"{name}: {per*1e6:7.1f} us/op  {fl/per/1e12:6.2f} TFLOP/s", flush=True)

fl_mm = 2 * N*H*W * C*C
fl_31 = 3 * fl_mm

# pure matmul on the flattened view
run("matmul [NHW,C]x[C,C]   ", lambda x, w: jnp.einsum("nhwc,cd->nhwd", x, w[0], preferred_element_type=dt), fl_mm)

# 3x1 conv as 3 shifted matmuls (pad + slices)
def mm31(x, w):
    xp = jnp.pad(x, ((0,0),(1,1),(0,0),(0,0)))
    out = jnp.einsum("nhwc,cd->nhwd", xp[:, 0:H], w[0], preferred_element_type=dt)
    out = out + jnp.einsum("nhwc,cd->nhwd", xp[:, 1:H+1], w[1], preferred_element_type=dt)
    out = out + jnp.einsum("nhwc,cd->nhwd", xp[:, 2:H+2], w[2], preferred_element_type=dt)
    return out
run("3x1 as 3 shifted matmul", mm31, fl_31)

# 3x1 as one matmul on stacked-shift input [NHW, 3C] x [3C, C]
def mm31b(x, w):
    xp = jnp.pad(x, ((0,0),(1,1),(0,0),(0,0)))
    xs = jnp.concatenate([xp[:, 0:H], xp[:, 1:H+1], xp[:, 2:H+2]], axis=-1)
    return jnp.einsum("nhwk,kd->nhwd", xs, w.reshape(3*C, C), preferred_element_type=dt)
run("3x1 as [.,3C]x[3C,C]   ", mm31b, fl_31)

# elementwise only (relu) as control for per-op overhead
run("relu only              ", lambda x, w: jax.nn.relu(x), 0.000001)
