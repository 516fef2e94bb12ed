import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

def timeit(f, *args, n=50):
    out = f(*args)
    jax.tree.leaves(out)[0].sum().item() if hasattr(jax.tree.leaves(out)[0], "sum") else None
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n

DIM = ("NHWC", "HWIO", "NHWC")
N, H, W, C = 6, 64, 128, 128
dt = jnp.bfloat16
x = jax.random.normal(jax.random.key(0), (N, H, W, C), dt)
w31 = jax.random.normal(jax.random.key(1), (3, 1, C, C), dt)
w13 = jax.random.normal(jax.random.key(2), (1, 3, C, C), dt)
w11 = jax.random.normal(jax.random.key(3), (1, 1, C, C), dt)
w33 = jax.random.normal(jax.random.key(4), (3, 3, C, C), dt)

conv31 = jax.jit(lambda x, w: lax.conv_general_dilated(x, w, (1,1), ((1,1),(0,0)), dimension_numbers=DIM))
conv13 = jax.jit(lambda x, w: lax.conv_general_dilated(x, w, (1,1), ((0,0),(1,1)), dimension_numbers=DIM))
conv11 = jax.jit(lambda x, w: lax.conv_general_dilated(x, w, (1,1), ((0,0),(0,0)), dimension_numbers=DIM))
conv33 = jax.jit(lambda x, w: lax.conv_general_dilated(x, w, (1,1), ((1,1),(1,1)), dimension_numbers=DIM))

# matmul formulations
@jax.jit
def mm31(x, w):  # w [3,1,C,C] -> sum of shifted matmuls
    w2 = w.reshape(3, C, C)
    xp = jnp.pad(x, ((0,0),(1,1),(0,0),(0,0)))
    out = jnp.einsum("nhwc,cd->nhwd", xp[:, 0:H], w2[0], preferred_element_type=jnp.float32)
    out += jnp.einsum("nhwc,cd->nhwd", xp[:, 1:H+1], w2[1], preferred_element_type=jnp.float32)
    out += jnp.einsum("nhwc,cd->nhwd", xp[:, 2:H+2], w2[2], preferred_element_type=jnp.float32)
    return out.astype(dt)

@jax.jit
def mm11(x, w):
    return jnp.einsum("nhwc,cd->nhwd", x, w.reshape(C, C), preferred_element_type=jnp.float32).astype(dt)

flop31 = 2 * N*H*W * C*C*3
flop11 = 2 * N*H*W * C*C
flop33 = 2 * N*H*W * C*C*9

for name, f, args, fl in [
    ("conv3x1 xla", conv31, (x, w31), flop31),
    ("conv3x1 mm ", mm31, (x, w31), flop31),
    ("conv1x3 xla", conv13, (x, w13), flop31),
    ("conv1x1 xla", conv11, (x, w11), flop11),
    ("conv1x1 mm ", mm11, (x, w11), flop11),
    ("conv3x3 xla", conv33, (x, w33), flop33),
]:
    dt_s = timeit(f, *args)
    print(f"{name}: {dt_s*1e6:8.1f} us  {fl/dt_s/1e12:6.2f} TFLOP/s", flush=True)

# larger spatial, C=64 (group64 shapes)
C2 = 64; H2, W2 = 128, 256
x2 = jax.random.normal(jax.random.key(5), (N, H2, W2, C2), dt)
w31b = jax.random.normal(jax.random.key(6), (3, 1, C2, C2), dt)
conv31b = jax.jit(lambda x, w: lax.conv_general_dilated(x, w, (1,1), ((1,1),(0,0)), dimension_numbers=DIM))
fl = 2 * N*H2*W2*C2*C2*3
print(f"conv3x1 C64 xla: {timeit(conv31b, x2, w31b)*1e6:8.1f} us  {fl/timeit(conv31b, x2, w31b)/1e12:6.2f} TFLOP/s", flush=True)
