import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from jax import lax

DIM = ("NHWC", "HWIO", "NHWC")
N = 6
dt = jnp.bfloat16
K = 40  # convs per jit

def bench(H, W, C, kh, kw, name, dil=1):
    x = jax.random.normal(jax.random.key(0), (N, H, W, C), dt)
    w = jax.random.normal(jax.random.key(1), (kh, kw, C, C), dt) * 0.05
    ph, pw = dil * (kh // 2), dil * (kw // 2)
    @jax.jit
    def chain(x, w):
        for _ in range(K):
            x = lax.conv_general_dilated(x, w, (1, 1), ((ph, ph), (pw, pw)),
                                          rhs_dilation=(dil, dil), dimension_numbers=DIM)
        return x.sum()
    float(chain(x, w))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = chain(x, w)
    float(out)
    per = (time.perf_counter() - t0) / (reps * K)
    fl = 2 * N * H * W * C * C * kh * kw
    print(f"{name}: {per*1e6:7.1f} us/conv  {fl/per/1e12:6.2f} TFLOP/s", flush=True)

bench(64, 128, 128, 3, 1, "3x1 C128 64x128 ")
bench(64, 128, 128, 1, 3, "1x3 C128 64x128 ")
bench(64, 128, 128, 1, 1, "1x1 C128 64x128 ")
bench(64, 128, 128, 3, 3, "3x3 C128 64x128 ")
bench(64, 128, 128, 3, 1, "3x1 d16 C128    ", dil=16)
bench(128, 256, 64, 3, 1, "3x1 C64 128x256 ")
bench(128, 256, 64, 1, 1, "1x1 C64 128x256 ")
bench(256, 512, 16, 3, 1, "3x1 C16 256x512 ")
