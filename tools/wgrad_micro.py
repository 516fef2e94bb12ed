import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from jax import lax

DIM = ("NHWC", "HWIO", "NHWC")
N, H, W, C = 6, 64, 128, 128
bf = jnp.bfloat16
K = 10

def timed(name, fn, *args, k=K, n=3):
    f = jax.jit(fn)
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    float(r)
    print(f"{name}: {(time.perf_counter()-t0)/(n*k)*1000:7.2f} ms", flush=True)

x = jax.random.normal(jax.random.key(0), (N, H, W, C), bf)
w31 = jax.random.normal(jax.random.key(1), (3, 1, C, C), bf) * 0.05

def conv_fwd(x, w):
    return lax.conv_general_dilated(x, w, (1,1), ((1,1),(0,0)), dimension_numbers=DIM)

def wgrad_conv(x, w):
    acc = jnp.float32(0)
    def loss(ww, xx):
        return jnp.sum(conv_fwd(xx, ww).astype(jnp.float32))
    for i in range(K):
        g = jax.grad(loss)(w * (1 + 1e-6*i), x)
        acc += jnp.sum(g.astype(jnp.float32))
    return acc
timed("wgrad conv_general     ", wgrad_conv, x, w31)

def mm_fwd(x, w):
    # shift-stack along rows -> one matmul
    xp = jnp.pad(x, ((0,0),(1,1),(0,0),(0,0)))
    xs = jnp.concatenate([xp[:, 0:H], xp[:, 1:H+1], xp[:, 2:H+2]], axis=-1)
    return jnp.einsum("nhwk,kd->nhwd", xs, w.reshape(3*C, C), preferred_element_type=bf)

def wgrad_mm(x, w):
    acc = jnp.float32(0)
    def loss(ww, xx):
        return jnp.sum(mm_fwd(xx, ww).astype(jnp.float32))
    for i in range(K):
        g = jax.grad(loss)(w * (1 + 1e-6*i), x)
        acc += jnp.sum(g.astype(jnp.float32))
    return acc
timed("wgrad shiftstack matmul", wgrad_mm, x, w31)

# full grads (w and x) comparison
def both_conv(x, w):
    acc = jnp.float32(0)
    def loss(ww, xx):
        return jnp.sum(conv_fwd(xx, ww).astype(jnp.float32))
    for i in range(K):
        gw, gx = jax.grad(loss, argnums=(0,1))(w * (1+1e-6*i), x)
        acc += jnp.sum(gw.astype(jnp.float32)) + jnp.sum(gx.astype(jnp.float32))
    return acc
timed("w+x grad conv_general  ", both_conv, x, w31)

def both_mm(x, w):
    acc = jnp.float32(0)
    def loss(ww, xx):
        return jnp.sum(mm_fwd(xx, ww).astype(jnp.float32))
    for i in range(K):
        gw, gx = jax.grad(loss, argnums=(0,1))(w * (1+1e-6*i), x)
        acc += jnp.sum(gw.astype(jnp.float32)) + jnp.sum(gx.astype(jnp.float32))
    return acc
timed("w+x grad shiftstack mm ", both_mm, x, w31)
