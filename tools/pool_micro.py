import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from mdilss_tpu.models import blocks as B
from mdilss_tpu.ops import conv2d, maxpool2d

bf = jnp.bfloat16

def pool_group(x):
    n, h, w, c = x.shape
    return jnp.max(x.reshape(n, h//2, 2, w//2, 2, c), axis=(2, 4))

def down_gp(p, x):
    conv = conv2d(x, p["conv"]["w"], p["conv"]["b"], stride=2, padding=1)
    return jnp.concatenate([conv, pool_group(x)], axis=-1)

def down_ref(p, x):
    conv = conv2d(x, p["conv"]["w"], p["conv"]["b"], stride=2, padding=1)
    return jnp.concatenate([conv, maxpool2d(x, 2, 2)], axis=-1)

def timed(name, fn, *args, n=8):
    f = jax.jit(fn)
    r = f(*args); float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)

for cin, cout, H, W in [(3, 16, 512, 1024), (16, 64, 256, 512), (64, 128, 128, 256)]:
    p, _ = B.downsampler_init(jax.random.key(0), cin, cout, None)
    x = jax.random.normal(jax.random.key(1), (6, H, W, cin), bf)
    a = jax.jit(lambda p, x: down_ref(p, x))(p, x)
    b_ = jax.jit(lambda p, x: down_gp(p, x))(p, x)
    print(f"cin={cin}: max err {float(jnp.max(jnp.abs(a.astype(jnp.float32)-b_.astype(jnp.float32)))):.2e}")
    def g_ref(p, x): return jax.grad(lambda xx: jnp.sum(down_ref(p, xx).astype(jnp.float32)))(x)
    def g_gp(p, x): return jax.grad(lambda xx: jnp.sum(down_gp(p, xx).astype(jnp.float32)))(x)
    timed(f"  ref  fwd+bwd {cin:3d}", g_ref, p, x)
    timed(f"  gpool fwd+bwd {cin:3d}", g_gp, p, x)
