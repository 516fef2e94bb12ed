"""Downsampler formulations: conv3x3s2+reduce_window vs space-to-depth matmuls."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from mdilss_tpu.models import blocks as B
from mdilss_tpu.ops import conv2d, maxpool2d

bf = jnp.bfloat16

def s2d(x):
    n, h, w, c = x.shape
    xs = x.reshape(n, h//2, 2, w//2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return xs.reshape(n, h//2, w//2, 4*c)  # channel order (di, dj, c)

def down_s2d(p, x):
    """conv3x3 s2 p1 as 4 shifted matmuls on the s2d tensor + maxpool as group max."""
    n, h, w, c = x.shape
    w3 = p["conv"]["w"]  # [3,3,cin,cout]
    cout = w3.shape[3]
    xs = s2d(x)  # [n, h2, w2, 4c]; fold cell (r,s) holds rows 2r,2r+1 / cols 2s,2s+1
    h2, w2 = h//2, w//2
    # out[i,j] needs input rows 2i-1..2i+1, cols 2j-1..2j+1 -> cells (i-1..i, j-1..j)
    # build [2,2] shifted weight mats: shift (a,b) in {-1,0}: cell (i+a, j+b)
    # cell (i+a) row parity di_p holds input row 2(i+a)+di_p = 2i + (2a+di_p);
    # kernel tap index kh = (2a+di_p) + 1 must be in 0..2
    import numpy as np
    mats = {}
    for a in (-1, 0):
        for b in (-1, 0):
            m = jnp.zeros((4*c, cout), bf)
            pieces = []
            sel = np.zeros((2, 2, 3, 3), np.float32)  # (di_p, dj_p) -> (kh, kw) one-hot
            for dip in (0, 1):
                for djp in (0, 1):
                    kh = 2*a + dip + 1
                    kw = 2*b + djp + 1
                    if 0 <= kh <= 2 and 0 <= kw <= 2:
                        sel[dip, djp, kh, kw] = 1.0
            m = jnp.einsum("pqhw,hwio->pqio", jnp.asarray(sel), w3).reshape(4*c, cout)
            mats[(a, b)] = m
    xp = jnp.pad(xs, ((0,0),(1,0),(1,0),(0,0)))
    out = None
    for (a, b), m in mats.items():
        tap = xp[:, 1+a:1+a+h2, 1+b:1+b+w2]
        t = jax.lax.dot_general(tap, m.astype(x.dtype), (((3,),(0,)),((),())))
        out = t if out is None else out + t
    out = out + p["conv"]["b"].astype(out.dtype)
    # maxpool 2x2 s2 = max over the 4 fold groups
    pool = jnp.max(xs.reshape(n, h2, w2, 4, c), axis=3)
    return jnp.concatenate([out, pool], axis=-1)

def down_ref(p, x):
    conv = conv2d(x, p["conv"]["w"], p["conv"]["b"], stride=2, padding=1)
    pool = maxpool2d(x, 2, 2)
    return jnp.concatenate([conv, pool], axis=-1)

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
    b_ = jax.jit(lambda p, x: down_s2d(p, x))(p, x)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32))))
    print(f"cin={cin} cout={cout}: max err {err:.2e}")
    timed(f"  ref fwd   {cin:3d}->{cout:3d}", down_ref, p, x)
    timed(f"  s2d fwd   {cin:3d}->{cout:3d}", down_s2d, p, x)
    def g_ref(p, x): return jax.grad(lambda xx: jnp.sum(down_ref(p, xx).astype(jnp.float32)))(x)
    def g_s2d(p, x): return jax.grad(lambda xx: jnp.sum(down_s2d(p, xx).astype(jnp.float32)))(x)
    timed(f"  ref fwd+bwd", g_ref, p, x)
    timed(f"  s2d fwd+bwd", g_s2d, p, x)
