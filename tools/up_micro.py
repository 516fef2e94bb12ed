"""Upsampler ConvTranspose2d(3,s2,p1,op1): lhs-dilated conv vs sub-pixel matmuls."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from mdilss_tpu.ops import conv_transpose2d

bf = jnp.bfloat16

def up_subpixel(x, w, b):
    """w: [3,3,cin,cout] (unflipped, torch ConvTranspose semantics:
    out[o] = sum_m x[m] w[o-2m+1])."""
    n, h, wd, cin = x.shape
    cout = w.shape[3]
    # taps: x, x shifted down (+1 row), right (+1 col), down-right
    xp = jnp.pad(x, ((0,0),(0,1),(0,1),(0,0)))
    taps = [xp[:, :h, :wd], xp[:, 1:h+1, :wd], xp[:, :h, 1:wd+1], xp[:, 1:h+1, 1:wd+1]]
    # phase (a,b): out[2i+a, 2j+b] = sum over taps t=(dr,dc): x[i+dr, j+dc] @ w[a-2dr+1, b-2dc+1]
    outs = []
    for a in (0, 1):
        for b_ in (0, 1):
            acc = None
            for t, (dr, dc) in enumerate([(0,0),(1,0),(0,1),(1,1)]):
                kh, kw = a - 2*dr + 1, b_ - 2*dc + 1
                if 0 <= kh <= 2 and 0 <= kw <= 2:
                    m = w[kh, kw]
                    v = jax.lax.dot_general(taps[t], m.astype(x.dtype), (((3,),(0,)),((),())))
                    acc = v if acc is None else acc + v
            outs.append(acc)
    out = jnp.stack(outs, axis=3).reshape(n, h, wd, 2, 2, cout)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2*h, 2*wd, cout)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out

def timed(name, fn, *args, n=8):
    f = jax.jit(fn)
    r = f(*args); float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)

for cin, cout, H, W in [(128, 64, 64, 128), (64, 16, 128, 256)]:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, H, W, cin)), bf)
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    a1 = jax.jit(lambda x: conv_transpose2d(x, w, b, stride=2, padding=1, output_padding=1))(x)
    a2 = jax.jit(lambda x: up_subpixel(x, w, b))(x)
    print(f"{cin}->{cout}: err {float(jnp.max(jnp.abs(a1.astype(jnp.float32)-a2.astype(jnp.float32)))):.2e}")
    timed(f"  ref fwd {cin:3d}->{cout:3d}", lambda x: conv_transpose2d(x, w, b, stride=2, padding=1, output_padding=1), x)
    timed(f"  sub fwd {cin:3d}->{cout:3d}", lambda x: up_subpixel(x, w, b), x)
    timed(f"  ref fwd+bwd", lambda x: jax.grad(lambda xx: jnp.sum(conv_transpose2d(xx, w, b, stride=2, padding=1, output_padding=1).astype(jnp.float32)))(x), x)
    timed(f"  sub fwd+bwd", lambda x: jax.grad(lambda xx: jnp.sum(up_subpixel(xx, w, b).astype(jnp.float32)))(x), x)
