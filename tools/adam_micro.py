import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from mdilss_tpu.models import erfnet_rap
from mdilss_tpu.train import masks, optim

params, bn = erfnet_rap.init(jax.random.key(0), [20, 20], 2)
lr_tree = masks.rap_lr_tree(params, current_task=1, shared_lr=5e-6, ds_lr=5e-4)
grads = jax.tree.map(lambda a: a * 1e-3, params)
opt = optim.init(params)
K = 8

@jax.jit
def chain(p, g, o):
    acc = jnp.float32(0)
    for i in range(K):
        p, o = optim.apply_updates(p, g, o, lr_tree, lr_scale=1.0)
        acc += jnp.sum(o.m[:8])
    return p, o, acc
r = chain(params, grads, opt); float(r[2])
t0 = time.perf_counter(); n = 3
for _ in range(n):
    r = chain(params, grads, opt)
float(r[2])
print(f"flat adam: {(time.perf_counter()-t0)/(n*K)*1000:.1f} ms/update", flush=True)

# how expensive are just the concat and the slices?
@jax.jit
def concat_only(p):
    acc = jnp.float32(0)
    for i in range(K):
        f = optim._flatten(p)
        acc += f[i]
    return acc
float(concat_only(params))
t0 = time.perf_counter()
for _ in range(n):
    r = concat_only(params)
float(r)
print(f"concat 200 leaves: {(time.perf_counter()-t0)/(n*K)*1000:.1f} ms", flush=True)

import numpy as np
flat = jnp.zeros((sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params)),), jnp.float32)
@jax.jit
def slices_only(f):
    acc = jnp.float32(0)
    for i in range(K):
        leaves, treedef = jax.tree.flatten(params)
        off = 0
        tot = jnp.float32(0)
        for l in leaves:
            nsz = int(np.prod(l.shape))
            tot += jax.lax.dynamic_slice_in_dim(f, off, nsz)[0]
            off += nsz
        acc += tot + f[i]
    return acc
float(slices_only(flat))
t0 = time.perf_counter()
for _ in range(n):
    r = slices_only(flat)
float(r)
print(f"200 slices: {(time.perf_counter()-t0)/(n*K)*1000:.1f} ms", flush=True)
