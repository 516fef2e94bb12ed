import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from mdilss_tpu.data import CLASS_WEIGHTS
from mdilss_tpu.models import erfnet_rap, topology
from mdilss_tpu.losses import weighted_cross_entropy, kld_faithful
from mdilss_tpu.train import masks, steps

C = 20
params, bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
B = 6
x32 = jax.random.normal(jax.random.key(2), (B, 512, 1024, 3))
y = jax.random.randint(jax.random.key(3), (B, 512, 1024), 0, C)

def timed(name, fn, *args, n=5):
    f = jax.jit(fn)
    r = f(*args); float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:7.1f} ms", flush=True)

bf = jnp.bfloat16
xb = x32.astype(bf)

timed("encoder fwd eval bf16  ", lambda p, x: topology.encoder_apply(p["encoder"], bn["encoder"], x, rap=True, task=1, training=False)[0], params, xb)
timed("full fwd eval bf16     ", lambda p, x: erfnet_rap.apply(p, bn, x, 1, training=False)[0], params, xb)
timed("full fwd train bf16    ", lambda p, x: erfnet_rap.apply(p, bn, x, 1, training=True, rng=jax.random.key(1))[0], params, xb)

def ce_loss(p, x):
    logits, _ = erfnet_rap.apply(p, bn, x.astype(bf), 1, training=True, rng=jax.random.key(1))
    return weighted_cross_entropy(logits.astype(jnp.float32), y, CLASS_WEIGHTS["BDD"])
timed("CE fwd+bwd bf16        ", lambda p, x: jax.grad(ce_loss)(p, x), params, x32)

l1 = jax.random.normal(jax.random.key(5), (B, 512, 1024, C))
l2 = jax.random.normal(jax.random.key(6), (B, 512, 1024, C))
timed("kld_faithful alone     ", kld_faithful, l1, l2)
timed("wce alone              ", lambda l: weighted_cross_entropy(l, y, CLASS_WEIGHTS["BDD"]), l1)
