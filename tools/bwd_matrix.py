import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from mdilss_tpu.data import CLASS_WEIGHTS
from mdilss_tpu.models import erfnet_rap
from mdilss_tpu.losses import weighted_cross_entropy

C = 20
params, bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
B = 6
bf = jnp.bfloat16
x = jax.random.normal(jax.random.key(2), (B, 512, 1024, 3), bf)
y = jax.random.randint(jax.random.key(3), (B, 512, 1024), 0, C)
K = 6

def timed(name, chain):
    f = jax.jit(chain)
    float(f(params, x))
    t0 = time.perf_counter(); n = 2
    for _ in range(n):
        r = f(params, x)
    float(r)
    print(f"{name}: {(time.perf_counter()-t0)/(n*K)*1000:7.1f} ms", flush=True)

def make(training, remat, grad, loss_kind="sum", dropout=False):
    def one(p, xx, i):
        def loss(pp):
            rng = jax.random.key(i) if dropout else None
            logits, _ = erfnet_rap.apply(pp, bn, xx * (1 + 1e-6 * i), 1,
                                         training=training, rng=rng, remat=remat)
            if loss_kind == "ce":
                return weighted_cross_entropy(logits.astype(jnp.float32), y, CLASS_WEIGHTS["BDD"])
            return jnp.sum(logits.astype(jnp.float32))
        if grad:
            g = jax.grad(loss)(p)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))
        return loss(p)
    def chain(p, xx):
        acc = jnp.float32(0)
        for i in range(K):
            acc += one(p, xx, i)
        return acc
    return chain

timed("fwd train + dropout      ", make(True, False, False, dropout=True))
timed("grad sum + dropout remat ", make(True, True, True, "sum", dropout=True))
