import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from mdilss_tpu.data import CLASS_WEIGHTS
from mdilss_tpu.models import erfnet_rap
from mdilss_tpu.losses import weighted_cross_entropy, kld_faithful
from mdilss_tpu.train import masks, steps, optim

C = 20
s_params, s_bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
t_params, t_bn = erfnet_rap.init(jax.random.key(1), [C], 1)
lr_tree = masks.rap_lr_tree(s_params, current_task=1, shared_lr=5e-6, ds_lr=5e-4)
B = 6
bf = jnp.bfloat16
x = jax.random.normal(jax.random.key(2), (B, 512, 1024, 3))
y = jax.random.randint(jax.random.key(3), (B, 512, 1024), 0, C)
W = CLASS_WEIGHTS["BDD"]

def apply_fn(p, s, xx, task, training=True, rng=None, bn_train=True):
    logits, ns = erfnet_rap.apply(p, s, xx.astype(bf), task, training=training and bn_train, rng=rng, remat=True)
    return logits.astype(jnp.float32), ns

def make(variant):
    def loss_fn(p, bn, rng):
        rngs = jax.random.split(rng, 2) if rng is not None else [None, None]
        drop_rng = None if variant.get("no_dropout") else rngs[0]
        bn_train = not variant.get("bn_eval")
        logits, bn2 = apply_fn(p, bn, x, 1, rng=drop_rng, bn_train=bn_train)
        ce = weighted_cross_entropy(logits, y, W)
        if variant.get("no_kd"):
            return ce, bn2
        prev = jax.checkpoint(lambda pp, bb, rr: apply_fn(pp, bb, x, 0, rng=rr, bn_train=bn_train))
        s_log, bn2 = prev(p, bn2, None if variant.get("no_dropout") else rngs[1])
        t_log, _ = apply_fn(t_params, t_bn, x, 0, training=False)
        return ce + 0.1 * kld_faithful(s_log, jax.lax.stop_gradient(t_log)), bn2

    def step(p, bn, opt, rng):
        (l, bn2), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bn, rng)
        if variant.get("no_adam"):
            return p, bn2, opt, l
        p2, opt2 = optim.apply_updates(p, g, opt, lr_tree, lr_scale=1.0)
        return p2, bn2, opt2, l

    @jax.jit
    def chain(p, bn, opt, rng):
        tot = jnp.float32(0)
        for i in range(4):
            rng, k = jax.random.split(rng)
            p, bn, opt, l = step(p, bn, opt, k)
            tot += l
        return p, bn, opt, tot
    return chain

import json
sel = json.loads(os.environ.get("ABLATE", "[0,1,2,3,4,5]"))
ALL = [
    ("full          ", {}),
    ("no dropout    ", {"no_dropout": True}),
    ("bn eval-mode  ", {"bn_eval": True}),
    ("no KD path    ", {"no_kd": True}),
    ("no adam       ", {"no_adam": True}),
    ("bare min      ", {"no_dropout": True, "bn_eval": True, "no_kd": True, "no_adam": True}),
]
for name, variant in [ALL[i] for i in sel]:
    chain = make(variant)
    opt = optim.init(s_params)
    p, bn = jax.tree.map(jnp.array, s_params), jax.tree.map(jnp.array, s_bn)
    out = chain(p, bn, opt, jax.random.key(7)); float(out[3])
    t0 = time.perf_counter()
    for _ in range(3):
        out = chain(p, bn, opt, jax.random.key(8))
    float(out[3])
    print(f"{name}: {(time.perf_counter()-t0)/(3*4)*1000:7.1f} ms/step", flush=True)
