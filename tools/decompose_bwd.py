import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from mdilss_tpu.models import erfnet_rap, topology, blocks as B
from mdilss_tpu.ops import maxpool2d, batch_norm_apply, bn_init

C = 20
params, bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
N = 6
bf = jnp.bfloat16

def timed(name, fn, *args, n=5):
    f = jax.jit(fn)
    r = f(*args); float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:7.1f} ms", flush=True)

x = jax.random.normal(jax.random.key(2), (N, 512, 1024, 3), bf)

def enc_loss(p, x):
    out, _ = topology.encoder_apply(p["encoder"], bn["encoder"], x, rap=True, task=1, training=True, rng=jax.random.key(1))
    return jnp.sum(out.astype(jnp.float32))
timed("encoder fwd+bwd        ", lambda p, x: jax.grad(enc_loss)(p, x), params, x)

feats = jax.random.normal(jax.random.key(3), (N, 64, 128, 128), bf)
def dec_loss(p, f):
    out, _ = topology.decoder_apply(p["decoders"][1], bn["decoders"][1], f, training=True)
    return jnp.sum(out.astype(jnp.float32))
timed("decoder fwd+bwd        ", lambda p, f: jax.grad(dec_loss, argnums=1)(p, f), params, feats)

# maxpool backward microbench (3 pools in the model)
xp = jax.random.normal(jax.random.key(4), (N, 512, 1024, 16), bf)
timed("maxpool fwd            ", lambda x: maxpool2d(x), xp)
timed("maxpool fwd+bwd        ", lambda x: jax.grad(lambda z: jnp.sum(maxpool2d(z).astype(jnp.float32)))(x), xp)

# BN train fwd+bwd microbench at the big decoder shape
xb = jax.random.normal(jax.random.key(5), (N, 256, 512, 64), bf)
p0, s0 = bn_init(64)
def bnloss(x):
    y, _ = batch_norm_apply(x, p0["scale"], p0["bias"], s0, training=True)
    return jnp.sum(y.astype(jnp.float32))
timed("BN train fwd           ", lambda x: batch_norm_apply(x, p0["scale"], p0["bias"], s0, training=True)[0], xb)
timed("BN train fwd+bwd       ", lambda x: jax.grad(bnloss)(x), xb)

# single nb1d_rap block fwd+bwd at group128 shape
bp, bs = B.nb1d_rap_init(jax.random.key(6), 128, 2, 2)
xg = jax.random.normal(jax.random.key(7), (N, 64, 128, 128), bf)
def blk(x):
    y, _ = B.nb1d_rap_apply(bp, bs, x, task=1, dilated=2, dropprob=0.0, training=True)
    return jnp.sum(y.astype(jnp.float32))
timed("nb1d_rap 128 fwd       ", lambda x: B.nb1d_rap_apply(bp, bs, x, task=1, dilated=2, dropprob=0.0, training=True)[0], xg)
timed("nb1d_rap 128 fwd+bwd   ", lambda x: jax.grad(blk)(x), xg)
