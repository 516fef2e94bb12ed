import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from mdilss_tpu.models import erfnet_rap, topology, blocks as B
from mdilss_tpu.ops import maxpool2d

C = 20
params, bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
N = 6
bf = jnp.bfloat16
K = 10

def timed(name, make_fn, *args, k=K, n=3):
    f = jax.jit(make_fn)
    r = f(*args); float(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    float(r)
    print(f"{name}: {(time.perf_counter()-t0)/(n*k)*1000:7.1f} ms", flush=True)

x0 = jax.random.normal(jax.random.key(2), (N, 512, 1024, 3), bf)

def enc_fwd_chain(x):
    acc = jnp.float32(0)
    for i in range(K):
        out, _ = topology.encoder_apply(params["encoder"], bn["encoder"], x * (1 + 1e-6 * i), rap=True, task=1, training=True, rng=jax.random.key(i))
        acc += jnp.sum(out.astype(jnp.float32))
    return acc
timed("encoder fwd train      ", enc_fwd_chain, x0)

def enc_fwdbwd_chain(x):
    acc = jnp.float32(0)
    def loss(xx):
        out, _ = topology.encoder_apply(params["encoder"], bn["encoder"], xx, rap=True, task=1, training=True, rng=jax.random.key(0))
        return jnp.sum(out.astype(jnp.float32))
    for i in range(K):
        g = jax.grad(loss)(x * (1 + 1e-6 * i))
        acc += jnp.sum(g.astype(jnp.float32))
    return acc
timed("encoder fwd+bwd (dx)   ", enc_fwdbwd_chain, x0)

feats = jax.random.normal(jax.random.key(3), (N, 64, 128, 128), bf)
def dec_fwdbwd(f0):
    acc = jnp.float32(0)
    def loss(ff):
        out, _ = topology.decoder_apply(params["decoders"][1], bn["decoders"][1], ff, training=True)
        return jnp.sum(out.astype(jnp.float32))
    for i in range(K):
        acc += jnp.sum(jax.grad(loss)(f0 * (1 + 1e-6 * i)).astype(jnp.float32))
    return acc
timed("decoder fwd+bwd        ", dec_fwdbwd, feats)

def dec_fwd(f0):
    acc = jnp.float32(0)
    for i in range(K):
        out, _ = topology.decoder_apply(params["decoders"][1], bn["decoders"][1], f0 * (1 + 1e-6 * i), training=True)
        acc += jnp.sum(out.astype(jnp.float32))
    return acc
timed("decoder fwd train      ", dec_fwd, feats)

xp0 = jax.random.normal(jax.random.key(4), (N, 512, 1024, 16), bf)
def mp_bwd(x):
    acc = jnp.float32(0)
    for i in range(K):
        g = jax.grad(lambda z: jnp.sum(maxpool2d(z).astype(jnp.float32)))(x * (1 + 1e-6 * i))
        acc += jnp.sum(g.astype(jnp.float32))
    return acc
timed("maxpool512 fwd+bwd     ", mp_bwd, xp0)
