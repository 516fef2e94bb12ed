"""Host/device placement helpers.

Model initialization is ~800 small random ops; run eagerly against a remote
TPU backend (the axon tunnel) each op is a round-trip and init takes ~30 s.
Running the same ops on the in-process CPU backend takes <1 s; the resulting
pytree then ships to the device in one transfer when first used (or
explicitly via jax.device_put).
"""
from __future__ import annotations

import contextlib

import jax


def on_cpu():
    """Context manager: run eager ops on the host CPU backend."""
    return jax.default_device(jax.local_devices(backend="cpu")[0])


def init_on_host(init_fn, seed: int, *args, **kwargs):
    """Run `init_fn(key, *args, **kwargs)` on the CPU backend, jitted.

    Takes a SEED, not a key: a key living on a remote device costs a ~40 s
    cross-backend device_put through the tunnel, and even CPU-local eager
    dispatch pays ~10 ms/op while a remote backend is registered (~1600 ops
    in a full model init). One jitted program sidesteps both.
    """
    with on_cpu():
        key = jax.random.key(seed)
        fn = jax.jit(lambda k: init_fn(k, *args, **kwargs), backend="cpu")
        return jax.tree.map(lambda a: a, fn(key))  # block via tree copy of refs
