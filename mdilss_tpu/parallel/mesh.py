"""Device mesh + sharding for the train/eval steps.

The reference's only parallelism is single-process torch DataParallel
(replicate + scatter over GPUs, train_RAPFT_step1.py:463) plus an ad-hoc
teacher-on-its-own-GPU split in step 3 (SURVEY.md §2.9). The TPU-native
equivalent is one jitted step over a `jax.sharding.Mesh`:

  * `data` axis  — batch sharding (the DP replacement). XLA inserts the
    gradient all-reduce (psum) over ICI; BN batch stats reduce globally in
    the same way (sync-BN; see ops/norm.py).
  * `spatial` axis — optional sharding of the image H dimension (the model
    has no sequence axis; its long-context analog is spatial, SURVEY.md §5).
    XLA handles halo exchange for spatially-sharded convolutions with
    collective-permutes automatically.

Params/optimizer state are replicated: at ~2M params there is nothing to gain
from sharding them (a v4-8's HBM fits thousands of copies), and replication
makes the per-step all-reduce the only collective.

The same code runs on a real TPU slice or on N virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=N) — that is how the
multi-chip path is tested without a pod (SURVEY.md §4).
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    *,
    data: int | None = None,
    spatial: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ('data', 'spatial') mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    if data is None:
        data = n_devices // spatial
    assert data * spatial == n_devices, (data, spatial, n_devices)
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_spec() -> P:
    """Images [N, H, W, C] / labels [N, H, W]: batch over 'data', H over 'spatial'."""
    return P("data", "spatial")


def shard_batch(mesh: Mesh, images, labels):
    """Place a host batch onto the mesh (one transfer per device shard)."""
    im_sh = NamedSharding(mesh, P("data", "spatial"))
    lb_sh = NamedSharding(mesh, P("data", "spatial"))
    return jax.device_put(images, im_sh), jax.device_put(labels, lb_sh)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def _rep(mesh):
    return NamedSharding(mesh, P())


def jit_train_step(step_fn, mesh: Mesh):
    """jit a `step(ts, images, labels, masks, rng, epoch)` with batch sharding
    in and replicated state; donates the train state."""
    data_sh = NamedSharding(mesh, P("data", "spatial"))
    return jax.jit(
        step_fn,
        in_shardings=(_rep(mesh), data_sh, data_sh, _rep(mesh), _rep(mesh), _rep(mesh)),
        out_shardings=(_rep(mesh), _rep(mesh)),
        donate_argnums=(0,),
    )


def jit_distill_step(step_fn, mesh: Mesh):
    """jit a `step(ts, teacher, images, labels, masks, rng, epoch)` (step 2/3)."""
    data_sh = NamedSharding(mesh, P("data", "spatial"))
    return jax.jit(
        step_fn,
        in_shardings=(_rep(mesh), _rep(mesh), data_sh, data_sh, _rep(mesh), _rep(mesh), _rep(mesh)),
        out_shardings=(_rep(mesh), _rep(mesh)),
        donate_argnums=(0,),
    )


def jit_eval_step(step_fn, mesh: Mesh):
    """jit a `step(params, bn, images, labels) -> (loss, cm)`."""
    data_sh = NamedSharding(mesh, P("data", "spatial"))
    return jax.jit(
        step_fn,
        in_shardings=(_rep(mesh), _rep(mesh), data_sh, data_sh),
        out_shardings=(_rep(mesh), _rep(mesh)),
    )
