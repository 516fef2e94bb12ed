"""Torch-exact Adam with per-element learning rates and freeze masks.

Why not optax: the reference's trainable set is defined by *slices* of what
are, in this framework, single task-stacked arrays (e.g. `rap1.w[T,1,1,C,C]`
where only slice `t=current` trains, at a different LR than the shared convs).
Per-element LR arrays express freeze masks + differential LR + the poly
schedule in one multiply, and let us reproduce torch.optim.Adam bit-for-bit:

    g      <- grad + wd * p          (L2-style decoupled-from-loss decay,
                                      torch.optim.Adam weight_decay semantics)
    m      <- b1 * m + (1 - b1) * g
    v      <- b2 * v + (1 - b2) * g^2
    p      <- p - lr * (m / (1 - b1^t)) / (sqrt(v / (1 - b2^t)) + eps)

(reference optimizer: Adam(lr 5e-4, betas (0.9, 0.999), eps 1e-8, wd 1e-4),
train_RAPFT_step1.py:260-261; param groups/differential LR,
train_new_task_step2.py:229-239.)

Frozen elements: lr == 0 everywhere in the leaf's lr array => the gradient is
masked to zero *before* the moment update, so moments stay exactly 0 and the
parameter never moves — equivalent to torch's "not in any param group".

The "zeroed-grad" quirk of the reference's two-phase step 3 (phase-2
optimizer.step() sees zero grads + weight decay for the CE-only params,
because torch<2 zero_grad() zeroes in place rather than setting None) falls
out naturally: autodiff produces exact-zero grads for uninvolved params and
the wd term still applies wherever lr > 0.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class AdamState(NamedTuple):
    m: Any  # first moment, ONE flat [P] f32 vector over all leaves
    v: Any  # second moment, flat [P]
    count: jax.Array  # scalar int32 — shared by all leaves (see steps.py)


def _flat_size(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def init(params) -> AdamState:
    n = _flat_size(params)
    return AdamState(
        m=jnp.zeros((n,), jnp.float32),
        v=jnp.zeros((n,), jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


def _flatten(tree):
    return jnp.concatenate([l.reshape(-1).astype(jnp.float32) for l in jax.tree.leaves(tree)])


def _flat_lr(params, lr_tree) -> np.ndarray:
    """Per-element LR vector, built in numpy at TRACE time (one host constant).

    lr_tree leaves are numpy scalars/arrays broadcastable against their param
    leaves (see masks.py) — broadcasting + concatenation happen off-graph.
    """
    p_leaves, treedef = jax.tree.flatten(params)
    lr_leaves = treedef.flatten_up_to(lr_tree)
    return np.concatenate([
        np.broadcast_to(np.asarray(lr, np.float32), p.shape).reshape(-1)
        for p, lr in zip(p_leaves, lr_leaves)
    ])


def apply_updates(
    params,
    grads,
    opt_state: AdamState,
    lr_tree,
    *,
    lr_scale,
    weight_decay: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """One Adam step. `lr_tree` leaves broadcast against param leaves and give
    the per-element base LR (0 = frozen); `lr_scale` is the scalar schedule
    factor (poly decay, applied to every group as torch LambdaLR does).

    All Adam math runs on ONE flattened [P] vector: the target device charges
    a large fixed cost per HLO op, so ~10 ops on one big vector beat ~10 ops
    on each of ~200 leaves by more than an order of magnitude. The per-element
    LR vector is assembled in numpy at trace time and rides along as a single
    program constant.
    """
    count = opt_state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    lr = jnp.asarray(_flat_lr(params, lr_tree))
    active = (lr > 0).astype(jnp.float32)
    p_flat = _flatten(params)
    gf = (_flatten(grads) + weight_decay * p_flat) * active
    m = b1 * opt_state.m + (1.0 - b1) * gf
    v = b2 * opt_state.v + (1.0 - b2) * jnp.square(gf)
    new_flat = p_flat - (lr * lr_scale) * (m / c1) / (jnp.sqrt(v / c2) + eps)

    p_leaves, treedef = jax.tree.flatten(params)
    out, off = [], 0
    for p in p_leaves:
        n = int(np.prod(p.shape))
        out.append(jax.lax.dynamic_slice_in_dim(new_flat, off, n).reshape(p.shape).astype(p.dtype))
        off += n
    return jax.tree.unflatten(treedef, out), AdamState(m=m, v=v, count=count)


def poly_lr_factor(epoch, num_epochs: int, power: float = 0.9):
    """Reference LambdaLR schedule: (1 - (epoch-1)/E)^0.9, epoch in [1, E]
    (train_RAPFT_step1.py:264-265). `epoch` may be a traced scalar."""
    e = jnp.asarray(epoch, jnp.float32)
    return jnp.power(1.0 - (e - 1.0) / num_epochs, power)
