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


class AdamState(NamedTuple):
    m: Any  # first-moment pytree (zeros on frozen slices, forever)
    v: Any  # second-moment pytree
    count: jax.Array  # scalar int32 — shared by all leaves (see steps.py)


def init(params) -> AdamState:
    zeros = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.copy, zeros), count=jnp.zeros((), jnp.int32))


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
    factor (poly decay, applied to every group as torch LambdaLR does)."""
    count = opt_state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    def leaf(p, g, m, v, lr):
        lr = jnp.asarray(lr, jnp.float32)
        active = (lr > 0).astype(jnp.float32)
        gf = (g.astype(jnp.float32) + weight_decay * p.astype(jnp.float32)) * active
        m = b1 * m + (1.0 - b1) * gf
        v = b2 * v + (1.0 - b2) * jnp.square(gf)
        step = (lr * lr_scale) * (m / c1) / (jnp.sqrt(v / c2) + eps)
        return (p.astype(jnp.float32) - step).astype(p.dtype), m, v

    p_leaves, treedef = jax.tree.flatten(params)
    g_leaves = treedef.flatten_up_to(grads)
    m_leaves = treedef.flatten_up_to(opt_state.m)
    v_leaves = treedef.flatten_up_to(opt_state.v)
    lr_leaves = treedef.flatten_up_to(lr_tree)
    out = [leaf(*args) for args in zip(p_leaves, g_leaves, m_leaves, v_leaves, lr_leaves)]
    new_p = jax.tree.unflatten(treedef, [t[0] for t in out])
    new_m = jax.tree.unflatten(treedef, [t[1] for t in out])
    new_v = jax.tree.unflatten(treedef, [t[2] for t in out])
    return new_p, AdamState(m=new_m, v=new_v, count=count)


def poly_lr_factor(epoch, num_epochs: int, power: float = 0.9):
    """Reference LambdaLR schedule: (1 - (epoch-1)/E)^0.9, epoch in [1, E]
    (train_RAPFT_step1.py:264-265). `epoch` may be a traced scalar."""
    e = jnp.asarray(epoch, jnp.float32)
    return jnp.power(1.0 - (e - 1.0) / num_epochs, power)
