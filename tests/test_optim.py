"""Optimizer goldens: our per-element-LR Adam vs torch.optim.Adam.

Covers: moments/bias-correction/weight-decay math, differential-LR param
groups, frozen params (absent from torch groups == lr 0 here), and the poly
LambdaLR schedule.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mdilss_tpu.train import optim


def test_adam_matches_torch_with_groups_and_freeze(rng):
    shapes = {"shared": (4, 3), "ds": (5,), "frozen": (2, 2)}
    params_np = {k: rng.standard_normal(s, dtype=np.float32) for k, s in shapes.items()}
    tparams = {k: torch.nn.Parameter(torch.from_numpy(v.copy())) for k, v in params_np.items()}

    topt = torch.optim.Adam(
        [
            {"params": [tparams["shared"]], "lr": 5e-6},
            {"params": [tparams["ds"]]},
        ],
        5e-4, (0.9, 0.999), eps=1e-8, weight_decay=1e-4,
    )
    sched = torch.optim.lr_scheduler.LambdaLR(
        topt, lr_lambda=lambda e: (1 - (e - 1) / 150) ** 0.9
    )

    jparams = {k: jnp.asarray(v) for k, v in params_np.items()}
    lr_tree = {"shared": jnp.float32(5e-6), "ds": jnp.float32(5e-4), "frozen": jnp.float32(0.0)}
    jopt = optim.init(jparams)

    for epoch in (1, 2, 75):
        sched.step(epoch)
        for _ in range(3):
            grads_np = {k: rng.standard_normal(s, dtype=np.float32) for k, s in shapes.items()}
            topt.zero_grad()
            for k in ("shared", "ds"):
                tparams[k].grad = torch.from_numpy(grads_np[k].copy())
            topt.step()

            jgrads = {k: jnp.asarray(v) for k, v in grads_np.items()}
            jparams, jopt = optim.apply_updates(
                jparams, jgrads, jopt, lr_tree,
                lr_scale=optim.poly_lr_factor(epoch, 150),
            )

    for k in ("shared", "ds"):
        np.testing.assert_allclose(
            np.asarray(jparams[k]), tparams[k].detach().numpy(), atol=1e-6, rtol=1e-5, err_msg=k
        )
    np.testing.assert_array_equal(np.asarray(jparams["frozen"]), params_np["frozen"])
    # moments stay exactly zero wherever lr == 0 (flat layout)
    flat_lr = optim._flat_lr(jparams, lr_tree)
    np.testing.assert_array_equal(np.asarray(jopt.m)[flat_lr == 0], 0.0)
    np.testing.assert_array_equal(np.asarray(jopt.v)[flat_lr == 0], 0.0)


def test_zeroed_grad_step_applies_weight_decay_only(rng):
    """torch<2 zero_grad() semantics: a second optimizer.step() with zero grads
    still decays active params via wd (the reference step-3 phase-2 quirk)."""
    p_np = rng.standard_normal((3, 3), dtype=np.float32)
    tp = torch.nn.Parameter(torch.from_numpy(p_np.copy()))
    topt = torch.optim.Adam([tp], 5e-4, (0.9, 0.999), eps=1e-8, weight_decay=1e-4)
    g = rng.standard_normal((3, 3), dtype=np.float32)
    tp.grad = torch.from_numpy(g.copy())
    topt.step()
    tp.grad = torch.zeros(3, 3)
    topt.step()

    jp = {"p": jnp.asarray(p_np)}
    jopt = optim.init(jp)
    lr = {"p": jnp.float32(5e-4)}
    jp, jopt = optim.apply_updates(jp, {"p": jnp.asarray(g)}, jopt, lr, lr_scale=1.0)
    jp, jopt = optim.apply_updates(jp, {"p": jnp.zeros((3, 3))}, jopt, lr, lr_scale=1.0)
    np.testing.assert_allclose(np.asarray(jp["p"]), tp.detach().numpy(), atol=1e-7)


def test_per_element_lr_freezes_slices(rng):
    """Task-stacked leaf: only the hot row moves."""
    p = {"w": jnp.asarray(rng.standard_normal((3, 4), dtype=np.float32))}
    before = np.asarray(p["w"]).copy()
    lr = {"w": jnp.asarray(np.array([[0.0], [5e-4], [0.0]], np.float32))}
    g = {"w": jnp.ones((3, 4))}
    st = optim.init(p)
    p2, _ = optim.apply_updates(p, g, st, lr, lr_scale=1.0)
    got = np.asarray(p2["w"])
    np.testing.assert_array_equal(got[0], before[0])
    np.testing.assert_array_equal(got[2], before[2])
    assert np.all(got[1] != before[1])
