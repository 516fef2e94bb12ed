"""Train-step tests: freeze semantics, loss descent, and full trajectory
parity of the step-2 distillation protocol against a torch oracle.

The torch oracle implements the *spec* of SURVEY.md §3.2 (3 forwards, weighted
CE + 0.1 * faithful KLD, Adam with 5e-6/5e-4 groups, poly LambdaLR) using the
reference nn.Module as the network; we then check our single jitted step
reproduces the same parameter trajectory from the same init and batches.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from _reference_loader import load_reference_module
from mdilss_tpu.ckpt import convert_state_dict
from mdilss_tpu.ckpt.pth_converter import export_state_dict
from mdilss_tpu.models import erfnet_rap
from mdilss_tpu.train import masks, optim, steps


def _np_state_dict(model):
    return {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}


def _disable_dropout(model):
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout2d):
            m.p = 0


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_module("models/erfnet_RA_parallel.py")


@pytest.fixture
def torch_single_thread():
    """Pin torch to one thread for the duration of a test: multithreaded CPU
    conv backward partitions reductions by runtime load, so its low-order
    bits are NONdeterministic — enough to flip near-zero-grad Adam signs and
    push marginal trajectory tolerances over the line when the CI host is
    busy. Single-threaded torch is bit-deterministic."""
    n = torch.get_num_threads()
    torch.set_num_threads(1)
    yield
    torch.set_num_threads(n)


def _assert_first_turn_matches_lr_tree(before, after, lr_tree, poly=1.0):
    """Adam's first step moves every element by ~±lr·poly: at step count 1,
    m̂/(√v̂+eps) = g/(|g|+eps) ≈ sign(g), and L2 weight decay makes g nonzero
    even for heads not forwarded this turn. So the per-element |Δ| of turn 1
    reads back the ENTIRE lr tree — the direct check for the
    subtly-wrong-LR-grouping / freeze-mask failure mode that convergence
    floors and drift-tolerant trajectory comparisons cannot catch."""
    lb, la, ll = (jax.tree.leaves(t) for t in (before, after, lr_tree))
    assert len(lb) == len(la) == len(ll) and lb
    for b, a, lr in zip(lb, la, ll):
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        want = np.broadcast_to(np.asarray(lr, np.float64) * poly, d.shape)
        # no element may move more than its lr (catches a too-large group,
        # or any movement at all on lr=0 / frozen slices)
        np.testing.assert_array_less(d, want * 1.02 + 1e-9)
        # and the group's biggest mover must come close to its lr (catches
        # a too-small or zeroed group). Leaves that legitimately don't move
        # are skipped: an unforwarded head's BN bias starts at exactly 0, so
        # its wd-only gradient is 0 too (d == 0 identically).
        top = float(want.max())
        if top > 0 and d[want == top].size >= 4 and float(d.max()) > 0:
            assert d[want == top].max() >= 0.7 * top


@pytest.mark.slow
def test_step2_trajectory_matches_torch_oracle(ref_mod, rng):
    C = 20
    student_t = ref_mod.Net([C, C], nb_tasks=2, cur_task=1)
    teacher_t = ref_mod.Net([C], nb_tasks=1, cur_task=0)
    student_t.train()
    teacher_t.eval()
    _disable_dropout(student_t)
    _disable_dropout(teacher_t)

    s_params, s_bn = convert_state_dict(_np_state_dict(student_t), kind="rap", nb_tasks=2)
    t_params, t_bn = convert_state_dict(_np_state_dict(teacher_t), kind="rap", nb_tasks=1)

    weight = rng.random(C, dtype=np.float32) * 5 + 0.5
    weight[C - 1] = 0.0

    # ---- torch oracle: the reference protocol (SURVEY.md §3.2) ----
    shared, ds = [], []
    for n, p in student_t.named_parameters():
        if "encoder" in n and "parallel_conv" not in n and "bn" not in n:
            shared.append(p)
        elif "decoder.1" in n or (
            "encoder" in n
            and ("bn" in n or "parallel_conv" in n)
            and (".1.weight" in n or ".1.bias" in n)
        ):
            ds.append(p)
    topt = torch.optim.Adam(
        [{"params": shared, "lr": 5e-6}, {"params": ds}],
        5e-4, (0.9, 0.999), eps=1e-8, weight_decay=1e-4,
    )
    sched = torch.optim.lr_scheduler.LambdaLR(topt, lambda e: (1 - (e - 1) / 150) ** 0.9)
    sched.step(1)
    tw = torch.from_numpy(weight.copy())
    kl = torch.nn.KLDivLoss()

    batches = [
        (
            rng.standard_normal((2, 32, 64, 3), dtype=np.float32),
            rng.integers(0, C, size=(2, 32, 64)),
        )
        for _ in range(2)
    ]
    torch_losses = []
    torch_grads_batch1 = None
    for bi, (x, y) in enumerate(batches):
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ty = torch.from_numpy(y)
        out = student_t(tx, 1)
        out_prev = student_t(tx, 0)
        with torch.no_grad():
            out_prev_t = teacher_t(tx, 0)
        ce = torch.nn.NLLLoss(tw)(F.log_softmax(out, dim=1), ty)
        kld = kl(F.softmax(out_prev, dim=1), F.softmax(out_prev_t, dim=1))
        total = ce + 0.1 * kld
        topt.zero_grad()
        total.backward()
        if bi == 0:
            torch_grads_batch1 = {
                n: p.grad.numpy().copy()
                for n, p in student_t.named_parameters()
                if p.grad is not None
            }
        topt.step()
        torch_losses.append((ce.item(), kld.item()))

    # ---- our single jitted step ----
    lr_tree = masks.rap_lr_tree(s_params, current_task=1, shared_lr=5e-6, ds_lr=5e-4)
    step = steps.make_distill_step(
        erfnet_rap.apply,
        current_task=1,
        prev_tasks=(0,),
        class_weight=jnp.asarray(weight),
        lr_tree=lr_tree,
        num_epochs=150,
        lambda_c=0.1,
    )
    ts = steps.init_train_state(s_params, s_bn)
    teacher = steps.ModelState(t_params, t_bn)
    our_losses = []
    for bi, (x, y) in enumerate(batches):
        ts, metrics = step(ts, teacher, jnp.asarray(x), jnp.asarray(y), None, None, 1)
        our_losses.append((float(metrics["ce"]), float(metrics["kld"])))
        if bi == 0:
            # batch 1 reads back the WHOLE rap lr tree elementwise: shared
            # convs at 5e-6, current-task DS columns at 5e-4, frozen task-0
            # DS columns at exactly zero movement
            # (_assert_first_turn_matches_lr_tree docstring)
            _assert_first_turn_matches_lr_tree(s_params, ts.params, lr_tree)

    # batch 1 compares fresh states tightly; batch 2 sees the O(1e-4) param
    # noise from batch 1's Adam step, so its loss tolerance is looser. KLD
    # atol allows for the teacher's eval-mode forward running the
    # space-to-depth downsampler factorization inside the folded train step
    # (same math as conv+maxpool, different fp rounding: observed 1.6e-6
    # drift on a 0.15 KLD).
    np.testing.assert_allclose(our_losses[0][0], torch_losses[0][0], rtol=1e-4)
    np.testing.assert_allclose(our_losses[0][1], torch_losses[0][1], atol=5e-6)
    np.testing.assert_allclose(our_losses[1][0], torch_losses[1][0], rtol=1e-3)
    np.testing.assert_allclose(our_losses[1][1], torch_losses[1][1], atol=2e-5)

    # --- gradient parity on batch 1 (pre-Adam: no sign-noise amplification) ---
    from mdilss_tpu.losses import kld_faithful, weighted_cross_entropy

    def loss_fn(p):
        bn = s_bn
        logits, bn = erfnet_rap.apply(p, bn, jnp.asarray(batches[0][0]), 1, training=True, rng=None)
        ce = weighted_cross_entropy(logits, jnp.asarray(batches[0][1]), jnp.asarray(weight))
        s_log, bn = erfnet_rap.apply(p, bn, jnp.asarray(batches[0][0]), 0, training=True, rng=None)
        t_log, _ = erfnet_rap.apply(t_params, t_bn, jnp.asarray(batches[0][0]), 0, training=False)
        return ce + 0.1 * kld_faithful(s_log, t_log)

    our_grads = jax.grad(loss_fn)(s_params)
    got_grads = export_state_dict(our_grads, s_bn, kind="rap")  # state part ignored
    checked = 0
    for k, tg in torch_grads_batch1.items():
        scale = np.abs(tg).max()
        # This is a *structural* check (missing loss path / wrong weighting /
        # wrong layout shows up as O(1) relative error). Tighter bounds are
        # noise-dominated: through 34 training-mode BN layers, torch's own
        # f32 grads deviate up to ~4% from its f64 grads on ill-conditioned
        # keys (verified offline), so f32-vs-f32 cross-impl agreement cannot
        # be required beyond that. Per-op backward parity is covered at 1e-6
        # by the isolated ops/decoder golden tests. A handful of elements per
        # tensor additionally ride numerical cliffs that flip with the
        # *host's* XLA:CPU codegen (the CI hosts rotate across CPU models;
        # observed: 1-2/12288 elements at ~1.1x this atol), so the criterion
        # is fraction-based: systematic errors move O(all) elements by
        # O(scale), noise moves O(few) by O(atol).
        atol = max(8e-2 * scale, 1e-5)
        diff = np.abs(np.asarray(got_grads[k], np.float32) - tg)
        frac_bad = float((diff > atol).mean())
        assert frac_bad <= 2e-3, (
            f"grad {k}: {frac_bad:.2%} elements exceed atol={atol:.2e} "
            f"(max diff {diff.max():.2e}, scale {scale:.2e})"
        )
        assert float(diff.max()) <= 25e-2 * scale + 1e-5, (
            f"grad {k}: max diff {diff.max():.2e} vs hard cap "
            f"{25e-2 * scale:.2e} (scale {scale:.2e})"
        )
        checked += 1
    assert checked > 300

    # --- parameter trajectory ---
    ref_final = _np_state_dict(student_t)
    got_final = export_state_dict(ts.params, ts.bn, kind="rap")
    initial = export_state_dict(s_params, s_bn, kind="rap")
    for k, v in ref_final.items():
        if "num_batches_tracked" in k:
            continue
        import re

        frozen = (
            k.startswith("decoder.0.")
            or re.search(r"(bn_ini|bns_1|bns_2|parallel_conv_1|parallel_conv_2)\.0\.", k)
        ) and "running" not in k
        if frozen:
            # frozen params must not move a single ULP in either implementation
            np.testing.assert_array_equal(got_final[k], initial[k], err_msg=k)
            np.testing.assert_array_equal(v, initial[k], err_msg=k)
        else:
            # trained params: Adam turns near-zero-grad sign noise into +-lr
            # per step, so the worst-case bound is 2 steps * 2 * 5e-4 (sign
            # flip on both sides) + margin; systematic errors (wrong
            # group/lr/wd) affect most elements, not the noisy ~1%, and are
            # caught by the gradient check above
            np.testing.assert_allclose(got_final[k], v, atol=2.5e-3, err_msg=k)


@pytest.mark.slow
def test_step3_two_phase_trajectory_matches_torch_oracle(ref_mod, rng):
    """Trajectory parity for the faithful step-3 protocol: CE backward+Adam,
    then lambda_c * (KLD_bdd + KLD_cs) backward+Adam against the already-
    updated weights — two optimizer steps per batch with torch-1.x zeroed-grad
    weight-decay semantics (train_new_task_step3.py:317-356). The teacher
    stays in TRAIN mode (batch-stat BN): the reference never calls
    model_old.eval() in step 3 (unlike step 2's :272), so that is the faithful
    semantics and our `teacher_training=True` default."""
    C, C3 = 6, 8
    student_t = ref_mod.Net([C, C, C3], nb_tasks=3, cur_task=2)
    teacher_t = ref_mod.Net([C, C], nb_tasks=2, cur_task=1)
    student_t.train()
    # NO teacher_t.eval(): faithful to the reference's step-3 trainer
    _disable_dropout(student_t)
    _disable_dropout(teacher_t)

    s_params, s_bn = convert_state_dict(_np_state_dict(student_t), kind="rap", nb_tasks=3)
    t_params, t_bn = convert_state_dict(_np_state_dict(teacher_t), kind="rap", nb_tasks=2)

    weight = rng.random(C3, dtype=np.float32) * 5 + 0.5
    weight[C3 - 1] = 0.0

    # ---- torch oracle: two param groups exactly as the reference builds them
    # (train_new_task_step3.py:96-106,260-270) ----
    shared, ds = [], []
    for n, p in student_t.named_parameters():
        if "encoder" in n and "parallel_conv" not in n and "bn" not in n:
            shared.append(p)
        elif "decoder.2" in n or (
            "encoder" in n
            and ("bn" in n or "parallel_conv" in n)
            and (".2.weight" in n or ".2.bias" in n)
        ):
            ds.append(p)
    topt = torch.optim.Adam(
        [{"params": shared, "lr": 5e-6}, {"params": ds}],
        5e-4, (0.9, 0.999), eps=1e-8, weight_decay=1e-4,
    )
    sched = torch.optim.lr_scheduler.LambdaLR(topt, lambda e: (1 - (e - 1) / 150) ** 0.9)
    sched.step(1)
    tw = torch.from_numpy(weight.copy())
    kl = torch.nn.KLDivLoss()

    batches = [
        (
            rng.standard_normal((2, 32, 64, 3), dtype=np.float32),
            rng.integers(0, C3, size=(2, 32, 64)),
        )
        for _ in range(2)
    ]
    torch_losses = []
    for x, y in batches:
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ty = torch.from_numpy(y)
        # phase 1: CE on the current task, backward + step (:327-332)
        out = student_t(tx, 2)
        ce = torch.nn.NLLLoss(tw)(F.log_softmax(out, dim=1), ty)
        # torch-1.x zero_grad() zeroed in place (never set None): emulate so
        # phase-2's step sees ZERO grads + weight decay for the CE-only params
        topt.zero_grad(set_to_none=False)
        ce.backward()
        topt.step()
        # phase 2: summed prev-task KLDs against the updated weights (:335-356)
        out_prev_bdd = student_t(tx, 1)
        out_prev_cs = student_t(tx, 0)
        with torch.no_grad():
            out_prevm_bdd = teacher_t(tx, 1)
            out_prevm_cs = teacher_t(tx, 0)
        kld = kl(F.softmax(out_prev_bdd, dim=1), F.softmax(out_prevm_bdd, dim=1)) + kl(
            F.softmax(out_prev_cs, dim=1), F.softmax(out_prevm_cs, dim=1)
        )
        kd = 0.1 * kld
        topt.zero_grad(set_to_none=False)
        kd.backward()
        topt.step()
        torch_losses.append((ce.item(), kld.item()))

    # ---- our single jitted two-phase step ----
    lr_tree = masks.rap_lr_tree(s_params, current_task=2, shared_lr=5e-6, ds_lr=5e-4)
    step = steps.make_two_phase_distill_step(
        erfnet_rap.apply,
        current_task=2,
        prev_tasks=(1, 0),
        class_weight=jnp.asarray(weight),
        lr_tree=lr_tree,
        num_epochs=150,
        lambda_c=0.1,
    )
    ts = steps.init_train_state(s_params, s_bn)
    teacher = steps.ModelState(t_params, t_bn)
    our_losses = []
    for x, y in batches:
        ts, metrics = step(ts, teacher, jnp.asarray(x), jnp.asarray(y), None, None, 1)
        our_losses.append((float(metrics["ce"]), float(metrics["kld"])))
    assert int(ts.opt.count) == 4  # 2 batches x 2 Adam steps each

    # loss parity per phase per batch (batch 2 sees batch 1's Adam noise)
    np.testing.assert_allclose(our_losses[0][0], torch_losses[0][0], rtol=1e-4)
    np.testing.assert_allclose(our_losses[0][1], torch_losses[0][1], atol=5e-6)
    np.testing.assert_allclose(our_losses[1][0], torch_losses[1][0], rtol=2e-3)
    np.testing.assert_allclose(our_losses[1][1], torch_losses[1][1], atol=5e-5)

    # ---- parameter trajectory ----
    import re

    ref_final = _np_state_dict(student_t)
    got_final = export_state_dict(ts.params, ts.bn, kind="rap")
    initial = export_state_dict(s_params, s_bn, kind="rap")
    n_frozen = n_trained = 0
    for k, v in ref_final.items():
        if "num_batches_tracked" in k:
            continue
        frozen = (
            k.startswith("decoder.0.")
            or k.startswith("decoder.1.")
            or re.search(r"(bn_ini|bns_1|bns_2|parallel_conv_1|parallel_conv_2)\.[01]\.", k)
        ) and "running" not in k
        if frozen:
            # frozen params must not move a single ULP in either implementation
            np.testing.assert_array_equal(got_final[k], initial[k], err_msg=k)
            np.testing.assert_array_equal(v, initial[k], err_msg=k)
            n_frozen += 1
        else:
            # 4 Adam steps of worst-case sign-noise: 4 * 2 * 5e-4 + margin
            np.testing.assert_allclose(got_final[k], v, atol=5e-3, err_msg=k)
            n_trained += 1
    assert n_frozen > 100 and n_trained > 200


@pytest.mark.slow
def test_multitask_trajectory_matches_torch_oracle(rng, torch_single_thread):
    """Round-robin multitask trajectory parity: 2 domains x 2 iterations,
    one Adam step per (iteration, domain) turn with the reference's grouped
    LRs — shared encoder at 5e-4/nb_tasks, all decoders at 5e-4
    (train_multi_task.py:207-218), per-domain weighted CE
    (train_multi_task.py:241-265).

    Oracle grads are pre-seeded to zero (torch-1.x `zero_grad` zeroed in
    place): in steady state every Adam step applies weight decay to BOTH
    decoders, including the one not forwarded this turn — the semantics our
    flattened lr-tree optimizer implements. (The reference's literal first
    iteration differs for one turn only: a never-backwarded decoder has
    `.grad is None` and is skipped until its first turn, a one-off wd-sized
    transient.)"""
    C = (6, 7)
    ref_mt = load_reference_module("models/erfnet_multi_task.py")
    model_t = ref_mt.Net(list(C), nb_tasks=2, cur_task=0)
    model_t.train()
    _disable_dropout(model_t)

    from mdilss_tpu.models import erfnet_multihead

    params, bn = convert_state_dict(_np_state_dict(model_t), kind="multi_task", nb_tasks=2)

    weights = []
    for nc in C:
        w = rng.random(nc, dtype=np.float32) * 5 + 0.5
        w[nc - 1] = 0.0
        weights.append(w)

    # ---- torch oracle: the reference's two param groups ----
    named = list(model_t.named_parameters())
    topt = torch.optim.Adam(
        [{"params": [p for n, p in named if "encoder" in n], "lr": 5e-4 / 2},
         {"params": [p for n, p in named if "decoder" in n]}],
        5e-4, (0.9, 0.999), eps=1e-8, weight_decay=1e-4,
    )
    sched = torch.optim.lr_scheduler.LambdaLR(topt, lambda e: (1 - (e - 1) / 150) ** 0.9)
    sched.step(1)
    for p in model_t.parameters():  # torch-1.x steady-state (see docstring)
        p.grad = torch.zeros_like(p)

    n_iters = 2
    batches = {
        t: [
            (rng.standard_normal((2, 32, 64, 3), dtype=np.float32),
             rng.integers(0, C[t], size=(2, 32, 64)))
            for _ in range(n_iters)
        ]
        for t in range(2)
    }
    torch_losses = []
    for it in range(n_iters):
        for t in range(2):
            x, y = batches[t][it]
            tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            out = model_t(tx, t)
            loss = torch.nn.CrossEntropyLoss(torch.from_numpy(weights[t].copy()))(
                out, torch.from_numpy(y)
            )
            topt.zero_grad(set_to_none=False)
            loss.backward()
            topt.step()
            torch_losses.append(loss.item())

    # ---- our per-domain jitted CE steps over ONE shared train state ----
    lr_tree = masks.multihead_lr_tree(params, encoder_lr=5e-4 / 2, decoder_lr=5e-4)
    dsteps = [
        steps.make_ce_step(
            erfnet_multihead.apply, task=t, class_weight=jnp.asarray(weights[t]),
            lr_tree=lr_tree, num_epochs=150,
        )
        for t in range(2)
    ]
    ts = steps.init_train_state(params, bn)
    our_losses = []
    for it in range(n_iters):
        for t in range(2):
            x, y = batches[t][it]
            ts, m = dsteps[t](ts, jnp.asarray(x), jnp.asarray(y), None, None, 1)
            our_losses.append(float(m["loss"]))
            if it == 0 and t == 0:
                # turn 1 reads back the whole lr tree: encoder 5e-4/2,
                # BOTH decoders 5e-4 (the unforwarded one via wd-only grads)
                _assert_first_turn_matches_lr_tree(params, ts.params, lr_tree)
    assert int(ts.opt.count) == 4  # 2 iters x 2 domains

    # turn-0 compares fresh states tightly (protocol wiring: weighted CE,
    # head selection). Later turns see Adam's first-step sign noise — a
    # near-zero-grad element whose sign differs cross-impl moves +-lr, i.e.
    # 1e-3 per flip — which compounds into O(1%) loss drift; structural
    # errors are caught by turn 0 + the parameter trajectory below.
    np.testing.assert_allclose(our_losses[0], torch_losses[0], rtol=1e-4)
    np.testing.assert_allclose(our_losses[1], torch_losses[1], rtol=5e-3)
    np.testing.assert_allclose(our_losses[2:], torch_losses[2:], rtol=2e-2)

    ref_final = _np_state_dict(model_t)
    got_final = export_state_dict(ts.params, ts.bn, kind="multi_task")
    n_checked = 0
    for k, v in ref_final.items():
        if "num_batches_tracked" in k:
            continue
        if "running" in k:
            # BN running stats track batch ACTIVATION statistics, which
            # amplify the +-lr parameter sign-noise through network depth —
            # measured drift ~0.01 at encoder layer 6 after 4 turns;
            # rtol covers variance entries, whose drift scales with the
            # activation magnitude
            np.testing.assert_allclose(got_final[k], v, rtol=5e-2, atol=3e-2,
                                       err_msg=k)
        else:
            # every param takes 2 Adam steps (its domain turn + the other
            # turn's wd-only update): worst-case sign-noise 4*2*5e-4 + margin
            np.testing.assert_allclose(got_final[k], v, atol=5e-3, err_msg=k)
        n_checked += 1
    assert n_checked > 200


@pytest.mark.slow
def test_ft_trajectory_matches_torch_oracle(rng, torch_single_thread):
    """FT (ftp1) trajectory parity: encoder + new head in the optimizer, old
    head excluded and requires_grad=False (main_ftp1_enc_newbn.py:229-242) —
    so the old head must not move a ULP on either side while encoder/new head
    follow the same Adam(5e-4, wd 1e-4) poly-scheduled trajectory."""
    C_OLD, C_NEW = 6, 8
    ref_ft = load_reference_module("models/erfnet_ftp1.py")
    model_t = ref_ft.Net(C_OLD, C_NEW)
    model_t.train()
    _disable_dropout(model_t)
    for n, p in model_t.named_parameters():
        if "decoder_old" in n:
            p.requires_grad = False

    from mdilss_tpu.models import erfnet_multihead

    params, bn = convert_state_dict(_np_state_dict(model_t), kind="ftp1", nb_tasks=2)

    w = rng.random(C_NEW, dtype=np.float32) * 5 + 0.5
    w[C_NEW - 1] = 0.0

    topt = torch.optim.Adam(
        list(model_t.encoder.parameters()) + list(model_t.decoder_new.parameters()),
        5e-4, (0.9, 0.999), eps=1e-8, weight_decay=1e-4,
    )
    sched = torch.optim.lr_scheduler.LambdaLR(topt, lambda e: (1 - (e - 1) / 150) ** 0.9)
    sched.step(1)

    batches = [
        (rng.standard_normal((2, 32, 64, 3), dtype=np.float32),
         rng.integers(0, C_NEW, size=(2, 32, 64)))
        for _ in range(3)
    ]
    torch_losses = []
    tw = torch.from_numpy(w.copy())
    for x, y in batches:
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        out = model_t(tx)  # decoder_new path (erfnet_ftp1.py:143-149)
        loss = torch.nn.CrossEntropyLoss(tw)(out, torch.from_numpy(y))
        topt.zero_grad(set_to_none=False)
        loss.backward()
        topt.step()
        torch_losses.append(loss.item())

    lr_tree = masks.multihead_lr_tree(params, encoder_lr=5e-4,
                                      decoder_lrs=[0.0, 5e-4])
    step = steps.make_ce_step(
        erfnet_multihead.apply, task=1, class_weight=jnp.asarray(w),
        lr_tree=lr_tree, num_epochs=150,
    )
    ts = steps.init_train_state(params, bn)
    our_losses = []
    for bi, (x, y) in enumerate(batches):
        ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), None, None, 1)
        our_losses.append(float(m["loss"]))
        if bi == 0:
            # batch 1 reads back the lr tree: encoder + new head at 5e-4,
            # old head exactly zero movement
            _assert_first_turn_matches_lr_tree(params, ts.params, lr_tree)

    # batch 1 tight (wiring); later batches carry Adam first-step sign noise
    # (+-lr per flipped near-zero-grad element -> O(1%) loss drift); the
    # parameter trajectory below is the structural check
    np.testing.assert_allclose(our_losses[0], torch_losses[0], rtol=1e-4)
    np.testing.assert_allclose(our_losses[1], torch_losses[1], rtol=5e-3)
    np.testing.assert_allclose(our_losses[2], torch_losses[2], rtol=2e-2)

    ref_final = _np_state_dict(model_t)
    got_final = export_state_dict(ts.params, ts.bn, kind="ftp1")
    initial = export_state_dict(params, bn, kind="ftp1")
    n_frozen = n_trained = 0
    for k, v in ref_final.items():
        if "num_batches_tracked" in k:
            continue
        if "decoder_old" in k and "running" not in k:
            np.testing.assert_array_equal(got_final[k], initial[k], err_msg=k)
            np.testing.assert_array_equal(v, initial[k], err_msg=k)
            n_frozen += 1
        elif "running" in k:
            # BN running stats track batch ACTIVATION statistics, which
            # amplify the +-lr parameter sign-noise through network depth —
            # measured drift ~0.01 at encoder layer 6 after 3 batches.
            # (decoder_old's stats also land here: not forwarded on either
            # side, so they stay at init and match trivially.) rtol
            # covers variance entries, whose drift scales with the
            # activation magnitude.
            np.testing.assert_allclose(got_final[k], v, rtol=5e-2, atol=3e-2,
                                       err_msg=k)
            n_trained += 1
        else:
            # 3 Adam steps of worst-case sign noise: 3 * 2 * 5e-4 + margin
            np.testing.assert_allclose(got_final[k], v, atol=4e-3, err_msg=k)
            n_trained += 1
    assert n_frozen > 10 and n_trained > 100


@pytest.mark.slow
def test_fe_trajectory_matches_torch_oracle(rng, torch_single_thread):
    """FE (feature-extraction) trajectory parity: ONLY decoder_new is in the
    optimizer (main_ftp1_enc_newbn.py:240-242, the `--finetune false` branch);
    decoder_old is requires_grad=False; the encoder's PARAMS never move (not
    in the optimizer — no Adam step, no weight decay) but its BN RUNNING
    STATS still update because the model forwards in train mode ("feature
    extraction but BN of shared encoder gets updated", :242). Our lr_tree
    encodes this as encoder_lr=0 (train/loop.py:283): lr=0 zeroes the update
    AND the wd term (optim.py:103-104) while BN stats flow through apply_fn
    regardless.

    Because the encoder is frozen, its activations are IDENTICAL across
    frameworks every batch (modulo fp rounding), so — unlike the ft oracle —
    encoder BN running stats must match tightly AND must have moved."""
    C_OLD, C_NEW = 6, 8
    ref_ft = load_reference_module("models/erfnet_ftp1.py")
    model_t = ref_ft.Net(C_OLD, C_NEW)
    model_t.train()
    _disable_dropout(model_t)
    for n, p in model_t.named_parameters():
        if "decoder_old" in n:
            p.requires_grad = False

    from mdilss_tpu.models import erfnet_multihead

    params, bn = convert_state_dict(_np_state_dict(model_t), kind="ftp1", nb_tasks=2)

    w = rng.random(C_NEW, dtype=np.float32) * 5 + 0.5
    w[C_NEW - 1] = 0.0

    topt = torch.optim.Adam(
        model_t.decoder_new.parameters(),
        5e-4, (0.9, 0.999), eps=1e-8, weight_decay=1e-4,
    )
    sched = torch.optim.lr_scheduler.LambdaLR(topt, lambda e: (1 - (e - 1) / 150) ** 0.9)
    sched.step(1)

    batches = [
        (rng.standard_normal((2, 32, 64, 3), dtype=np.float32),
         rng.integers(0, C_NEW, size=(2, 32, 64)))
        for _ in range(3)
    ]
    torch_losses = []
    tw = torch.from_numpy(w.copy())
    for x, y in batches:
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        out = model_t(tx)  # decoder_new path (erfnet_ftp1.py:143-149)
        loss = torch.nn.CrossEntropyLoss(tw)(out, torch.from_numpy(y))
        topt.zero_grad(set_to_none=False)
        loss.backward()
        topt.step()
        torch_losses.append(loss.item())

    lr_tree = masks.multihead_lr_tree(params, encoder_lr=0.0,
                                      decoder_lrs=[0.0, 5e-4])
    step = steps.make_ce_step(
        erfnet_multihead.apply, task=1, class_weight=jnp.asarray(w),
        lr_tree=lr_tree, num_epochs=150,
    )
    ts = steps.init_train_state(params, bn)
    our_losses = []
    for bi, (x, y) in enumerate(batches):
        ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), None, None, 1)
        our_losses.append(float(m["loss"]))
        if bi == 0:
            # batch 1 reads back the lr tree: ONLY the new head at 5e-4,
            # encoder and old head exactly zero movement
            _assert_first_turn_matches_lr_tree(params, ts.params, lr_tree)

    # frozen encoder -> the new head sees the same features every batch on
    # both sides, so losses track tighter than the ft oracle's
    np.testing.assert_allclose(our_losses[0], torch_losses[0], rtol=1e-4)
    np.testing.assert_allclose(our_losses[1], torch_losses[1], rtol=2e-3)
    np.testing.assert_allclose(our_losses[2], torch_losses[2], rtol=5e-3)

    ref_final = _np_state_dict(model_t)
    got_final = export_state_dict(ts.params, ts.bn, kind="ftp1")
    initial = export_state_dict(params, bn, kind="ftp1")
    n_frozen = n_trained = n_bn_moved = 0
    for k, v in ref_final.items():
        if "num_batches_tracked" in k:
            continue
        if "running" in k:
            if "encoder" in k:
                # identical activations -> tight stats parity; and they MUST
                # have moved (the :242 semantics a freeze-mask bug would kill)
                np.testing.assert_allclose(got_final[k], v, rtol=2e-3,
                                           atol=1e-5, err_msg=k)
                if not np.array_equal(np.asarray(got_final[k]), initial[k]):
                    n_bn_moved += 1
            else:
                # decoder BN stats: the new head's params move between
                # batches (Adam sign noise), so its activation stats drift
                # like the ft oracle's — same loose tolerance; the old
                # head's stats stay at init and match trivially
                np.testing.assert_allclose(got_final[k], v, rtol=5e-2,
                                           atol=3e-2, err_msg=k)
        elif "decoder_new" in k:
            # 3 Adam steps of worst-case sign noise: 3 * 2 * 5e-4 + margin
            np.testing.assert_allclose(got_final[k], v, atol=4e-3, err_msg=k)
            n_trained += 1
        else:
            # encoder AND old head: bit-frozen on both sides
            np.testing.assert_array_equal(got_final[k], initial[k], err_msg=k)
            np.testing.assert_array_equal(v, initial[k], err_msg=k)
            n_frozen += 1
    assert n_frozen > 100 and n_trained > 10 and n_bn_moved > 20


@pytest.mark.slow
def test_step1_trajectory_matches_torch_oracle(ref_mod, rng, torch_single_thread):
    """Step-1 trajectory parity: the RAP net trained from scratch on the
    first domain — ONE Adam group over all parameters at 5e-4 with
    weight_decay 1e-4 and the poly LambdaLR (train_RAPFT_step1.py:260-265),
    plain weighted CE (CrossEntropyLoss2d, train_RAPFT_step1.py:89-94,303).
    With this, every protocol with a reference trainer
    (step1/step2/step3/multitask/ft/fe) has a trajectory oracle."""
    C = 6
    model_t = ref_mod.Net([C], nb_tasks=1, cur_task=0)
    model_t.train()
    _disable_dropout(model_t)

    params, bn = convert_state_dict(_np_state_dict(model_t), kind="rap", nb_tasks=1)

    w = rng.random(C, dtype=np.float32) * 5 + 0.5
    w[C - 1] = 0.0

    topt = torch.optim.Adam(model_t.parameters(), 5e-4, (0.9, 0.999),
                            eps=1e-8, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.LambdaLR(topt, lambda e: (1 - (e - 1) / 150) ** 0.9)
    sched.step(1)

    batches = [
        (rng.standard_normal((2, 32, 64, 3), dtype=np.float32),
         rng.integers(0, C, size=(2, 32, 64)))
        for _ in range(3)
    ]
    torch_losses = []
    tw = torch.from_numpy(w.copy())
    for x, y in batches:
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        out = model_t(tx, 0)
        loss = torch.nn.CrossEntropyLoss(tw)(out, torch.from_numpy(y))
        topt.zero_grad(set_to_none=False)
        loss.backward()
        topt.step()
        torch_losses.append(loss.item())

    # step1's single param group == every leaf of the rap tree at 5e-4
    # (train/loop.py builds exactly this: rap_lr_tree with shared==ds lr)
    lr_tree = masks.rap_lr_tree(params, current_task=0, shared_lr=5e-4, ds_lr=5e-4)
    step = steps.make_ce_step(
        erfnet_rap.apply, task=0, class_weight=jnp.asarray(w),
        lr_tree=lr_tree, num_epochs=150,
    )
    ts = steps.init_train_state(params, bn)
    our_losses = []
    for bi, (x, y) in enumerate(batches):
        ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), None, None, 1)
        our_losses.append(float(m["loss"]))
        if bi == 0:
            # batch 1 reads back the whole tree: EVERY leaf at 5e-4
            _assert_first_turn_matches_lr_tree(params, ts.params, lr_tree)

    # batch 1 tight (wiring); later batches carry Adam first-step sign noise
    np.testing.assert_allclose(our_losses[0], torch_losses[0], rtol=1e-4)
    np.testing.assert_allclose(our_losses[1], torch_losses[1], rtol=5e-3)
    np.testing.assert_allclose(our_losses[2], torch_losses[2], rtol=2e-2)

    ref_final = _np_state_dict(model_t)
    got_final = export_state_dict(ts.params, ts.bn, kind="rap")
    n_checked = 0
    for k, v in ref_final.items():
        if "num_batches_tracked" in k:
            continue
        if "running" in k:
            # BN running stats amplify +-lr sign noise through depth
            np.testing.assert_allclose(got_final[k], v, rtol=5e-2, atol=3e-2,
                                       err_msg=k)
        else:
            # 3 Adam steps of worst-case sign noise: 3 * 2 * 5e-4 + margin
            np.testing.assert_allclose(got_final[k], v, atol=4e-3, err_msg=k)
        n_checked += 1
    assert n_checked > 200


def test_distill_step_freeze_semantics(ref_mod):
    """Old-task DS slices and old decoders never move; shared + current move."""
    key = jax.random.key(0)
    params, bn = erfnet_rap.init(key, [6, 6], 2)
    lr_tree = masks.rap_lr_tree(params, current_task=1, shared_lr=5e-6, ds_lr=5e-4)
    w = jnp.ones(6).at[5].set(0.0)
    step = steps.make_distill_step(
        erfnet_rap.apply, current_task=1, prev_tasks=(0,),
        class_weight=w, lr_tree=lr_tree, num_epochs=10,
    )
    tparams, tbn = erfnet_rap.init(jax.random.key(1), [6], 1)
    teacher = steps.ModelState(tparams, tbn)
    ts = steps.init_train_state(params, bn)
    x = jax.random.normal(jax.random.key(2), (2, 32, 64, 3))
    y = jax.random.randint(jax.random.key(3), (2, 32, 64), 0, 6)
    ts2, metrics = jax.jit(step, static_argnames=())(ts, teacher, x, y, None, jax.random.key(4), 1)

    blk = params["encoder"]["group64"]  # stacked RAP blocks, leaves [5, T, ...]
    blk2 = ts2.params["encoder"]["group64"]
    # frozen task-0 slices unchanged
    np.testing.assert_array_equal(np.asarray(blk2["rap1"]["w"][:, 0]), np.asarray(blk["rap1"]["w"][:, 0]))
    np.testing.assert_array_equal(
        np.asarray(blk2["bns1"]["scale"][:, 0]), np.asarray(blk["bns1"]["scale"][:, 0])
    )
    # current task-1 slices moved
    assert not np.allclose(np.asarray(blk2["rap1"]["w"][:, 1]), np.asarray(blk["rap1"]["w"][:, 1]))
    # shared convs moved
    assert not np.allclose(np.asarray(blk2["conv3x1_1"]["w"]), np.asarray(blk["conv3x1_1"]["w"]))
    # old decoder frozen, current decoder moved
    old_out = params["decoders"][0]["output_conv"]["w"]
    np.testing.assert_array_equal(np.asarray(ts2.params["decoders"][0]["output_conv"]["w"]), np.asarray(old_out))
    assert not np.allclose(
        np.asarray(ts2.params["decoders"][1]["output_conv"]["w"]),
        np.asarray(params["decoders"][1]["output_conv"]["w"]),
    )
    # teacher BN state was not mutated (eval mode)
    np.testing.assert_array_equal(
        np.asarray(teacher.bn["encoder"]["initial"]["bn"].mean), np.asarray(tbn["encoder"]["initial"]["bn"].mean)
    )


def test_ce_step_loss_decreases():
    params, bn = erfnet_rap.init(jax.random.key(0), [6], 1)
    lr_tree = masks.rap_lr_tree(params, current_task=0, shared_lr=5e-4, ds_lr=5e-4)
    w = jnp.ones(6).at[5].set(0.0)
    step = jax.jit(steps.make_ce_step(
        erfnet_rap.apply, task=0, class_weight=w, lr_tree=lr_tree, num_epochs=150
    ))
    ts = steps.init_train_state(params, bn)
    x = jax.random.normal(jax.random.key(1), (2, 32, 64, 3))
    y = jax.random.randint(jax.random.key(2), (2, 32, 64), 0, 5)
    losses = []
    for i in range(8):
        ts, m = step(ts, x, y, None, jax.random.key(10 + i), 1)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.02, losses


def test_folded_input_parity():
    """The hoisted space-to-depth fold (steps._fold_images ->
    apply(input_folded=True)) is numerically identical to handing the raw
    batch to each forward — the fold is data movement only."""
    from mdilss_tpu.models.blocks import fold_input

    params, bn = erfnet_rap.init(jax.random.key(0), [6, 6], 2)
    x = jax.random.normal(jax.random.key(1), (2, 32, 64, 3))
    xf = fold_input(x)
    assert xf.shape == (2, 16, 32, 12)

    # training-mode forward: both routes use the s2d downsampler -> bit-equal
    raw, _ = erfnet_rap.apply(params, bn, x, 1, training=True, rng=None)
    fold, _ = erfnet_rap.apply(params, bn, xf, 1, training=True, rng=None,
                               input_folded=True)
    np.testing.assert_array_equal(np.asarray(raw), np.asarray(fold))

    # eval-mode forward (the teacher inside a folded train step): the folded
    # route takes the s2d form where the raw route uses conv+maxpool —
    # same math, fp-level tolerance
    raw_e, _ = erfnet_rap.apply(params, bn, x, 0, training=False)
    fold_e, _ = erfnet_rap.apply(params, bn, xf, 0, training=False,
                                 input_folded=True)
    np.testing.assert_allclose(np.asarray(raw_e), np.asarray(fold_e),
                               atol=2e-4, rtol=1e-4)


def test_two_phase_step_applies_two_optimizer_updates():
    params, bn = erfnet_rap.init(jax.random.key(0), [6, 6, 8], 3)
    lr_tree = masks.rap_lr_tree(params, current_task=2, shared_lr=5e-6, ds_lr=5e-4)
    w = jnp.ones(8).at[7].set(0.0)
    step = steps.make_two_phase_distill_step(
        erfnet_rap.apply, current_task=2, prev_tasks=(1, 0),
        class_weight=w, lr_tree=lr_tree, num_epochs=10,
    )
    tp, tb = erfnet_rap.init(jax.random.key(1), [6, 6], 2)
    ts = steps.init_train_state(params, bn)
    x = jax.random.normal(jax.random.key(2), (1, 32, 64, 3))
    y = jax.random.randint(jax.random.key(3), (1, 32, 64), 0, 8)
    ts2, m = jax.jit(step)(ts, steps.ModelState(tp, tb), x, y, None, jax.random.key(4), 1)
    assert int(ts2.opt.count) == 2  # two Adam applications per batch (faithful)
    assert np.isfinite(float(m["loss"]))


def test_teacher_dropout_step_semantics():
    """teacher_dropout: the teacher's KD forwards get their own masks (list
    slots after the student's). The noise must reach ONLY the KD phase — the
    CE phase's loss is teacher-independent — and the step stays deterministic
    in the masks. teacher_training=False + teacher_dropout is contradictory
    (dropout is train-mode behavior) and must be rejected at build time."""
    from mdilss_tpu.models.topology import make_dropout_masks

    params, bn = erfnet_rap.init(jax.random.key(0), [6, 6, 8], 3)
    lr_tree = masks.rap_lr_tree(params, current_task=2, shared_lr=5e-6, ds_lr=5e-4)
    w = jnp.ones(8).at[7].set(0.0)
    common = dict(current_task=2, prev_tasks=(1, 0), class_weight=w,
                  lr_tree=lr_tree, num_epochs=10)
    step_plain = steps.make_two_phase_distill_step(erfnet_rap.apply, **common)
    step_tdrop = steps.make_two_phase_distill_step(
        erfnet_rap.apply, teacher_dropout=True, **common)

    tp, tb = erfnet_rap.init(jax.random.key(1), [6, 6], 2)
    teacher = steps.ModelState(tp, tb)
    x = jax.random.normal(jax.random.key(2), (2, 32, 64, 3))
    y = jax.random.randint(jax.random.key(3), (2, 32, 64), 0, 8)
    r = np.random.default_rng(0)
    student_masks = [make_dropout_masks(r, 2) for _ in range(3)]
    tm1 = [make_dropout_masks(r, 2) for _ in range(2)]
    tm2 = [make_dropout_masks(r, 2) for _ in range(2)]

    ts = steps.init_train_state(params, bn)
    _, m_plain = jax.jit(step_plain)(ts, teacher, x, y, student_masks, None, 1)
    ts = steps.init_train_state(params, bn)
    _, m_t1 = jax.jit(step_tdrop)(ts, teacher, x, y, student_masks + tm1, None, 1)
    ts = steps.init_train_state(params, bn)
    _, m_t1b = jax.jit(step_tdrop)(ts, teacher, x, y, student_masks + tm1, None, 1)
    ts = steps.init_train_state(params, bn)
    _, m_t2 = jax.jit(step_tdrop)(ts, teacher, x, y, student_masks + tm2, None, 1)

    # CE phase never sees the teacher: identical across all variants
    assert float(m_plain["ce"]) == float(m_t1["ce"]) == float(m_t2["ce"])
    # the teacher noise reaches the KD target...
    assert float(m_t1["kld"]) != float(m_plain["kld"])
    assert float(m_t1["kld"]) != float(m_t2["kld"])
    # ...deterministically in the masks
    assert float(m_t1["kld"]) == float(m_t1b["kld"])

    with pytest.raises(ValueError, match="teacher_training"):
        steps.make_two_phase_distill_step(
            erfnet_rap.apply, teacher_dropout=True, teacher_training=False,
            **common)


def test_teacher_dropout_config_requires_two_phase():
    from mdilss_tpu import config as C

    with pytest.raises(ValueError, match="two-phase"):
        C.step3(two_phase=False, teacher_dropout=True)
    assert C.step3(teacher_dropout=True).teacher_dropout is True
