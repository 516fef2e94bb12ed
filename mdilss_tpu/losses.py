"""Loss functions: weighted pixel cross-entropy and the distillation KLD.

Semantics pinned to the reference (SURVEY.md §2.3):

  * `weighted_cross_entropy` == CrossEntropyLoss2d, i.e.
    NLLLoss2d(weight)(log_softmax(outputs), targets) with 'mean' reduction —
    the weighted mean  sum_i w[y_i] * nll_i / sum_i w[y_i]
    (train_RAPFT_step1.py:89-97). The ignore class carries weight 0, so it
    contributes to neither numerator nor denominator.

  * `kld_faithful` reproduces the reference's literal (and unusual) formula:
    torch.nn.KLDivLoss()(softmax(student), softmax(teacher)) — probabilities,
    NOT log-probabilities, are passed as the input argument
    (train_new_task_step2.py:296-297), deviating from KLDivLoss's log-input
    contract. Expanded, with input p_s and target p_t:
        mean over all elements of  p_t * (log p_t - p_s)
    ('mean' reduction divides by the total element count B*C*H*W, torch's
    pre-'batchmean' default). This is what produced the paper numbers; it is
    the default for parity.

  * `kld_corrected` is the mathematically-intended distillation loss
    (input = log-probs): mean of p_t * (log p_t - log p_s).

All functions take NHWC logits (class axis last — TPU-native); targets are
[N, H, W] int32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_cross_entropy(logits: jax.Array, targets: jax.Array, weight: jax.Array) -> jax.Array:
    """Weighted pixel CE. logits [N,H,W,C] float, targets [N,H,W] int, weight [C].

    Implemented with a one-hot mask instead of take_along_axis/table-gather:
    gathers along the lane (class) axis are an order of magnitude slower on
    TPU than a compare+select+reduce over the same lanes.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    c = logits.shape[-1]
    classes = jax.lax.broadcasted_iota(jnp.int32, logp.shape, logp.ndim - 1)
    onehot = classes == targets[..., None]
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    wvec = jnp.asarray(weight, jnp.float32)
    w = jnp.sum(jnp.where(onehot, wvec, 0.0), axis=-1)
    return jnp.sum(w * nll) / jnp.sum(w)


def _xlogy(x: jax.Array, y: jax.Array) -> jax.Array:
    """x * log(y) with the torch convention 0 * log(0) = 0."""
    return jnp.where(x == 0.0, 0.0, x * jnp.log(jnp.where(y == 0.0, 1.0, y)))


def kld_faithful(student_logits: jax.Array, teacher_logits: jax.Array) -> jax.Array:
    """Reference-exact KLD: KLDivLoss()(softmax(student), softmax(teacher))."""
    p_s = jax.nn.softmax(student_logits.astype(jnp.float32), axis=-1)
    p_t = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    elt = _xlogy(p_t, p_t) - p_t * p_s
    return jnp.mean(elt)


def kld_corrected(student_logits: jax.Array, teacher_logits: jax.Array) -> jax.Array:
    """Proper KL(p_t || p_s) with log-prob input, 'mean'-style reduction."""
    logp_s = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    p_t = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    elt = _xlogy(p_t, p_t) - p_t * logp_s
    return jnp.mean(elt)
