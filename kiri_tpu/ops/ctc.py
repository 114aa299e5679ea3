"""CTC ops: greedy decode, confidence, and forward-algorithm alignment score.

All paths are batched and jit-friendly (fixed shapes, ``lax.scan`` over time)
— the reference computes the forward algorithm with a per-cell Python loop
(reference: kiri_ocr/model.py:641-661, "HOT LOOP #3" in SURVEY §3.1); here it
is a [S]-wide vectorized recurrence scanned over T, shared by the alignment
scorer and the training loss.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def greedy_ctc_stats(logits: jnp.ndarray, ctc_offset: int = 2):
    """Per-row argmax ids, mean-max-prob confidence and estimated length.

    logits: [N, T, C] f32.
    Returns (best_ids [N,T] int32, confidence [N] f32, est_len [N] int32).

    Parity with reference ``compute_ctc_confidence``
    (kiri_ocr/model.py:343-373): confidence averages the per-frame max
    probability over *all* frames; length counts transitions to a new
    non-special id.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    best_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    confidence = jnp.mean(jnp.max(probs, axis=-1), axis=-1)
    prev = jnp.concatenate([jnp.full_like(best_ids[:, :1], -1), best_ids[:, :-1]], axis=1)
    is_new_char = (best_ids != prev) & (best_ids >= ctc_offset)
    est_len = jnp.sum(is_new_char, axis=-1).astype(jnp.int32)
    return best_ids, confidence, est_len


def _ctc_forward_ll(log_probs: jnp.ndarray, labels: jnp.ndarray,
                    label_lens: jnp.ndarray, blank_id: int,
                    logit_lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Shared CTC forward recurrence over the blank-interleaved state lattice.

    log_probs:  [N, T, C] log-softmaxed frames
    labels:     [N, Lmax] CTC-space ids (padding beyond label_lens ignored)
    label_lens: [N]
    logit_lens: optional [N]; frames at/after a row's length leave its alpha
                untouched (used by the loss; the scorer consumes all frames).

    Returns [N] log p(labels | frames): logsumexp over the two terminal
    alpha states (final blank / final label). Rows with zero labels get the
    all-blank path likelihood.
    """
    n, t, c = log_probs.shape
    lmax = labels.shape[1]
    s_max = 2 * lmax + 1

    s_idx = jnp.arange(s_max)
    is_label_pos = (s_idx % 2) == 1
    label_idx = jnp.clip((s_idx - 1) // 2, 0, lmax - 1)
    # ext[s]: blank at even s, labels[(s-1)/2] at odd s.
    ext = jnp.where(is_label_pos[None, :], labels[:, label_idx], blank_id)  # [N,S]
    # Skip-transition allowed at odd s>1 when labels[k] != labels[k-1].
    prev_label_idx = jnp.clip(label_idx - 1, 0, lmax - 1)
    diff_prev = labels[:, label_idx] != labels[:, prev_label_idx]
    can_skip = is_label_pos[None, :] & (s_idx[None, :] > 1) & diff_prev
    # Valid alpha states: s < 2*len+1.
    valid_s = s_idx[None, :] < (2 * label_lens[:, None] + 1)

    emit0 = jnp.take_along_axis(log_probs[:, 0], ext, axis=-1)  # [N,S]
    alpha0 = jnp.full((n, s_max), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit0[:, 0])
    if s_max > 1:
        alpha0 = alpha0.at[:, 1].set(emit0[:, 1])
    alpha0 = jnp.where(valid_s, alpha0, NEG_INF)

    def shift1(a):
        return jnp.concatenate([jnp.full((n, 1), NEG_INF), a[:, :-1]], axis=1)

    def step(alpha, xs):
        lp_t, t_i = xs
        emit = jnp.take_along_axis(lp_t, ext, axis=-1)
        stay = alpha
        from1 = shift1(alpha)
        from2 = jnp.where(can_skip, shift1(shift1(alpha)), NEG_INF)
        new_alpha = jax.scipy.special.logsumexp(
            jnp.stack([stay, from1, from2], axis=0), axis=0) + emit
        new_alpha = jnp.where(valid_s, new_alpha, NEG_INF)
        if logit_lens is not None:
            active = (t_i < logit_lens)[:, None]
            new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, None

    ts = jnp.arange(1, t)
    alpha_final, _ = jax.lax.scan(
        step, alpha0, (jnp.swapaxes(log_probs, 0, 1)[1:], ts))

    # Terminal states: S-1 and S-2 for S = 2*len+1.
    s_last = 2 * label_lens  # index of final blank
    a_last = jnp.take_along_axis(alpha_final, s_last[:, None], axis=1)[:, 0]
    s_pen = jnp.maximum(s_last - 1, 0)
    a_pen = jnp.take_along_axis(alpha_final, s_pen[:, None], axis=1)[:, 0]
    a_pen = jnp.where(label_lens > 0, a_pen, NEG_INF)
    return jnp.logaddexp(a_last, a_pen)


@partial(jax.jit, static_argnames=("blank_id",))
def ctc_alignment_scores(log_probs: jnp.ndarray, labels: jnp.ndarray,
                         label_lens: jnp.ndarray, blank_id: int = 0) -> jnp.ndarray:
    """Length-normalized CTC forward scores for padded label batches.

    log_probs:  [N, T, C] log-softmaxed CTC frames
    labels:     [N, Lmax] CTC-space ids (padding ignored beyond label_lens)
    label_lens: [N] number of valid labels per row

    Returns [N] scores:  logsumexp over the two terminal alpha states divided
    by max(1, label_len); rows with zero labels get the mean all-blank path
    score — exactly the reference semantics (kiri_ocr/model.py:603-668).
    """
    ll = _ctc_forward_ll(log_probs, labels, label_lens, blank_id)
    # Empty-label rows: mean blank log-prob over frames.
    blank_score = jnp.mean(log_probs[:, :, blank_id], axis=-1)
    return jnp.where(label_lens > 0,
                     ll / jnp.maximum(1, label_lens),
                     blank_score)


def ctc_loss(logits: jnp.ndarray, logit_lens: jnp.ndarray, labels: jnp.ndarray,
             label_lens: jnp.ndarray, blank_id: int = 0) -> jnp.ndarray:
    """Batched CTC negative log-likelihood (mean over batch), fixed shapes.

    logits:     [B, T, C] raw (un-normalized)
    logit_lens: [B] valid frame counts
    labels:     [B, Lmax] CTC-space ids
    label_lens: [B]

    Equivalent role to torch ``nn.CTCLoss(blank=0, zero_infinity=True)``
    (reference: kiri_ocr/training.py:620-630): the same forward recurrence as
    ``ctc_alignment_scores`` with frames beyond ``logit_lens`` masked,
    returning -log p(labels).
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = _ctc_forward_ll(log_probs, labels, label_lens, blank_id,
                         logit_lens=logit_lens)
    nll = -ll
    # zero_infinity=True semantics: infeasible alignments contribute 0.
    nll = jnp.where(jnp.isfinite(ll) & (ll > NEG_INF / 2), nll, 0.0)
    # torch reduction='mean': per-sample loss divided by its target length,
    # then averaged. Empty-target rows are masked out entirely (the reference
    # filters them before calling CTCLoss, training.py:758-777).
    nll = nll / jnp.maximum(1, label_lens)
    nll = jnp.where(label_lens > 0, nll, 0.0)
    denom = jnp.maximum(1, jnp.sum(label_lens > 0))
    return jnp.sum(nll) / denom
