"""Autoregressive decoding (greedy / beam) as dense, jit-compiled TPU programs.

The reference implements beam search as a Python loop over steps with a list
of variable-length beams, re-running the full decoder on every prefix with no
KV cache (reference: kiri_ocr/model.py:390-600 — "HOT LOOP #2" in SURVEY).
Here the whole search is one ``lax.while_loop``:

* beam state is dense: tokens [N, K, L], scores [N, K], lengths, finished
* the decoder runs one KV-cached step per iteration for all N*K rows
* penalties (EOS bias, AAA / AB-AB / A-B-A-B / ABC-ABC repeats, <unk>) are
  vectorized scatter-adds — bit-parity with the reference penalty stack
  (kiri_ocr/model.py:487-534)
* pruning uses the reference length-normalized score
  ``score / (((5+L)^p)/((5+1)^p))`` and final ranking adds the CTC
  forward-algorithm alignment score (kiri_ocr/model.py:549-574)

Shapes are static per (N, K, L_cap) triple; the pipeline buckets batch sizes
and decode lengths so only a handful of programs ever compile.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import recognizer as R
from .ctc import ctc_alignment_scores, greedy_ctc_stats

NEG_INF = -1e30


class DecodeOut(NamedTuple):
    """Device results of a batched decode (host decodes text from tokens)."""
    tokens: jnp.ndarray        # [N, L_buf] best-beam token ids (incl. bos/eos)
    lengths: jnp.ndarray       # [N] total tokens incl. bos (and eos if emitted)
    dec_conf: jnp.ndarray      # [N] exp(mean step logp) of best beam
    final_conf: jnp.ndarray    # [N] 0.6*dec + 0.4*ctc (reference mix)
    ctc_conf: jnp.ndarray      # [N]
    # History buffers (all-zero unless record_history=True):
    hist_tokens: jnp.ndarray   # [N, S, L_buf] best-beam snapshot per step
    hist_len: jnp.ndarray      # [N, S]
    hist_score: jnp.ndarray    # [N, S] cumulative score of best beam
    hist_finished: jnp.ndarray  # [N, S] bool
    hist_steps: jnp.ndarray    # [N] number of executed steps per line
    hist_extra: jnp.ndarray    # [N, S, 2] greedy-mode (raw prob, token id)
    converged: Optional[jnp.ndarray] = None  # [N] bool; None = always (loops
    # run to completion; spec_decode sets False past its round budget)


def _gather_last(tokens: jnp.ndarray, t, back: int) -> jnp.ndarray:
    """tokens[..., t-back] with clipping (invalid when t < back; callers gate)."""
    idx = jnp.maximum(t - back, 0)
    return jnp.take_along_axis(
        tokens, jnp.broadcast_to(idx, tokens.shape[:-1] + (1,)), axis=-1)[..., 0]


def apply_penalties(logp: jnp.ndarray, tokens: jnp.ndarray, t, cfg,
                    target_len: jnp.ndarray, eos_id: int, unk_dec_id: int) -> jnp.ndarray:
    """Vectorized reference penalty stack (kiri_ocr/model.py:487-534).

    logp:       [R, V] fused log-probs for the next token
    tokens:     [R, L] generated prefix (tokens[.., t] is the newest)
    t:          current step (all alive rows have seq length t+1, cur_len=t)
    target_len: [R] CTC length estimate (0 = unavailable)
    """
    rows = jnp.arange(logp.shape[0])
    n = t + 1  # len(seq)

    # --- A. EOS bias (no-op with default 0.0 biases; kept for parity) ---
    if cfg.EOS_LOGP_BIAS != 0.0 or cfg.EOS_LOGP_BOOST != 0.0:
        has_tl = target_len > 0
        min_len = jnp.minimum(cfg.EOS_BIAS_UNTIL_LEN,
                              jnp.maximum(1, (target_len.astype(jnp.float32) * 0.5).astype(jnp.int32)))
        bias = jnp.where(
            has_tl,
            jnp.where(t < min_len, -cfg.EOS_LOGP_BIAS,
                      jnp.where(t >= target_len, cfg.EOS_LOGP_BOOST, 0.0)),
            jnp.where(t < cfg.EOS_BIAS_UNTIL_LEN, -cfg.EOS_LOGP_BIAS, 0.0),
        )
        logp = logp.at[rows, eos_id].add(bias)

    s1 = _gather_last(tokens, t, 0)
    s2 = _gather_last(tokens, t, 1)
    s3 = _gather_last(tokens, t, 2)
    s4 = _gather_last(tokens, t, 3)
    s5 = _gather_last(tokens, t, 4)
    s6 = _gather_last(tokens, t, 5)

    # --- B1. exact repeat AAA ---
    c1 = (n >= 4) & (s1 == s2) & (s2 == s3)
    logp = logp.at[rows, s1].add(-cfg.REPEAT_LAST_PENALTY * c1)

    # --- B2. bigram repeat AB-AB ---
    big = (n >= 4) & (s2 == s4) & (s1 == s3)
    logp = logp.at[rows, s1].add(-cfg.REPEAT_BIGRAM_PENALTY * big)
    logp = logp.at[rows, s2].add(-cfg.REPEAT_BIGRAM_PENALTY * big)

    # --- B3. interrupted repeat A-B-A-B (same condition; reference
    #         double-penalizes s[-1] — kept bit-for-bit) ---
    aba = (n >= 3) & (s1 == s3) & (n >= 4) & (s2 == s4)
    logp = logp.at[rows, s1].add(-cfg.REPEAT_BIGRAM_PENALTY * aba)

    # --- B4. trigram repeat ABC-ABC ---
    tri = (n >= 6) & (s3 == s6) & (s2 == s5) & (s1 == s4)
    logp = logp.at[rows, s1].add(-cfg.REPEAT_TRIGRAM_PENALTY * tri)
    logp = logp.at[rows, s2].add(-cfg.REPEAT_TRIGRAM_PENALTY * tri)
    logp = logp.at[rows, s3].add(-cfg.REPEAT_TRIGRAM_PENALTY * tri)

    # --- C. <unk> penalty ---
    logp = logp.at[:, unk_dec_id].add(-cfg.UNK_LOGP_PENALTY)
    return logp


def apply_penalties_seq(logp: jnp.ndarray, tokens: jnp.ndarray, cfg,
                        target_len: jnp.ndarray, eos_id: int,
                        unk_dec_id: int) -> jnp.ndarray:
    """``apply_penalties`` vectorized over every position of a sequence.

    logp:   [N, L, V] fused next-token log-probs; logp[:, p] predicts the
            token at sequence position p+1 (step t = p)
    tokens: [N, L] the prefix buffer; tokens[:, p] is the newest token of
            step p's prefix
    Per position p this reproduces ``apply_penalties(logp_p, tokens, t=p)``
    bit-for-bit (reference penalty stack: kiri_ocr/model.py:487-534),
    including the A-B-A-B double-penalize quirk.
    """
    nrow, lbuf, _ = logp.shape
    pos = jnp.arange(lbuf)[None, :]                     # t at each position
    n = pos + 1                                         # len(seq) at step t
    rows = jnp.broadcast_to(jnp.arange(nrow)[:, None], (nrow, lbuf))
    cols = jnp.broadcast_to(pos, (nrow, lbuf))

    if cfg.EOS_LOGP_BIAS != 0.0 or cfg.EOS_LOGP_BOOST != 0.0:
        tl = target_len[:, None]
        has_tl = tl > 0
        min_len = jnp.minimum(
            cfg.EOS_BIAS_UNTIL_LEN,
            jnp.maximum(1, (tl.astype(jnp.float32) * 0.5).astype(jnp.int32)))
        bias = jnp.where(
            has_tl,
            jnp.where(pos < min_len, -cfg.EOS_LOGP_BIAS,
                      jnp.where(pos >= tl, cfg.EOS_LOGP_BOOST, 0.0)),
            jnp.where(pos < cfg.EOS_BIAS_UNTIL_LEN, -cfg.EOS_LOGP_BIAS, 0.0))
        logp = logp.at[:, :, eos_id].add(bias)

    def back(k):  # tokens[:, p-k] clipped at 0 (callers gate via n)
        idx = jnp.maximum(pos - k, 0)
        return jnp.take_along_axis(tokens, jnp.broadcast_to(idx, (nrow, lbuf)),
                                   axis=1)

    s1, s2, s3 = back(0), back(1), back(2)
    s4, s5, s6 = back(3), back(4), back(5)

    c1 = (n >= 4) & (s1 == s2) & (s2 == s3)
    logp = logp.at[rows, cols, s1].add(-cfg.REPEAT_LAST_PENALTY * c1)

    big = (n >= 4) & (s2 == s4) & (s1 == s3)
    logp = logp.at[rows, cols, s1].add(-cfg.REPEAT_BIGRAM_PENALTY * big)
    logp = logp.at[rows, cols, s2].add(-cfg.REPEAT_BIGRAM_PENALTY * big)

    aba = (n >= 3) & (s1 == s3) & (n >= 4) & (s2 == s4)
    logp = logp.at[rows, cols, s1].add(-cfg.REPEAT_BIGRAM_PENALTY * aba)

    tri = (n >= 6) & (s3 == s6) & (s2 == s5) & (s1 == s4)
    logp = logp.at[rows, cols, s1].add(-cfg.REPEAT_TRIGRAM_PENALTY * tri)
    logp = logp.at[rows, cols, s2].add(-cfg.REPEAT_TRIGRAM_PENALTY * tri)
    logp = logp.at[rows, cols, s3].add(-cfg.REPEAT_TRIGRAM_PENALTY * tri)

    logp = logp.at[:, :, unk_dec_id].add(-cfg.UNK_LOGP_PENALTY)
    return logp


def _fused_logp(dec_logits, lm_logits, cfg):
    logp = jax.nn.log_softmax(dec_logits, axis=-1)
    if lm_logits is not None and cfg.USE_LM and cfg.USE_LM_FUSION_EVAL:
        logp = logp + cfg.LM_FUSION_ALPHA * jax.nn.log_softmax(lm_logits, axis=-1)
    return logp


def max_decode_steps(cfg, target_len: jnp.ndarray, mem_len: int) -> jnp.ndarray:
    """Per-line step budget (reference: kiri_ocr/model.py:408-425)."""
    with_tl = jnp.minimum(
        cfg.MAX_DEC_LEN,
        (target_len.astype(jnp.float32) * cfg.DEC_MAX_LEN_RATIO).astype(jnp.int32)
        + cfg.DEC_MAX_LEN_PAD)
    without = min(cfg.MAX_DEC_LEN, int(mem_len * cfg.MEM_MAX_LEN_RATIO) + cfg.DEC_MAX_LEN_PAD)
    return jnp.where(target_len > 0, with_tl, without)


def _labels_from_tokens(tokens: jnp.ndarray, lengths: jnp.ndarray,
                        eos_id: int, dec_offset: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense decoder sequences -> compacted CTC label rows.

    Keeps ids >= dec_offset at positions [1, length) (drops bos/pad/eos),
    maps dec id -> ctc id (= id - 1 for chars given offsets 3 vs 2), and
    left-compacts (reference: kiri_ocr/model.py:613-621).
    """
    r, lbuf = tokens.shape
    pos = jnp.arange(lbuf)[None, :]
    keep = (pos >= 1) & (pos < lengths[:, None]) & (tokens >= dec_offset)
    dest = jnp.cumsum(keep, axis=1) - 1
    dest = jnp.where(keep, dest, lbuf)  # dropped entries go out of bounds
    labels = jnp.zeros((r, lbuf), jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(r)[:, None], (r, lbuf))
    labels = labels.at[rows, dest].set(jnp.where(keep, tokens - 1, 0), mode="drop")
    lens = jnp.sum(keep, axis=1).astype(jnp.int32)
    return labels, lens


# ==========================================================================
# Beam search
# ==========================================================================
def _beam_step(variables, cross_kvs, step_beams, fused_head, fused_qkv,
               target_len, max_steps, t, tokens, scores, lengths, finished,
               cache, steps_done, *, cfg, eos_id, unk_dec_id,
               opt_identity_skip=True, anc=None):
    """One beam-search step for all N lines (shared by the one-shot
    ``beam_search`` while_loop and the resumable ``beam_stream_window``).

    Returns the updated (tokens, scores, lengths, finished, cache,
    steps_done, line_active, anc); lines past their step budget or with
    every beam finished are frozen bit-for-bit.

    anc: optional [N, K, l_buf] ancestry table (permute-free beam mode —
    layers.decoder_step_layer). When given, the KV cache is never
    reordered; the table rows are permuted by beam parent instead (tiny),
    replacing the whole-cache gather's read+write HBM traffic with nothing.
    """
    n, K, l_buf = tokens.shape
    line_active = (t < max_steps) & ~jnp.all(finished, axis=1)  # [N]

    cur_tok = jnp.take_along_axis(
        tokens, jnp.broadcast_to(jnp.maximum(lengths - 1, 0)[..., None],
                                 (n, K, 1)), axis=2)[..., 0]
    if anc is not None:
        # Stamp slot t with each row's own index before the step: the new
        # K/V lands in row k, so beam k's step-t ancestor is k (until the
        # post-step parent permute below rewrites it).
        anc = jax.lax.dynamic_update_slice(
            anc, jnp.broadcast_to(jnp.arange(K, dtype=anc.dtype)[None, :, None],
                                  (n, K, 1)), (0, 0, t))
    dec_logits, lm_logits, cache = R.decoder_step(
        variables, cur_tok.reshape(n * K), t, cache, cross_kvs, cfg,
        beams=step_beams, fused_head=fused_head, fused_qkv=fused_qkv,
        anc=anc)
    logp = _fused_logp(dec_logits, lm_logits, cfg)         # [N*K, V]
    tl_rep = jnp.repeat(target_len, K)
    logp = apply_penalties(logp, tokens.reshape(n * K, l_buf), t, cfg,
                           tl_rep, eos_id, unk_dec_id)
    v = logp.shape[-1]
    logp = logp.reshape(n, K, v)

    topv, topi = jax.lax.top_k(logp, K)                    # [N, K, K]

    # Candidate pool per line: K parents x K expansions.
    # Finished parents contribute themselves once (slot 0) and -inf dummies.
    exp_scores = scores[..., None] + topv                  # [N, K, K]
    parent_fin = finished[..., None]                       # [N, K, 1]
    self_slot = (jnp.arange(K) == 0)[None, None, :]
    cand_scores = jnp.where(
        parent_fin, jnp.where(self_slot, scores[..., None], NEG_INF), exp_scores)
    cand_scores = jnp.maximum(cand_scores, NEG_INF)
    cand_len = jnp.broadcast_to(
        jnp.where(parent_fin, lengths[..., None], lengths[..., None] + 1),
        (n, K, K))
    cand_fin = jnp.where(parent_fin, True, topi == eos_id)
    cand_tok = jnp.where(parent_fin, 0, topi)

    def norm_penalty(L):
        Lf = jnp.maximum(1, L).astype(jnp.float32)
        return ((5.0 + Lf) ** cfg.BEAM_LENP) / ((5.0 + 1.0) ** cfg.BEAM_LENP)

    normed = cand_scores / norm_penalty(cand_len - 1)
    flat = lambda x: x.reshape(n, K * K)
    sel_normed, sel_idx = jax.lax.top_k(flat(normed), K)   # [N, K]
    parent = sel_idx // K

    def g(x):  # gather candidate field by flat index
        return jnp.take_along_axis(flat(x), sel_idx, axis=1)

    new_scores = g(cand_scores)
    new_lengths = g(cand_len)
    new_finished = g(cand_fin)
    new_tok_ids = g(cand_tok)

    parent_tokens = jnp.take_along_axis(tokens, parent[..., None], axis=1)
    write_pos = jnp.take_along_axis(lengths, parent, axis=1)  # parent length
    was_fin = jnp.take_along_axis(finished, parent, axis=1)
    rowsN = jnp.broadcast_to(jnp.arange(n)[:, None], (n, K))
    rowsK = jnp.broadcast_to(jnp.arange(K)[None, :], (n, K))
    new_tokens = parent_tokens.at[rowsN, rowsK, write_pos].set(
        jnp.where(was_fin, parent_tokens[rowsN, rowsK, jnp.minimum(write_pos, l_buf - 1)],
                  new_tok_ids))

    if anc is not None:
        # Permute-free mode: the cache rows stay where they were written;
        # only the ancestry table follows the parents. Row k's new step-t
        # K/V was computed for pre-reorder beam k (cur_tok above), so after
        # reordering, beam k's slot-t ancestor is ``parent`` — which is
        # exactly what permuting the (self-stamped) table rows produces.
        anc = jnp.take_along_axis(
            anc, jnp.broadcast_to(parent[:, :, None], anc.shape), axis=1)
    else:
        # Reorder KV cache rows to follow their parents. (Measured note:
        # gating the gather to only-written length segments via lax.cond
        # is bit-identical but SLOWER on TPU — the per-segment concatenate
        # rebuilds the full buffer anyway; the plain whole-buffer gather
        # wins.) opt_identity_skip wraps the gather in a scalar cond that
        # skips it when the parent permutation is the identity.
        flat_parent = (rowsN * K + parent).reshape(-1)
        if opt_identity_skip:
            is_identity = jnp.all(flat_parent == jnp.arange(n * K))
            cache = jax.lax.cond(
                is_identity, lambda c: c, lambda c: c[:, flat_parent], cache)
        else:
            cache = cache[:, flat_parent]

    # Freeze lines that are done (keep previous state).
    la = line_active[:, None]
    tokens = jnp.where(la[..., None], new_tokens, tokens)
    scores = jnp.where(la, new_scores, scores)
    lengths = jnp.where(la, new_lengths, lengths)
    finished = jnp.where(la, new_finished, finished)
    steps_done = steps_done + line_active.astype(jnp.int32)
    return (tokens, scores, lengths, finished, cache, steps_done,
            line_active, anc)


def _stream_best(cfg, tokens, scores, lengths, finished):
    """Best-hypothesis snapshot under the reference STREAMING ordering —
    plain L^p length normalization (kiri_ocr/model.py:1112-1115), not the
    ((5+L)^p/6^p) pruning norm. Returns (tokens, len, score, finished) of
    the per-line best beam."""
    stream_norm = scores / (
        jnp.maximum(1, lengths - 1).astype(jnp.float32) ** cfg.BEAM_LENP)
    best_slot = jnp.argmax(stream_norm, axis=1)
    bt = jnp.take_along_axis(tokens, best_slot[:, None, None], axis=1)[:, 0]
    bl = jnp.take_along_axis(lengths, best_slot[:, None], axis=1)[:, 0]
    bs = jnp.take_along_axis(scores, best_slot[:, None], axis=1)[:, 0]
    bf = jnp.take_along_axis(finished, best_slot[:, None], axis=1)[:, 0]
    return bt, bl, bs, bf


@partial(jax.jit, static_argnames=("cfg", "k_beam", "l_cap", "record_history",
                                   "eos_id", "unk_dec_id", "dec_offset", "bos_id",
                                   "opt_shared_kv", "opt_fused_head",
                                   "opt_identity_skip", "opt_fused_qkv",
                                   "opt_unroll", "opt_cache_segments",
                                   "opt_ancestry"))
def beam_search(variables: Dict[str, Any], mem_proj: jnp.ndarray,
                ctc_logits: Optional[jnp.ndarray], target_len: jnp.ndarray,
                ctc_conf: jnp.ndarray, *, cfg, k_beam: int, l_cap: int,
                record_history: bool = False, eos_id: int = 2,
                unk_dec_id: int = 3, dec_offset: int = 3, bos_id: int = 1,
                opt_shared_kv: bool = True, opt_fused_head: bool = True,
                opt_identity_skip: bool = True,
                opt_fused_qkv: bool = True, opt_unroll: int = 1,
                opt_cache_segments: int = 3,
                opt_ancestry: bool = True) -> DecodeOut:
    """Batched beam search over N lines with K beams each.

    mem_proj:   [N, T, Ddec] projected encoder memory
    ctc_logits: [N, T, C] or None — used for length estimation upstream and
                final fusion rescoring here
    target_len: [N] int32 CTC length estimates (0 = none)
    l_cap:      static decode-step budget (bucketed MAX over max_steps)
    opt_*:      static kernel-variant switches; defaults are the measured
                winners (scripts/profile_beam.py on the v5e, 128 lines,
                l_cap 64: baseline 1005 l/s; +shared_kv 1064; +identity
                skip 1197; all three 1297 l/s)
    opt_unroll: static count of beam steps per while_loop iteration.
                Bit-identical to 1 (the per-line freeze in _beam_step makes
                overshoot sub-steps no-ops, tests/test_beam_unroll.py); >1
                amortizes per-iteration loop overhead at the cost of up to
                unroll-1 wasted tail sub-steps.
    opt_ancestry: permute-free beam mode (K > 1 only). The KV cache is
                never reordered by beam parent; a [N, K, l_buf] ancestry
                table is permuted instead (layers.decoder_step_layer
                ``anc``), removing the per-step whole-cache gather — the
                read+write half of the loop's cache-sized HBM traffic.
                Same candidate math; the only numeric caveat is the V
                contraction's (j, t) reduction order vs (t,), which can
                differ in the last ulp (text/score parity is asserted by
                tests/test_beam_unroll.py::test_ancestry_parity).
    opt_cache_segments: static number of KV-cache growth segments. The
                dominant per-step HBM traffic is cache-sized (the self-attn
                K/V read and the beam parent-permute gather both touch the
                WHOLE [L, N*K, l_buf, 2, H, hd] buffer), yet step t only
                ever reads positions <= t. With S>1 the loop runs as S
                sequential while_loops over doubling cache buffers
                (l_buf/2^(S-1), ..., l_buf), zero-padding the cache between
                segments, so early steps touch a fraction of the buffer.
                Bit-identical to S=1: the causal mask zeroes never-written
                slots in the f32 softmax either way, and permuting
                all-zero tail rows yields the same zeros
                (tests/test_beam_unroll.py::test_cache_segments_parity).
    """
    n, t_mem, _ = mem_proj.shape
    K = k_beam
    l_buf = l_cap + 2
    dtype = R.compute_dtype(cfg)

    max_steps = jnp.minimum(max_decode_steps(cfg, target_len, t_mem), l_cap)

    # Cross-attention K/V computed once per LINE and shared across its K
    # beams inside the step (layers.decoder_step_layer beams>1 path) — the
    # repeated-[N*K] layout would re-read the memory K/V K times per step,
    # the dominant HBM traffic of the loop.
    if opt_shared_kv:
        cross_kvs = R.decode_prepare(variables, mem_proj, cfg)
        step_beams = K
    else:
        cross_kvs = R.decode_prepare(variables,
                                     jnp.repeat(mem_proj, K, axis=0), cfg)
        step_beams = 1
    fused_head = (R.fuse_output_heads(variables["params"])
                  if opt_fused_head else None)
    fused_qkv = R.fuse_self_qkv(variables["params"]) if opt_fused_qkv else None

    # Cache growth schedule: doubling windows ending at l_buf (smallest
    # window >= 16 so tiny segments don't fragment the loop).
    windows = [l_buf]
    for _ in range(max(0, opt_cache_segments - 1)):
        nxt = (windows[0] + 1) // 2
        if nxt < 16:
            break
        windows.insert(0, nxt)
    cache = R.init_decode_cache(cfg, n * K, windows[0])

    tokens0 = jnp.zeros((n, K, l_buf), jnp.int32).at[:, :, 0].set(bos_id)
    scores0 = jnp.full((n, K), NEG_INF).at[:, 0].set(0.0)
    lengths0 = jnp.ones((n, K), jnp.int32)
    finished0 = jnp.zeros((n, K), bool)
    use_anc = opt_ancestry and K > 1
    anc0 = (jnp.zeros((n, K, l_buf), jnp.int32) if use_anc
            else jnp.zeros((), jnp.int32))

    hist_shape = (n, l_cap if record_history else 1, l_buf)
    hist = {
        "tokens": jnp.zeros(hist_shape, jnp.int32),
        "len": jnp.zeros(hist_shape[:2], jnp.int32),
        "score": jnp.zeros(hist_shape[:2], jnp.float32),
        "fin": jnp.zeros(hist_shape[:2], bool),
        "extra": jnp.zeros(hist_shape[:2] + (2,), jnp.float32),
    }

    def make_cond(t_limit):
        def cond(state):
            (t, tokens, scores, lengths, finished, cache, hist, steps_done,
             anc) = state
            line_active = (t < max_steps) & ~jnp.all(finished, axis=1)
            alive = jnp.any(line_active)
            if t_limit is not None:
                # With unroll > 1, entering the loop runs sub-steps
                # t .. t+unroll-1, each writing cache position tj — all must
                # fit this segment's buffer (tail steps run next segment).
                alive &= t + opt_unroll <= t_limit
            return alive
        return cond

    def body(state):
        (t, tokens, scores, lengths, finished, cache, hist, steps_done,
         anc) = state
        for j in range(opt_unroll):
            tj = t + j
            (tokens, scores, lengths, finished, cache, steps_done,
             line_active, anc_new) = _beam_step(
                variables, cross_kvs, step_beams, fused_head, fused_qkv,
                target_len, max_steps, tj, tokens, scores, lengths, finished,
                cache, steps_done, cfg=cfg, eos_id=eos_id,
                unk_dec_id=unk_dec_id, opt_identity_skip=opt_identity_skip,
                anc=anc if use_anc else None)
            if use_anc:
                anc = anc_new

            if record_history:
                bt, bl, bs, bf = _stream_best(cfg, tokens, scores, lengths,
                                              finished)
                w = jnp.minimum(tj, hist["tokens"].shape[1] - 1)
                hist = {
                    "tokens": hist["tokens"].at[:, w].set(
                        jnp.where(line_active[:, None], bt, hist["tokens"][:, w])),
                    "len": hist["len"].at[:, w].set(jnp.where(line_active, bl, hist["len"][:, w])),
                    "score": hist["score"].at[:, w].set(jnp.where(line_active, bs, hist["score"][:, w])),
                    "fin": hist["fin"].at[:, w].set(jnp.where(line_active, bf, hist["fin"][:, w])),
                    "extra": hist["extra"],
                }

        return (t + opt_unroll, tokens, scores, lengths, finished, cache,
                hist, steps_done, anc)

    steps_done0 = jnp.zeros((n,), jnp.int32)
    state = (jnp.asarray(0, jnp.int32), tokens0, scores0, lengths0, finished0,
             cache, hist, steps_done0, anc0)
    for si, w_seg in enumerate(windows):
        last = si == len(windows) - 1
        state = jax.lax.while_loop(make_cond(None if last else w_seg),
                                   body, state)
        if not last:
            (t, tokens, scores, lengths, finished, cache, hist, steps_done,
             anc) = state
            cache = jnp.pad(cache, ((0, 0), (0, 0),
                                    (0, windows[si + 1] - w_seg),
                                    (0, 0), (0, 0), (0, 0)))
            state = (t, tokens, scores, lengths, finished, cache, hist,
                     steps_done, anc)
    (_, tokens, scores, lengths, finished, cache, hist, steps_done,
     _) = state

    # ---------- final scoring with CTC fusion (kiri_ocr/model.py:561-598) ----
    L = jnp.maximum(1, lengths - 1).astype(jnp.float32)
    dec_score = scores / (L ** cfg.BEAM_LENP)
    dec_conf = jnp.where(lengths > 1, jnp.exp(scores / L), 0.0)
    dec_conf = jnp.clip(dec_conf, 0.0, 1.0)

    if ctc_logits is not None and cfg.CTC_FUSION_ALPHA > 0:
        log_probs = jax.nn.log_softmax(ctc_logits, axis=-1)
        lp_rep = jnp.repeat(log_probs, K, axis=0)
        labels, lab_lens = _labels_from_tokens(
            tokens.reshape(n * K, l_buf), lengths.reshape(-1), eos_id, dec_offset)
        ctc_scores = ctc_alignment_scores(lp_rep, labels, lab_lens).reshape(n, K)
        combined = dec_score + cfg.CTC_FUSION_ALPHA * ctc_scores
    else:
        combined = dec_score

    best = jnp.argmax(combined, axis=1)
    take = lambda x: jnp.take_along_axis(x, best[:, None], axis=1)[:, 0]
    best_tokens = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    best_len = take(lengths)
    best_dec_conf = take(dec_conf)
    if ctc_logits is not None:
        final_conf = 0.6 * best_dec_conf + 0.4 * ctc_conf
    else:
        final_conf = best_dec_conf

    return DecodeOut(best_tokens, best_len, best_dec_conf, final_conf, ctc_conf,
                     hist["tokens"], hist["len"], hist["score"], hist["fin"],
                     steps_done, hist["extra"])


# ==========================================================================
# Speculative decode (CTC-drafted) for the single-hypothesis AR paths
# ==========================================================================
@partial(jax.jit, static_argnames=("cfg", "l_cap", "eos_id", "unk_dec_id",
                                   "dec_offset", "bos_id", "raw_select",
                                   "max_rounds"))
def spec_decode(variables: Dict[str, Any], mem_proj: jnp.ndarray,
                ctc_ids: Optional[jnp.ndarray], target_len: jnp.ndarray,
                ctc_conf: Optional[jnp.ndarray], *, cfg, l_cap: int,
                eos_id: int = 2, unk_dec_id: int = 3, dec_offset: int = 3,
                bos_id: int = 1, raw_select: bool = False,
                max_rounds: int = 0,
                ctc_logits: Optional[jnp.ndarray] = None) -> DecodeOut:
    """Speculative AR decode: the greedy-CTC transcript drafts the output and
    whole-suffix teacher-forced passes verify it.

    Output-equivalent to the sequential single-hypothesis decoders — the
    chosen token at every step is a deterministic function of the prefix, so
    verifying a proposal against the per-position argmax reproduces the step
    loop exactly (this mirrors classic speculative decoding with the CTC head
    as the free draft model; the reference itself recomputes full-prefix
    logits every step, kiri_ocr/model.py:459-479, so the teacher-forced
    verification pass matches the reference computation pattern too):

    * round: one ``decoder_forward_heads`` pass over the current proposal
      (accepted prefix + remaining CTC draft) -> fused+penalized logp at
      every position -> accept the longest prefix where the per-step choice
      equals the proposal, then append the model's choice at the first
      divergence (a substitution keeps the rest of the draft aligned, so the
      next round usually accepts everything).
    * every round accepts >= 1 token per active row, so the loop terminates
      in <= l_cap rounds; typical lines converge in 1-2 rounds + 1 final
      no-op verification, vs one KV-cached dispatch per character.

    Selection parity targets (both preserved bit-for-bit):
    * raw_select=False — "decoder"/accurate mode, i.e. beam search with
      BEAM=1 (reference core.py:560-568): choice = argmax of fused+penalized
      logp; score accumulates the chosen penalized logp.
    * raw_select=True — greedy streaming (reference model.py:779-946):
      choice = argmax of RAW dec logits (the reference quirk — penalties/LM
      fusion affect only the recorded logp); hist_extra carries
      (raw prob, token id) per step for the streaming chunk schema.

    ctc_ids: [N, T] per-frame greedy CTC argmax ids (ctc id-space), or None
             for a blank draft (the loop then degrades to one full-attention
             pass per token, still exact).
    max_rounds: 0 = run to completion. >0 bounds the worst case (a garbage
             draft advances ~1 token per full-attention round): rows still
             unfinished after the budget return ``converged=False`` and the
             caller re-decodes them with the step loop (engine fallback) —
             typical batches converge in 1-2 rounds and never trigger it.
    ctc_logits: [N, T, C] raw CTC frames. When given (and not raw_select,
             and cfg.CTC_FUSION_ALPHA > 0), the final output is a TWO-
             candidate CTC-fused rescore — the accepted AR transcript vs
             the CTC draft itself — scored exactly like beam's final fusion
             (length-normalized decoder logp + alpha * ctc_alignment_scores).
             The draft's decoder score is free: round 1 already teacher-
             forces every draft position. This closes most of the greedy-AR
             vs beam CER gap (the AR head's errors are single-char slips the
             CTC head doesn't make) at zero extra decoder passes. Rows where
             both candidates agree (the common case: the loop accepted the
             whole draft) are unaffected. Omit for the pure step-loop-
             equivalent output.
    """
    n, t_mem, _ = mem_proj.shape
    l_buf = l_cap + 2

    max_steps = jnp.minimum(max_decode_steps(cfg, target_len, t_mem), l_cap)

    # ---- CTC draft -> decoder-space proposal (dedup, drop blanks/pad) ----
    # Collapse rule parity (reference model.py:109-124): skip a frame equal
    # to the previous frame (blanks included in "previous"), then skip
    # blank/pad ids. ctc id -> dec id is +1 (offsets 2 vs 3, tokenizer.py).
    tokens0 = jnp.zeros((n, l_buf), jnp.int32).at[:, 0].set(bos_id)
    if ctc_ids is not None:
        prev = jnp.concatenate(
            [jnp.full((n, 1), -1, ctc_ids.dtype), ctc_ids[:, :-1]], axis=1)
        keep = (ctc_ids != prev) & (ctc_ids >= dec_offset - 1)
        dest = jnp.cumsum(keep, axis=1)          # bos sits at 0; drafts at 1..
        dest = jnp.where(keep & (dest < l_buf), dest, l_buf)
        rowsT = jnp.broadcast_to(jnp.arange(n)[:, None], ctc_ids.shape)
        tokens0 = tokens0.at[rowsT, dest].set(
            (ctc_ids + 1).astype(jnp.int32), mode="drop")
        draft_len = jnp.minimum(jnp.sum(keep, axis=1), l_buf - 1)
    else:
        draft_len = jnp.zeros((n,), jnp.int32)
    prop_len0 = 1 + draft_len.astype(jnp.int32)

    acc_len0 = jnp.ones((n,), jnp.int32)
    score0 = jnp.zeros((n,), jnp.float32)
    finished0 = jnp.zeros((n,), bool)
    hist_prob0 = jnp.zeros((n, l_buf), jnp.float32)
    draft_score0 = jnp.full((n,), NEG_INF, jnp.float32)

    rescore = (ctc_logits is not None and not raw_select
               and cfg.CTC_FUSION_ALPHA > 0 and ctc_ids is not None)

    pos = jnp.arange(l_buf)[None, :]
    rowsN = jnp.arange(n)

    def cond(state):
        (rounds, tokens, prop_len, acc_len, score, finished, hist_prob,
         draft_score) = state
        alive = jnp.any(~finished & (acc_len - 1 < max_steps))
        if max_rounds > 0:
            alive &= rounds < max_rounds
        return alive

    def body(state):
        (rounds, tokens, prop_len, acc_len, score, finished, hist_prob,
         draft_score) = state
        active = ~finished & (acc_len - 1 < max_steps)

        dec_logits, lm_logits = R.decoder_forward_heads(
            variables, mem_proj, tokens, cfg)
        logp = _fused_logp(dec_logits, lm_logits, cfg)
        logp = apply_penalties_seq(logp, tokens, cfg, target_len,
                                   eos_id, unk_dec_id)
        if raw_select:
            chosen = jnp.argmax(dec_logits, axis=-1).astype(jnp.int32)
            chosen_prob = jnp.max(jax.nn.softmax(dec_logits, axis=-1), axis=-1)
        else:
            chosen = jnp.argmax(logp, axis=-1).astype(jnp.int32)
            chosen_prob = jnp.zeros(chosen.shape, jnp.float32)
        chosen_logp = jnp.take_along_axis(logp, chosen[..., None],
                                          axis=-1)[..., 0]

        # Accept while the choice matches the proposed next token; stop at
        # the first divergence / end of proposal / step budget and append
        # the model's own choice there.
        prop_next = jnp.concatenate(
            [tokens[:, 1:], jnp.zeros((n, 1), jnp.int32)], axis=1)

        if rescore:
            # Round 1's proposal IS the CTC draft, teacher-forced at every
            # position: its sequential-decode score (penalized logp of each
            # draft token, plus eos after the full draft) is read off here
            # for the final two-candidate fusion rescore.
            tok_logp = jnp.take_along_axis(
                logp, prop_next[..., None], axis=-1)[..., 0]
            pm = pos + 1 < prop_len[:, None]
            eos_pos = jnp.maximum(prop_len - 1, 0)[:, None]
            eos_lp = jnp.take_along_axis(logp[..., eos_id], eos_pos,
                                         axis=1)[:, 0]
            dsum = jnp.sum(jnp.where(pm, tok_logp, 0.0), axis=1) + eos_lp
            draft_score = jnp.where(rounds == 0, dsum, draft_score)
        good = ((pos + 1 < prop_len[:, None]) & (pos < max_steps[:, None])
                & (chosen == prop_next))
        bad = (pos >= (acc_len - 1)[:, None]) & ~good
        p_stop = jnp.argmax(bad, axis=1).astype(jnp.int32)
        can_append = p_stop < max_steps
        corr = jnp.take_along_axis(chosen, p_stop[:, None], axis=1)[:, 0]

        new_acc_len = jnp.where(active,
                                p_stop + 1 + can_append.astype(jnp.int32),
                                acc_len)
        stepm = ((pos >= (acc_len - 1)[:, None])
                 & (pos < (new_acc_len - 1)[:, None]))
        new_score = jnp.where(
            active, score + jnp.sum(jnp.where(stepm, chosen_logp, 0.0), axis=1),
            score)

        wr = active & can_append
        wpos = jnp.minimum(p_stop + 1, l_buf - 1)
        old_at = jnp.take_along_axis(tokens, wpos[:, None], axis=1)[:, 0]
        tokens = tokens.at[rowsN, wpos].set(jnp.where(wr, corr, old_at))
        new_finished = jnp.where(wr, corr == eos_id, finished)
        # Substitution splice: the draft tail after the corrected position
        # stays proposed as-is, so prop_len only grows.
        new_prop_len = jnp.where(active,
                                 jnp.maximum(prop_len, new_acc_len), prop_len)
        new_hist = jnp.where(active[:, None], chosen_prob, hist_prob)
        return (rounds + 1, tokens, new_prop_len, new_acc_len, new_score,
                new_finished, new_hist, draft_score)

    _, tokens, prop_len, acc_len, score, finished, hist_prob, draft_score = \
        jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), tokens0, prop_len0,
                         acc_len0, score0, finished0, hist_prob0,
                         draft_score0))
    converged = finished | (acc_len - 1 >= max_steps)

    if rescore:
        # Two-candidate CTC-fused selection, same formula as beam's final
        # rescoring (dec logp / L^BEAM_LENP + alpha * ctc_alignment): A = the
        # accepted AR transcript, B = the CTC draft with eos appended. B is
        # considered only where the loop converged (unconverged rows go to
        # the caller's step-loop fallback) and the draft fits the budget.
        log_probs = jax.nn.log_softmax(ctc_logits, axis=-1)
        labels_a, lens_a = _labels_from_tokens(tokens, acc_len, eos_id,
                                               dec_offset)
        align_a = ctc_alignment_scores(log_probs, labels_a, lens_a)
        tokens_b = tokens0.at[rowsN, jnp.minimum(prop_len0, l_buf - 1)].set(
            eos_id)
        len_b = jnp.minimum(prop_len0 + 1, l_buf)
        labels_b, lens_b = _labels_from_tokens(tokens_b, len_b, eos_id,
                                               dec_offset)
        align_b = ctc_alignment_scores(log_probs, labels_b, lens_b)
        l_a = jnp.maximum(1, acc_len - 1).astype(jnp.float32)
        l_bn = jnp.maximum(1, len_b - 1).astype(jnp.float32)
        comb_a = score / (l_a ** cfg.BEAM_LENP) + cfg.CTC_FUSION_ALPHA * align_a
        comb_b = (draft_score / (l_bn ** cfg.BEAM_LENP)
                  + cfg.CTC_FUSION_ALPHA * align_b)
        use_b = ((comb_b > comb_a) & (prop_len0 > 1) & converged
                 & (prop_len0 - 1 <= max_steps))
        tokens = jnp.where(use_b[:, None], tokens_b, tokens)
        acc_len = jnp.where(use_b, len_b, acc_len)
        score = jnp.where(use_b, draft_score, score)

    L = jnp.maximum(1, acc_len - 1).astype(jnp.float32)
    dec_conf = jnp.clip(jnp.where(acc_len > 1, jnp.exp(score / L), 0.0),
                        0.0, 1.0)
    if ctc_conf is not None:
        final_conf = 0.6 * dec_conf + 0.4 * ctc_conf
        ctc_conf_out = ctc_conf
    else:
        final_conf = dec_conf
        ctc_conf_out = jnp.zeros((n,))
    # Greedy-streaming history: step s = prediction at position s -> token
    # written at position s+1. All accepted prefixes are re-verified by the
    # final round with identical logits, so the last round's stats are valid
    # for every step.
    hist_extra = jnp.stack(
        [hist_prob[:, :l_cap],
         tokens[:, 1:l_cap + 1].astype(jnp.float32)], axis=-1)
    z2 = jnp.zeros((n, 1, l_buf), jnp.int32)
    return DecodeOut(tokens, acc_len, dec_conf, final_conf, ctc_conf_out,
                     z2, jnp.zeros((n, 1), jnp.int32), jnp.zeros((n, 1)),
                     jnp.zeros((n, 1), bool),
                     (acc_len - 1).astype(jnp.int32), hist_extra, converged)


# ==========================================================================
# Certificate-gated speculative beam (CTC-drafted, provably beam-identical)
# ==========================================================================
@partial(jax.jit, static_argnames=("cfg", "k_beam", "l_cap", "eos_id",
                                   "unk_dec_id", "dec_offset"))
def beam_spec_certificate(variables: Dict[str, Any], mem_proj: jnp.ndarray,
                          ctc_logits: Optional[jnp.ndarray],
                          target_len: jnp.ndarray, tokens: jnp.ndarray,
                          lengths: jnp.ndarray, *, cfg, k_beam: int,
                          l_cap: int, eos_id: int = 2, unk_dec_id: int = 3,
                          dec_offset: int = 3) -> jnp.ndarray:
    """Certify, per line, that ``beam_search(k_beam)`` would return exactly
    the single-hypothesis (K=1) transcript ``tokens``.

    Speculative beam = ``spec_decode`` (CTC-drafted greedy, ~2 parallel
    passes) + this ONE extra teacher-forced pass + real ``beam_search`` only
    on the lines where the certificate fails. The reference has no analogue
    (its beam always walks every step, kiri_ocr/model.py:390-600); on TPU
    the step loop is latency-bound, so replacing it with parallel passes on
    certified lines is the big beam-throughput lever.

    Soundness argument (all quantities from one ``decoder_forward_heads``
    pass over ``tokens`` = the greedy path g, with the same fused+penalized
    log-probs ``_beam_step`` uses):

    * Every per-step score contribution in ``_beam_step`` is <= 0
      (log-softmax terms, LM fusion alpha*log-softmax, subtractive
      penalties) provided ``EOS_LOGP_BOOST == 0`` and
      ``EOS_LOGP_BIAS >= 0`` — the certificate is statically disabled
      otherwise (callers fall back to real beam).
    * Any beam hypothesis h != g first diverges from g at some step t' with
      a runner-up token v (one of the K-1 non-argmax ``top_k`` slots —
      ``_beam_step`` never expands beyond top-K per parent). Its cumulative
      score at ANY later step is <= D(t', v) = S(t') + logp_{t'}[v], where
      S is g's prefix score sum; descendants of a branch inherit the bound.
    * Pruning (condition A): ``_beam_step`` ranks candidates by
      score / norm_penalty(len - 1).  Unfinished candidates at step t all
      share g's length, finished ones froze earlier with a smaller length;
      for negative scores the normed value is maximized by the LARGEST
      norm divisor, so every competitor's pruning-normed score is
      <= max(D) / norm_penalty(max_steps). If that bound stays below
      min_t S(t+1)/norm_penalty(t+1) (g's own normed trajectory), g is the
      top-1 beam at every step: it is never pruned, finishes exactly as
      the K=1 decode did, and every surviving competitor's raw score stays
      below max(D).
    * Final selection (condition B): beam returns argmax over beams of
      score / L^BEAM_LENP + CTC_FUSION_ALPHA * ctc_alignment. Competitor
      dec term <= max(D) / max_steps^BEAM_LENP (score < 0, L <= max_steps);
      competitor alignment term <= 0 (``ctc_alignment_scores`` is a
      length-normalized log-likelihood). g's combined score is computed
      exactly. If g's value exceeds the competitor bound, beam's answer is
      g's text.
    * Self-consistency: the pass re-derives each g token as the strict
      argmax of the fused+penalized logp with a tie margin; rows where
      re-derivation differs (or that never converged) fail the
      certificate. Margins (EPS below) absorb the last-ulp differences
      between this full-sequence pass and the KV-cached step path (the
      same bf16-accumulation caveat the shipping ``spec_decode`` carries,
      proven on the parity corpus: tests/test_beam_spec.py runs both
      machines over clean, degraded, and garbage inputs and asserts
      text identity).

    MEASURED NULL RESULT (round 5, committed flagship, CPU+TPU identical):
    the certificate fires on 0/24 clean rendered lines. Root cause is
    structural, not a bug: with LM fusion on (the reference default,
    USE_LM_FUSION_EVAL + LM_FUSION_ALPHA=0.35), every chosen token pays
    ~alpha * H(LM) ~ 1.4 nats, so g's real score decays ~1.4/token while
    the sound competitor bound assumes a zero-cost suffix — the gap grows
    by |avg logp| * suffix_len (~15 nats on a 15-char line) and dwarfs the
    ~10-nat divergence margins. The final-selection length-norm slack
    (a competitor may grow to max_steps tokens, shrinking its normalized
    score magnitude) compounds it. Any sound certificate under these
    semantics must bound unknown-prefix suffix costs below ~-1 nat/token,
    which no static argument can. Kept (default-off, CFG.SPEC_BEAM)
    because the proof and machinery are exact and become profitable
    whenever fusion is off or a low-entropy LM head ships.

    Returns [N] bool — True where beam_search provably returns ``tokens``.
    """
    n, l_buf = tokens.shape
    K = k_beam
    if (K < 2 or cfg.EOS_LOGP_BOOST != 0.0 or cfg.EOS_LOGP_BIAS < 0.0
            or cfg.BEAM_LENP < 0.0):
        return jnp.zeros((n,), bool)
    # Margins absorbing cross-path (full-seq vs KV-step) accumulation
    # drift: normed-score space and per-token argmax space respectively.
    EPS_NORM = 0.1
    EPS_TOK = 0.05

    max_steps = jnp.minimum(
        max_decode_steps(cfg, target_len, mem_proj.shape[1]), l_cap)
    dec_logits, lm_logits = R.decoder_forward_heads(
        variables, mem_proj, tokens, cfg)
    logp = _fused_logp(dec_logits, lm_logits, cfg)
    logp = apply_penalties_seq(logp, tokens, cfg, target_len, eos_id,
                               unk_dec_id)
    topv, topi = jax.lax.top_k(logp, K)                   # [N, l_buf, K]

    pos = jnp.arange(l_buf)[None, :]
    n_steps = jnp.maximum(lengths - 1, 0)                 # executed steps
    step_mask = pos < n_steps[:, None]
    nxt = jnp.concatenate([tokens[:, 1:], jnp.zeros((n, 1), jnp.int32)],
                          axis=1)
    chosen_lp = jnp.take_along_axis(logp, nxt[..., None], axis=-1)[..., 0]

    # g must be the strict per-position argmax of THIS pass's logp.
    path_ok = jnp.all(
        ~step_mask | ((topi[..., 0] == nxt)
                      & (topv[..., 0] - topv[..., 1] > EPS_TOK)), axis=1)

    step_lp = jnp.where(step_mask, chosen_lp, 0.0)
    S = jnp.cumsum(step_lp, axis=1)                       # S after step t
    S_final = jnp.take_along_axis(
        S, jnp.maximum(n_steps - 1, 0)[:, None], axis=1)[:, 0]
    S_final = jnp.where(n_steps > 0, S_final, 0.0)
    S_prev = S - step_lp                                  # S before step t

    # Branch roots: the K-1 runner-up expansions of g's beam at each step.
    D = S_prev[..., None] + topv[..., 1:]                 # [N, l_buf, K-1]
    D = jnp.where(step_mask[..., None], D, NEG_INF)
    max_D = jnp.max(D.reshape(n, -1), axis=1)

    def norm_penalty(L):
        Lf = jnp.maximum(1, L).astype(jnp.float32)
        return ((5.0 + Lf) ** cfg.BEAM_LENP) / ((5.0 + 1.0) ** cfg.BEAM_LENP)

    # Condition A: g's pruning-normed trajectory stays above every
    # competitor bound (norm divisors per the argument above).
    g_norm = jnp.where(step_mask, S / norm_penalty(pos + 1), jnp.inf)
    G_min = jnp.min(g_norm, axis=1)
    comp_norm_ub = max_D / norm_penalty(max_steps)
    cond_a = comp_norm_ub < G_min - EPS_NORM

    # Condition B: final CTC-fused selection.
    Lg = jnp.maximum(1, n_steps).astype(jnp.float32)
    dec_score_g = S_final / (Lg ** cfg.BEAM_LENP)
    if ctc_logits is not None and cfg.CTC_FUSION_ALPHA > 0:
        log_probs = jax.nn.log_softmax(ctc_logits, axis=-1)
        labels_g, lens_g = _labels_from_tokens(tokens, lengths, eos_id,
                                               dec_offset)
        align_g = ctc_alignment_scores(log_probs, labels_g, lens_g)
        comb_g = dec_score_g + cfg.CTC_FUSION_ALPHA * align_g
    else:
        comb_g = dec_score_g
    comp_comb_ub = max_D / (jnp.maximum(1, max_steps).astype(jnp.float32)
                            ** cfg.BEAM_LENP)
    cond_b = comp_comb_ub < comb_g - EPS_NORM

    # A certified row also needs a real decode (>= 1 step) and max_D < 0
    # (the "largest length maximizes a negative normed score" steps above
    # assumed it; max_D >= 0 cannot be certified).
    return path_ok & cond_a & cond_b & (n_steps > 0) & (max_D < 0.0)


# ==========================================================================
# Greedy streaming decode (argmax-on-raw-logits reference quirk preserved)
# ==========================================================================
def _greedy_step(variables, cross_kvs, fused_head, fused_qkv, target_len,
                 max_steps, t, tokens, lengths, score, finished, cache,
                 steps_done, *, cfg, eos_id, unk_dec_id):
    """One greedy AR step for all N lines (shared by ``greedy_decode`` and
    ``greedy_stream_window``). Token choice is argmax of the RAW dec logits
    (reference quirk, kiri_ocr/model.py:915-917). Returns the updated state
    plus (active, best_prob, best_id) for history recording."""
    n, l_buf = tokens.shape
    active = (t < max_steps) & ~finished

    cur_tok = jnp.take_along_axis(tokens, jnp.maximum(lengths - 1, 0)[:, None],
                                  axis=1)[:, 0]
    dec_logits, lm_logits, cache = R.decoder_step(
        variables, cur_tok, t, cache, cross_kvs, cfg,
        fused_head=fused_head, fused_qkv=fused_qkv)
    logp = _fused_logp(dec_logits, lm_logits, cfg)
    logp = apply_penalties(logp, tokens, t, cfg, target_len, eos_id, unk_dec_id)

    raw_probs = jax.nn.softmax(dec_logits, axis=-1)
    best_id = jnp.argmax(raw_probs, axis=-1).astype(jnp.int32)
    best_prob = jnp.max(raw_probs, axis=-1)
    best_logp = jnp.take_along_axis(logp, best_id[:, None], axis=1)[:, 0]

    is_eos = best_id == eos_id
    new_tokens = tokens.at[jnp.arange(n), lengths].set(
        jnp.where(active, best_id, tokens[jnp.arange(n), jnp.minimum(lengths, l_buf - 1)]))
    new_lengths = jnp.where(active, lengths + 1, lengths)
    new_finished = jnp.where(active, is_eos, finished)
    new_score = jnp.where(active, score + best_logp, score)
    steps_done = steps_done + active.astype(jnp.int32)
    return (new_tokens, new_lengths, new_score, new_finished, cache,
            steps_done, active, best_prob, best_id, best_logp)


@partial(jax.jit, static_argnames=("cfg", "l_cap", "eos_id", "unk_dec_id", "bos_id"))
def greedy_decode(variables: Dict[str, Any], mem_proj: jnp.ndarray,
                  target_len: jnp.ndarray, *, cfg, l_cap: int,
                  eos_id: int = 2, unk_dec_id: int = 3, bos_id: int = 1) -> DecodeOut:
    """Greedy AR decode for N lines, recording per-step history.

    Parity notes (reference greedy_decode_streaming, kiri_ocr/model.py:779-946):
    token choice is argmax of the *raw* dec logits — penalties/LM fusion alter
    only the recorded logp, not the selection. History rows carry
    (raw softmax prob, token id) so the host can emit the exact chunk dicts.
    """
    n, t_mem, _ = mem_proj.shape
    l_buf = l_cap + 2

    max_steps = jnp.minimum(max_decode_steps(cfg, target_len, t_mem), l_cap)
    cross_kvs = R.decode_prepare(variables, mem_proj, cfg)
    fused_head = R.fuse_output_heads(variables["params"])
    fused_qkv = R.fuse_self_qkv(variables["params"])
    cache = R.init_decode_cache(cfg, n, l_buf)

    tokens0 = jnp.zeros((n, l_buf), jnp.int32).at[:, 0].set(bos_id)
    lengths0 = jnp.ones((n,), jnp.int32)
    finished0 = jnp.zeros((n,), bool)
    score0 = jnp.zeros((n,), jnp.float32)

    hist = {
        "extra": jnp.zeros((n, l_cap, 2), jnp.float32),
        "logp": jnp.zeros((n, l_cap), jnp.float32),
    }

    def cond(state):
        t, *_ , finished, _, _, _ = state
        return jnp.any((t < max_steps) & ~finished)

    def body(state):
        t, tokens, lengths, score, finished, cache, hist, steps_done = state
        (tokens, lengths, score, finished, cache, steps_done, active,
         best_prob, best_id, best_logp) = _greedy_step(
            variables, cross_kvs, fused_head, fused_qkv, target_len,
            max_steps, t, tokens, lengths, score, finished, cache,
            steps_done, cfg=cfg, eos_id=eos_id, unk_dec_id=unk_dec_id)

        w = jnp.minimum(t, l_cap - 1)
        hist = {
            "extra": hist["extra"].at[:, w].set(
                jnp.where(active[:, None],
                          jnp.stack([best_prob, best_id.astype(jnp.float32)], -1),
                          hist["extra"][:, w])),
            "logp": hist["logp"].at[:, w].set(
                jnp.where(active, best_logp, hist["logp"][:, w])),
        }
        return (t + 1, tokens, lengths, score, finished, cache, hist,
                steps_done)

    state = (jnp.asarray(0, jnp.int32), tokens0, lengths0, score0, finished0,
             cache, hist, jnp.zeros((n,), jnp.int32))
    _, tokens, lengths, score, finished, cache, hist, steps_done = \
        jax.lax.while_loop(cond, body, state)

    L = jnp.maximum(1, lengths - 1).astype(jnp.float32)
    dec_conf = jnp.clip(jnp.where(lengths > 1, jnp.exp(score / L), 0.0), 0.0, 1.0)
    z2 = jnp.zeros((n, 1, tokens.shape[1]), jnp.int32)
    return DecodeOut(tokens, lengths, dec_conf, dec_conf, jnp.zeros((n,)),
                     z2, jnp.zeros((n, 1), jnp.int32), jnp.zeros((n, 1)),
                     jnp.zeros((n, 1), bool), steps_done, hist["extra"])


# ==========================================================================
# Incremental (windowed) streaming decode
# ==========================================================================
# The one-shot decoders above run the whole while_loop in a single dispatch
# and replay recorded history — maximal throughput, but time-to-first-char is
# the full page decode. The reference instead yields each token as its eager
# loop computes it (kiri_ocr/model.py:779-946 greedy, :949-1153 beam). These
# resumable variants close that gap the TPU way: decode state (tokens,
# scores, KV cache) lives on device between dispatches; each
# ``*_stream_window`` call advances every line by up to ``w`` steps and
# returns just that window's history, which the host emits as chunks before
# launching the next window. Step math is shared with the one-shot loops
# (_beam_step/_greedy_step), so the record stream is bit-identical —
# windowing changes only when results become visible.

class BeamStreamState(NamedTuple):
    t: jnp.ndarray          # scalar int32 — next step index
    tokens: jnp.ndarray     # [N, K, l_buf]
    scores: jnp.ndarray     # [N, K]
    lengths: jnp.ndarray    # [N, K]
    finished: jnp.ndarray   # [N, K] bool
    cache: Dict[str, jnp.ndarray]
    steps_done: jnp.ndarray  # [N]
    max_steps: jnp.ndarray   # [N] per-line step budget (static over windows)
    anc: jnp.ndarray         # [N, K, l_buf] ancestry table (permute-free
    # beam mode; carried zeros when unused so the state pytree is stable)


class GreedyStreamState(NamedTuple):
    t: jnp.ndarray
    tokens: jnp.ndarray     # [N, l_buf]
    lengths: jnp.ndarray    # [N]
    score: jnp.ndarray      # [N]
    finished: jnp.ndarray   # [N] bool
    cache: Dict[str, jnp.ndarray]
    steps_done: jnp.ndarray  # [N]
    max_steps: jnp.ndarray   # [N]


@partial(jax.jit, static_argnames=("cfg", "k_beam", "l_cap", "bos_id",
                                   "opt_shared_kv", "opt_ancestry"))
def beam_stream_init(variables: Dict[str, Any], mem_proj: jnp.ndarray,
                     target_len: jnp.ndarray, *, cfg, k_beam: int, l_cap: int,
                     bos_id: int = 1, opt_shared_kv: bool = True,
                     opt_ancestry: bool = True
                     ) -> Tuple[BeamStreamState, Any]:
    """Initial beam state + per-layer cross-attention K/V (kept on device
    and passed unchanged to every ``beam_stream_window`` call).

    ``opt_ancestry`` must match the flag passed to every subsequent
    ``beam_stream_window`` call on this stream: the two modes store the KV
    cache differently (permuted rows vs ancestry-indexed), so toggling
    mid-stream would silently corrupt attention. The mode is encoded in the
    state's ``anc`` buffer shape (zero-width when off), and
    ``beam_stream_window`` raises at trace time on a mismatch."""
    n, t_mem, _ = mem_proj.shape
    K = k_beam
    l_buf = l_cap + 2
    if opt_shared_kv:
        cross_kvs = R.decode_prepare(variables, mem_proj, cfg)
    else:
        cross_kvs = R.decode_prepare(variables,
                                     jnp.repeat(mem_proj, K, axis=0), cfg)
    cache = R.init_decode_cache(cfg, n * K, l_buf)
    state = BeamStreamState(
        t=jnp.asarray(0, jnp.int32),
        tokens=jnp.zeros((n, K, l_buf), jnp.int32).at[:, :, 0].set(bos_id),
        scores=jnp.full((n, K), NEG_INF).at[:, 0].set(0.0),
        lengths=jnp.ones((n, K), jnp.int32),
        finished=jnp.zeros((n, K), bool),
        cache=cache,
        steps_done=jnp.zeros((n,), jnp.int32),
        max_steps=jnp.minimum(max_decode_steps(cfg, target_len, t_mem), l_cap),
        anc=jnp.zeros((n, K, l_buf if (opt_ancestry and K > 1) else 0),
                      jnp.int32))
    return state, cross_kvs


@partial(jax.jit, static_argnames=("cfg", "k_beam", "w", "eos_id",
                                   "unk_dec_id", "opt_shared_kv",
                                   "opt_identity_skip", "opt_ancestry"))
def beam_stream_window(variables: Dict[str, Any], state: BeamStreamState,
                       cross_kvs, target_len: jnp.ndarray, *, cfg,
                       k_beam: int, w: int, eos_id: int = 2,
                       unk_dec_id: int = 3, opt_shared_kv: bool = True,
                       opt_identity_skip: bool = True,
                       opt_ancestry: bool = True):
    """Advance every line by up to ``w`` beam steps.

    Returns (new_state, hist, all_done): ``hist`` holds the per-step
    best-hypothesis snapshots of THIS window (hist["tokens"] [N, w, l_buf],
    "len"/"score"/"fin" [N, w] — window-step s is global step state.t + s;
    rows a line did not execute stay zero), ``all_done`` is a scalar bool
    (no line has steps left). Step math identical to ``beam_search``.

    ``opt_ancestry`` must equal the flag ``beam_stream_init`` was called
    with, for every window of one stream (the KV cache layout differs
    between modes); a mismatch raises ValueError at trace time.
    """
    n, K, l_buf = state.tokens.shape
    want_anc = l_buf if (opt_ancestry and K > 1) else 0
    if state.anc.shape[2] != want_anc:
        raise ValueError(
            f"beam_stream_window(opt_ancestry={opt_ancestry}) on a state "
            "initialized for the other mode — the flag must be identical "
            "in beam_stream_init and every window of one stream (the KV "
            "cache is permuted in one mode and ancestry-indexed in the "
            "other; mixing them silently corrupts attention)")
    step_beams = K if opt_shared_kv else 1
    fused_head = R.fuse_output_heads(variables["params"])
    fused_qkv = R.fuse_self_qkv(variables["params"])
    t0 = state.t
    t_end = t0 + w

    hist0 = {
        "tokens": jnp.zeros((n, w, l_buf), jnp.int32),
        "len": jnp.zeros((n, w), jnp.int32),
        "score": jnp.zeros((n, w), jnp.float32),
        "fin": jnp.zeros((n, w), bool),
    }

    use_anc = opt_ancestry and K > 1

    def cond(s):
        t, tokens, scores, lengths, finished, cache, steps_done, hist, anc = s
        line_active = (t < state.max_steps) & ~jnp.all(finished, axis=1)
        return (t < t_end) & jnp.any(line_active)

    def body(s):
        t, tokens, scores, lengths, finished, cache, steps_done, hist, anc = s
        (tokens, scores, lengths, finished, cache, steps_done,
         line_active, anc_new) = _beam_step(
            variables, cross_kvs, step_beams, fused_head, fused_qkv,
            target_len, state.max_steps, t, tokens, scores, lengths,
            finished, cache, steps_done, cfg=cfg, eos_id=eos_id,
            unk_dec_id=unk_dec_id, opt_identity_skip=opt_identity_skip,
            anc=anc if use_anc else None)
        if use_anc:
            anc = anc_new
        bt, bl, bs, bf = _stream_best(cfg, tokens, scores, lengths, finished)
        wi = t - t0
        hist = {
            "tokens": hist["tokens"].at[:, wi].set(
                jnp.where(line_active[:, None], bt, hist["tokens"][:, wi])),
            "len": hist["len"].at[:, wi].set(
                jnp.where(line_active, bl, hist["len"][:, wi])),
            "score": hist["score"].at[:, wi].set(
                jnp.where(line_active, bs, hist["score"][:, wi])),
            "fin": hist["fin"].at[:, wi].set(
                jnp.where(line_active, bf, hist["fin"][:, wi])),
        }
        return (t + 1, tokens, scores, lengths, finished, cache, steps_done,
                hist, anc)

    t, tokens, scores, lengths, finished, cache, steps_done, hist, anc = \
        jax.lax.while_loop(cond, body, (t0, state.tokens, state.scores,
                                        state.lengths, state.finished,
                                        state.cache, state.steps_done, hist0,
                                        state.anc))
    new_state = BeamStreamState(t, tokens, scores, lengths, finished, cache,
                                steps_done, state.max_steps, anc)
    all_done = ~jnp.any((t < state.max_steps) & ~jnp.all(finished, axis=1))
    return new_state, hist, all_done


@partial(jax.jit, static_argnames=("cfg", "l_cap", "bos_id"))
def greedy_stream_init(variables: Dict[str, Any], mem_proj: jnp.ndarray,
                       target_len: jnp.ndarray, *, cfg, l_cap: int,
                       bos_id: int = 1) -> Tuple[GreedyStreamState, Any]:
    """Initial greedy state + cross-attention K/V for windowed streaming."""
    n, t_mem, _ = mem_proj.shape
    l_buf = l_cap + 2
    cross_kvs = R.decode_prepare(variables, mem_proj, cfg)
    cache = R.init_decode_cache(cfg, n, l_buf)
    state = GreedyStreamState(
        t=jnp.asarray(0, jnp.int32),
        tokens=jnp.zeros((n, l_buf), jnp.int32).at[:, 0].set(bos_id),
        lengths=jnp.ones((n,), jnp.int32),
        score=jnp.zeros((n,), jnp.float32),
        finished=jnp.zeros((n,), bool),
        cache=cache,
        steps_done=jnp.zeros((n,), jnp.int32),
        max_steps=jnp.minimum(max_decode_steps(cfg, target_len, t_mem), l_cap))
    return state, cross_kvs


@partial(jax.jit, static_argnames=("cfg", "w", "eos_id", "unk_dec_id"))
def greedy_stream_window(variables: Dict[str, Any], state: GreedyStreamState,
                         cross_kvs, target_len: jnp.ndarray, *, cfg, w: int,
                         eos_id: int = 2, unk_dec_id: int = 3):
    """Advance every line by up to ``w`` greedy steps (argmax-on-raw-logits
    reference quirk preserved — see ``greedy_decode``).

    Returns (new_state, hist, all_done); hist["extra"] [N, w, 2] carries
    (raw prob, token id) per window step for the streaming chunk schema.
    """
    n, l_buf = state.tokens.shape
    fused_head = R.fuse_output_heads(variables["params"])
    fused_qkv = R.fuse_self_qkv(variables["params"])
    t0 = state.t
    t_end = t0 + w
    hist0 = {"extra": jnp.zeros((n, w, 2), jnp.float32)}

    def cond(s):
        t, tokens, lengths, score, finished, cache, steps_done, hist = s
        return (t < t_end) & jnp.any((t < state.max_steps) & ~finished)

    def body(s):
        t, tokens, lengths, score, finished, cache, steps_done, hist = s
        (tokens, lengths, score, finished, cache, steps_done, active,
         best_prob, best_id, _) = _greedy_step(
            variables, cross_kvs, fused_head, fused_qkv, target_len,
            state.max_steps, t, tokens, lengths, score, finished, cache,
            steps_done, cfg=cfg, eos_id=eos_id, unk_dec_id=unk_dec_id)
        wi = t - t0
        hist = {"extra": hist["extra"].at[:, wi].set(
            jnp.where(active[:, None],
                      jnp.stack([best_prob, best_id.astype(jnp.float32)], -1),
                      hist["extra"][:, wi]))}
        return (t + 1, tokens, lengths, score, finished, cache, steps_done,
                hist)

    t, tokens, lengths, score, finished, cache, steps_done, hist = \
        jax.lax.while_loop(cond, body, (t0, state.tokens, state.lengths,
                                        state.score, state.finished,
                                        state.cache, state.steps_done, hist0))
    new_state = GreedyStreamState(t, tokens, lengths, score, finished, cache,
                                  steps_done, state.max_steps)
    all_done = ~jnp.any((t < state.max_steps) & ~finished)
    return new_state, hist, all_done


def pick_l_cap(cfg, max_steps_host: int, buckets=None) -> int:
    """Smallest configured step bucket covering max_steps (static for jit).

    ``buckets`` overrides cfg.STEP_BUCKETS (the beam device dispatch uses
    the finer CFG.BEAM_STEP_BUCKETS: its per-chunk loops are the dominant
    cost there, and chunks are small enough that tighter caps pay for the
    extra compiled variants)."""
    bs = buckets if buckets is not None else cfg.STEP_BUCKETS
    for b in bs:
        if b >= max_steps_host:
            return int(b)
    return int(bs[-1])


def pick_batch_bucket(cfg, n: int) -> int:
    for b in cfg.BATCH_BUCKETS:
        if b >= n:
            return int(b)
    return int(math.ceil(n / cfg.BATCH_BUCKETS[-1]) * cfg.BATCH_BUCKETS[-1])
