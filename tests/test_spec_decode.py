"""Speculative (CTC-drafted) decode: output equivalence with the sequential
single-hypothesis decoders.

``spec_decode`` must reproduce, bit-for-bit at the text level:
* the "decoder"/accurate path = beam search with BEAM=1 (reference
  core.py:560-568 — penalized+fused argmax selection), and
* the greedy streaming path (reference model.py:779-946 — raw-logits argmax
  quirk) including the per-step (prob, token) history records.

Random-weight models exercise divergent drafts (CTC and AR heads are
unrelated at init, so nearly every draft token mismatches and the round loop
degenerates to its worst case); the trained-flagship corpus parity lives in
test_parity_corpus.py.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kiri_tpu.config import CFG
from kiri_tpu.engine import RecognizerEngine
from kiri_tpu.models import recognizer as R
from kiri_tpu.ops import decode as D
from kiri_tpu.tokenizer import CharTokenizer

CFG_TINY = CFG(ENC_DIM=32, ENC_LAYERS=1, ENC_FF=64, ENC_HEADS=4,
               DEC_DIM=32, DEC_LAYERS=1, DEC_FF=64, DEC_HEADS=4,
               IMG_H=48, IMG_W=160, COMPUTE_DTYPE="float32",
               BATCH_BUCKETS=(1, 2, 4, 8), STEP_BUCKETS=(16, 32, 64))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("spec")
    vocab = {"<unk>": 0}
    for i, ch in enumerate("abcde "):
        vocab[ch] = i + 1
    vp = tmp / "vocab.json"
    vp.write_text(json.dumps(vocab))
    tok = CharTokenizer(str(vp), CFG_TINY)
    variables = R.init_recognizer(jax.random.PRNGKey(0), CFG_TINY, tok)
    return variables, tok


def _encode(variables, tok, seed, n=6):
    imgs = np.random.default_rng(seed).integers(
        0, 255, (n, 48, 160), dtype=np.uint8)
    eng = RecognizerEngine(variables, CFG_TINY, tok)
    memp, ctc, ids, conf, est, _ = eng.encode_batch(imgs)
    return eng, memp, ctc, ids, conf, est


def _texts(tok, out, n):
    res = []
    tokens, lengths = np.asarray(out.tokens), np.asarray(out.lengths)
    if tokens.ndim == 3:  # not expected here
        raise AssertionError
    for i in range(n):
        ids = tokens[i, 1:lengths[i]]
        eos = np.nonzero(ids == tok.dec_eos)[0]
        if eos.size:
            ids = ids[: eos[0]]
        res.append(tok.decode_dec(ids))
    return res


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_spec_matches_beam1(setup, seed):
    """Penalized-selection spec == beam_search k=1 (the accurate path)."""
    variables, tok = setup
    eng, memp, ctc, ids, conf, est = _encode(variables, tok, seed)
    est_np = np.asarray(est)
    n = memp.shape[0]
    l_cap = eng._step_cap(est_np, n, memp.shape[1])
    tl = jnp.asarray(np.where(est_np > 0, est_np, 0), jnp.int32)
    kw = dict(cfg=CFG_TINY, l_cap=l_cap, eos_id=tok.dec_eos,
              unk_dec_id=tok.unk_id + tok.dec_offset,
              dec_offset=tok.dec_offset, bos_id=tok.dec_bos)
    ref = D.beam_search(variables, memp, ctc, tl, conf, k_beam=1, **kw)
    spec = D.spec_decode(variables, memp, ids, tl, conf, **kw)
    assert _texts(tok, spec, n) == _texts(tok, ref, n)
    np.testing.assert_array_equal(np.asarray(spec.lengths),
                                  np.asarray(ref.lengths))
    np.testing.assert_allclose(np.asarray(spec.dec_conf),
                               np.asarray(ref.dec_conf), atol=1e-4)
    np.testing.assert_allclose(np.asarray(spec.final_conf),
                               np.asarray(ref.final_conf), atol=1e-4)


@pytest.mark.parametrize("seed", [0, 3])
def test_spec_matches_greedy_stream(setup, seed):
    """Raw-argmax spec == greedy_decode, including per-step history."""
    variables, tok = setup
    eng, memp, ctc, ids, conf, est = _encode(variables, tok, seed)
    est_np = np.asarray(est)
    n = memp.shape[0]
    l_cap = eng._step_cap(est_np, n, memp.shape[1])
    tl = jnp.asarray(est_np, jnp.int32)
    ref = D.greedy_decode(variables, memp, tl, cfg=CFG_TINY, l_cap=l_cap,
                          eos_id=tok.dec_eos,
                          unk_dec_id=tok.unk_id + tok.dec_offset,
                          bos_id=tok.dec_bos)
    spec = D.spec_decode(variables, memp, ids, tl, None, cfg=CFG_TINY,
                         l_cap=l_cap, eos_id=tok.dec_eos,
                         unk_dec_id=tok.unk_id + tok.dec_offset,
                         dec_offset=tok.dec_offset, bos_id=tok.dec_bos,
                         raw_select=True)
    assert _texts(tok, spec, n) == _texts(tok, ref, n)
    steps_r = np.asarray(ref.hist_steps)
    steps_s = np.asarray(spec.hist_steps)
    np.testing.assert_array_equal(steps_s, steps_r)
    er, es = np.asarray(ref.hist_extra), np.asarray(spec.hist_extra)
    for i in range(n):
        s = steps_r[i]
        np.testing.assert_array_equal(es[i, :s, 1], er[i, :s, 1])
        np.testing.assert_allclose(es[i, :s, 0], er[i, :s, 0], atol=1e-4)


def test_spec_empty_draft(setup):
    """Blank CTC (all-blank frames) degrades to exact stepwise decoding."""
    variables, tok = setup
    eng, memp, ctc, ids, conf, est = _encode(variables, tok, 7, n=2)
    n = memp.shape[0]
    blank_ids = jnp.zeros_like(ids)          # all frames = blank
    tl = jnp.zeros((n,), jnp.int32)          # no length estimate
    l_cap = 16
    kw = dict(cfg=CFG_TINY, l_cap=l_cap, eos_id=tok.dec_eos,
              unk_dec_id=tok.unk_id + tok.dec_offset,
              dec_offset=tok.dec_offset, bos_id=tok.dec_bos)
    ref = D.beam_search(variables, memp, ctc, tl, conf, k_beam=1, **kw)
    spec = D.spec_decode(variables, memp, blank_ids, tl, conf, **kw)
    assert _texts(tok, spec, n) == _texts(tok, ref, n)
    np.testing.assert_array_equal(np.asarray(spec.lengths),
                                  np.asarray(ref.lengths))


def test_spec_perfect_draft_single_round(setup):
    """A draft equal to the model's own greedy output accepts in one round
    (plus the final no-new-token round) — the steady-state fast case."""
    variables, tok = setup
    eng, memp, ctc, ids, conf, est = _encode(variables, tok, 11, n=4)
    est_np = np.asarray(est)
    n = memp.shape[0]
    l_cap = eng._step_cap(est_np, n, memp.shape[1])
    tl = jnp.asarray(np.where(est_np > 0, est_np, 0), jnp.int32)
    kw = dict(cfg=CFG_TINY, l_cap=l_cap, eos_id=tok.dec_eos,
              unk_dec_id=tok.unk_id + tok.dec_offset,
              dec_offset=tok.dec_offset, bos_id=tok.dec_bos)
    ref = D.beam_search(variables, memp, ctc, tl, conf, k_beam=1, **kw)
    # Re-encode the reference output as fake CTC frames (dec id -> ctc id
    # is -1): a draft that matches the model's choices exactly.
    tokens, lengths = np.asarray(ref.tokens), np.asarray(ref.lengths)
    t_frames = ids.shape[1]
    fake = np.zeros((n, t_frames), np.int32)
    for i in range(n):
        seq = tokens[i, 1:lengths[i]]
        eos = np.nonzero(seq == tok.dec_eos)[0]
        if eos.size:
            seq = seq[: eos[0]]
        # interleave blanks so repeated chars survive CTC collapse
        fake[i, 1:2 * len(seq):2] = seq - 1
    spec = D.spec_decode(variables, memp, jnp.asarray(fake), tl, conf, **kw)
    assert _texts(tok, spec, n) == _texts(tok, ref, n)


@pytest.mark.parametrize("seed", [0, 4])
def test_spec_matches_beam1_with_eos_bias(setup, seed):
    """Nonzero EOS bias/boost exercises the (default-dormant) EOS branch of
    apply_penalties_seq against the step loop's apply_penalties."""
    variables, tok = setup
    cfg = CFG_TINY.replace(EOS_LOGP_BIAS=1.5, EOS_LOGP_BOOST=2.0,
                           EOS_BIAS_UNTIL_LEN=3)
    eng, memp, ctc, ids, conf, est = _encode(variables, tok, seed)
    est_np = np.asarray(est)
    n = memp.shape[0]
    l_cap = eng._step_cap(est_np, n, memp.shape[1])
    # half the rows with a CTC target length, half without (both EOS-bias
    # formula arms)
    tl_np = np.where(est_np > 0, est_np, 0)
    tl_np[::2] = 0
    tl = jnp.asarray(tl_np, jnp.int32)
    kw = dict(cfg=cfg, l_cap=l_cap, eos_id=tok.dec_eos,
              unk_dec_id=tok.unk_id + tok.dec_offset,
              dec_offset=tok.dec_offset, bos_id=tok.dec_bos)
    ref = D.beam_search(variables, memp, ctc, tl, conf, k_beam=1, **kw)
    spec = D.spec_decode(variables, memp, ids, tl, conf, **kw)
    assert _texts(tok, spec, n) == _texts(tok, ref, n)
    np.testing.assert_array_equal(np.asarray(spec.lengths),
                                  np.asarray(ref.lengths))
    np.testing.assert_allclose(np.asarray(spec.dec_conf),
                               np.asarray(ref.dec_conf), atol=1e-4)


def test_round_budget_fallback(setup):
    """SPEC_MAX_ROUNDS=1 with random weights forces nearly every row past
    the round budget; the engine's step-loop fallback must make results
    identical to SPEC_DECODE=False anyway — batch, bucketed, streaming."""
    variables, tok = setup
    imgs = np.random.default_rng(9).integers(
        0, 255, (5, 48, 160), dtype=np.uint8)
    widths = np.asarray([160, 96, 160, 64, 160], np.int32)
    eng_budget = RecognizerEngine(
        variables, CFG_TINY.replace(SPEC_MAX_ROUNDS=1,
                                    ACCURATE_CTC_RESCORE=False,
                                    WIDTH_BUCKETS=(96, 160)), tok)
    eng_off = RecognizerEngine(
        variables, CFG_TINY.replace(SPEC_DECODE=False,
                                    WIDTH_BUCKETS=(96, 160)), tok)
    a = eng_budget.recognize_batch(imgs, "decoder")
    b = eng_off.recognize_batch(imgs, "decoder")
    assert [t for t, _ in a] == [t for t, _ in b]
    for (_, c1), (_, c2) in zip(a, b):
        assert abs(c1 - c2) < 1e-3
    aw = eng_budget.recognize_batch(imgs, "decoder", widths=widths)
    bw = eng_off.recognize_batch(imgs, "decoder", widths=widths)
    assert [t for t, _ in aw] == [t for t, _ in bw]
    sa = eng_budget.stream_records_batch(imgs, "decoder")
    sb = eng_off.stream_records_batch(imgs, "decoder")
    for ra, rb in zip(sa, sb):
        assert [r["token"] for r in ra] == [r["token"] for r in rb]
        assert [r["text"] for r in ra] == [r["text"] for r in rb]


def test_engine_decoder_method_uses_spec(setup):
    """Engine "decoder" results are identical with SPEC_DECODE on and off
    (CTC rescore pinned off: it may legitimately swap in the CTC candidate —
    covered by the rescore tests below)."""
    variables, tok = setup
    imgs = np.random.default_rng(5).integers(
        0, 255, (5, 48, 160), dtype=np.uint8)
    eng_on = RecognizerEngine(
        variables, CFG_TINY.replace(ACCURATE_CTC_RESCORE=False), tok)
    eng_off = RecognizerEngine(variables,
                               CFG_TINY.replace(SPEC_DECODE=False), tok)
    on = eng_on.recognize_batch(imgs, "decoder")
    off = eng_off.recognize_batch(imgs, "decoder")
    assert [t for t, _ in on] == [t for t, _ in off]
    for (_, c1), (_, c2) in zip(on, off):
        assert abs(c1 - c2) < 1e-3
    # streaming greedy records too
    s_on = eng_on.stream_records_batch(imgs, "decoder")
    s_off = eng_off.stream_records_batch(imgs, "decoder")
    for a, b in zip(s_on, s_off):
        assert [r["token"] for r in a] == [r["token"] for r in b]
        assert [r["text"] for r in a] == [r["text"] for r in b]


# ---------------------------------------------------------------------------
# Accurate-mode CTC-fused rescore (cfg.ACCURATE_CTC_RESCORE, VERDICT r3 #5)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rescore_output_is_one_of_the_candidates(setup, seed):
    """With ctc_logits given, every row's output is either the plain spec
    (= sequential beam-K1) transcript or the collapsed CTC transcript —
    never a third sequence — and rows where the two agree are unchanged."""
    variables, tok = setup
    eng, memp, ctc, ids, conf, est = _encode(variables, tok, seed)
    n = memp.shape[0]
    tl = jnp.asarray(np.maximum(np.asarray(est), 0), jnp.int32)
    kw = dict(cfg=CFG_TINY, l_cap=32, eos_id=tok.dec_eos,
              unk_dec_id=tok.unk_id + tok.dec_offset,
              dec_offset=tok.dec_offset, bos_id=tok.dec_bos)
    plain = D.spec_decode(variables, memp, ids, tl, conf, **kw)
    resc = D.spec_decode(variables, memp, ids, tl, conf, ctc_logits=ctc, **kw)
    plain_texts = _texts(tok, plain, n)
    resc_texts = _texts(tok, resc, n)
    ctc_texts = tok.decode_ctc_batch(np.asarray(ids)[:n])
    for i in range(n):
        assert resc_texts[i] in (plain_texts[i], ctc_texts[i]), (
            i, resc_texts[i], plain_texts[i], ctc_texts[i])
        if plain_texts[i] == ctc_texts[i]:
            assert resc_texts[i] == plain_texts[i]
    # Confidence stays a valid probability on swapped rows too.
    fc = np.asarray(resc.final_conf)[:n]
    assert np.all((fc >= 0.0) & (fc <= 1.0))


def test_rescore_prefers_ctc_when_alignment_dominates(setup):
    """Force a maximal split: CTC frames that spell a clean transcript vs an
    AR head that (at random init) proposes something else. The fused score
    must pick the CTC candidate — its alignment term is ~0 logp while the
    divergent AR transcript's alignment is strongly negative."""
    variables, tok = setup
    eng, memp, ctc, ids, conf, est = _encode(variables, tok, 3)
    n, t_frames = np.asarray(ids).shape
    c = int(np.asarray(ctc).shape[-1])
    # Synthesize frames: "ab" with blanks between (ctc ids of 'a','b').
    a_id, b_id = tok.encode_ctc("ab")[:2]
    frames = np.full((n, t_frames), 0, np.int32)
    frames[:, 2] = a_id
    frames[:, 5] = b_id
    hot = np.full((n, t_frames, c), -20.0, np.float32)
    hot[np.arange(n)[:, None], np.arange(t_frames)[None, :], frames] = 20.0
    ctc_hot = jnp.asarray(hot)
    tl = jnp.full((n,), 2, jnp.int32)
    kw = dict(cfg=CFG_TINY, l_cap=32, eos_id=tok.dec_eos,
              unk_dec_id=tok.unk_id + tok.dec_offset,
              dec_offset=tok.dec_offset, bos_id=tok.dec_bos)
    out = D.spec_decode(variables, memp, jnp.asarray(frames), tl, conf,
                        ctc_logits=ctc_hot, **kw)
    texts = _texts(tok, out, n)
    plain = D.spec_decode(variables, memp, jnp.asarray(frames), tl, conf, **kw)
    plain_texts = _texts(tok, plain, n)
    for i in range(n):
        if plain_texts[i] != "ab":  # AR diverged from the draft
            assert texts[i] == "ab", (i, texts[i], plain_texts[i])


def test_engine_rescore_flag_off_matches_plain(setup):
    """ACCURATE_CTC_RESCORE=False engine output == SPEC_DECODE=False engine
    output (the pre-rescore accurate mode, bit-for-bit)."""
    variables, tok = setup
    imgs = np.random.default_rng(11).integers(
        0, 255, (4, 48, 160), dtype=np.uint8)
    a = RecognizerEngine(
        variables, CFG_TINY.replace(ACCURATE_CTC_RESCORE=False),
        tok).recognize_batch(imgs, "decoder")
    b = RecognizerEngine(
        variables, CFG_TINY.replace(SPEC_DECODE=False),
        tok).recognize_batch(imgs, "decoder")
    assert [t for t, _ in a] == [t for t, _ in b]


def test_engine_rescore_default_candidate_membership(setup):
    """Default engine accurate mode returns, per line, one of the two
    candidate transcripts (AR or CTC)."""
    variables, tok = setup
    imgs = np.random.default_rng(12).integers(
        0, 255, (4, 48, 160), dtype=np.uint8)
    eng = RecognizerEngine(variables, CFG_TINY, tok)
    got = [t for t, _ in eng.recognize_batch(imgs, "decoder")]
    ar = [t for t, _ in RecognizerEngine(
        variables, CFG_TINY.replace(ACCURATE_CTC_RESCORE=False),
        tok).recognize_batch(imgs, "decoder")]
    ctc = [t for t, _ in eng.recognize_batch(imgs, "ctc")]
    for i, t in enumerate(got):
        assert t in (ar[i], ctc[i]), (i, t, ar[i], ctc[i])
