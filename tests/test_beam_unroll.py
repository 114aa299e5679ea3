"""opt_unroll parity: beam_search with unrolled while_loop steps must be
bit-identical to the single-step loop (the per-line freeze in _beam_step
makes overshoot sub-steps no-ops)."""
import json

import jax
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
    tmp = tmp_path_factory.mktemp("unroll")
    vocab = {"<unk>": 0}
    for i, ch in enumerate("abcde "):
        vocab[ch] = i + 1
    vp = tmp / "vocab.json"
    vp.write_text(json.dumps(vocab))
    tok = CharTokenizer(str(vp), CFG_TINY)
    variables = R.init_recognizer(jax.random.PRNGKey(0), CFG_TINY, tok)
    engine = RecognizerEngine(variables, CFG_TINY, tok)
    imgs = np.random.default_rng(1).integers(0, 255, (4, 48, 160), np.uint8)
    memp, ctc, ids, conf, est, n = engine.encode_batch(imgs)
    kw = dict(cfg=CFG_TINY, k_beam=3, l_cap=16, eos_id=tok.dec_eos,
              unk_dec_id=tok.unk_id + tok.dec_offset,
              dec_offset=tok.dec_offset, bos_id=tok.dec_bos)
    args = (engine.variables, memp, ctc, est.astype(np.int32), conf)
    return args, kw, engine


@pytest.mark.parametrize("unroll", [2, 3, 4])
def test_unroll_bit_identical(setup, unroll):
    args, kw, _engine = setup
    base = D.beam_search(*args, **kw, opt_unroll=1, opt_ancestry=False)
    got = D.beam_search(*args, **kw, opt_unroll=unroll, opt_ancestry=False)
    np.testing.assert_array_equal(np.asarray(base.tokens),
                                  np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(base.lengths),
                                  np.asarray(got.lengths))
    np.testing.assert_allclose(np.asarray(base.final_conf), np.asarray(got.final_conf),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(base.hist_steps), np.asarray(got.hist_steps))


@pytest.mark.parametrize("l_cap,unroll", [(32, 1), (64, 1), (64, 3)])
def test_cache_segments_parity(setup, l_cap, unroll):
    """Segmented KV-cache growth (opt_cache_segments>1) is bit-identical to
    the single full-size-buffer loop: the causal mask zeroes never-written
    slots either way, and permuting all-zero tail rows yields zeros."""
    args, kw, _engine = setup
    kw = dict(kw, l_cap=l_cap)
    base = D.beam_search(*args, **kw, opt_cache_segments=1,
                         opt_ancestry=False)
    got = D.beam_search(*args, **kw, opt_cache_segments=3, opt_unroll=unroll,
                        opt_ancestry=False)
    np.testing.assert_array_equal(np.asarray(base.tokens),
                                  np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(base.lengths),
                                  np.asarray(got.lengths))
    np.testing.assert_allclose(np.asarray(base.final_conf),
                               np.asarray(got.final_conf), rtol=0, atol=0)
    h1 = D.beam_search(*args, **kw, record_history=True, opt_cache_segments=1,
                       opt_ancestry=False)
    h3 = D.beam_search(*args, **kw, record_history=True, opt_cache_segments=3,
                       opt_ancestry=False)
    np.testing.assert_array_equal(np.asarray(h1.hist_tokens),
                                  np.asarray(h3.hist_tokens))
    np.testing.assert_array_equal(np.asarray(h1.hist_len),
                                  np.asarray(h3.hist_len))


def test_beam_device_bucketed_parity(setup):
    """Engine step-bucketed beam dispatch returns the same text fields as
    one max-l_cap program over the whole batch (rows never interact)."""
    args, kw, engine = setup
    variables, memp, ctc, tl, conf = args
    base = D.beam_search(*args, **dict(kw, l_cap=64))
    launched = engine.beam_device_bucketed(memp, ctc, np.asarray(tl), conf,
                                           chunk=2)
    got_tokens = {}
    got_len = {}
    for sel, dec in launched:
        tk = np.asarray(dec.tokens)
        ln = np.asarray(dec.lengths)
        for r, i in enumerate(sel):
            got_tokens[int(i)] = tk[r]
            got_len[int(i)] = ln[r]
    bt = np.asarray(base.tokens)
    bl = np.asarray(base.lengths)
    for i in range(bt.shape[0]):
        L = bl[i]
        assert got_len[i] == L
        np.testing.assert_array_equal(got_tokens[i][:L], bt[i, :L])


@pytest.mark.parametrize("l_cap", [16, 64])
def test_ancestry_parity(setup, l_cap):
    """Permute-free beam (opt_ancestry) returns the same beams as the
    cache-permuting loop: same tokens/lengths/finish pattern, scores equal
    up to reduction-order ulps (the V contraction sums over (j, t) instead
    of (t,); every extra term is an exact zero but the association of the
    true terms may differ)."""
    args, kw, _engine = setup
    kw = dict(kw, l_cap=l_cap)
    base = D.beam_search(*args, **kw, opt_ancestry=False)
    got = D.beam_search(*args, **kw, opt_ancestry=True)
    np.testing.assert_array_equal(np.asarray(base.tokens),
                                  np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(base.lengths),
                                  np.asarray(got.lengths))
    np.testing.assert_allclose(np.asarray(base.final_conf),
                               np.asarray(got.final_conf), atol=1e-4)
    h0 = D.beam_search(*args, **kw, record_history=True, opt_ancestry=False)
    h1 = D.beam_search(*args, **kw, record_history=True, opt_ancestry=True)
    np.testing.assert_array_equal(np.asarray(h0.hist_tokens),
                                  np.asarray(h1.hist_tokens))
    np.testing.assert_array_equal(np.asarray(h0.hist_len),
                                  np.asarray(h1.hist_len))


def test_ancestry_streaming_parity(setup):
    """Windowed streaming with the ancestry table resumes across windows
    identically to the permuting streaming loop."""
    args, kw, _engine = setup
    variables, memp, ctc, tl, conf = args
    import jax.numpy as jnp
    outs = []
    for anc_on in (False, True):
        state, cross = D.beam_stream_init(variables, memp, jnp.asarray(tl),
                                          cfg=CFG_TINY, k_beam=3, l_cap=16,
                                          bos_id=kw["bos_id"],
                                          opt_ancestry=anc_on)
        hists = []
        for _ in range(8):
            state, hist, done = D.beam_stream_window(
                variables, state, cross, jnp.asarray(tl), cfg=CFG_TINY,
                k_beam=3, w=4, eos_id=kw["eos_id"],
                unk_dec_id=kw["unk_dec_id"], opt_ancestry=anc_on)
            hists.append({k: np.asarray(v) for k, v in hist.items()})
            if bool(done):
                break
        outs.append((np.asarray(state.tokens), np.asarray(state.lengths),
                     hists))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    assert len(outs[0][2]) == len(outs[1][2])
    for ha, hb in zip(outs[0][2], outs[1][2]):
        np.testing.assert_array_equal(ha["tokens"], hb["tokens"])
        np.testing.assert_array_equal(ha["len"], hb["len"])


def test_stream_window_mode_mismatch_raises(setup):
    """Toggling opt_ancestry mid-stream is a hard error, not silent
    cache corruption (ADVICE r4)."""
    args, kw, _engine = setup
    variables, memp, ctc, tl, conf = args
    import jax.numpy as jnp
    state, cross = D.beam_stream_init(variables, memp, jnp.asarray(tl),
                                      cfg=CFG_TINY, k_beam=3, l_cap=16,
                                      bos_id=kw["bos_id"], opt_ancestry=True)
    with pytest.raises(ValueError, match="opt_ancestry"):
        D.beam_stream_window(variables, state, cross, jnp.asarray(tl),
                             cfg=CFG_TINY, k_beam=3, w=4, eos_id=kw["eos_id"],
                             unk_dec_id=kw["unk_dec_id"], opt_ancestry=False)


def test_unroll_history_identical(setup):
    args, kw, _engine = setup
    base = D.beam_search(*args, **kw, record_history=True, opt_unroll=1,
                         opt_ancestry=False)
    got = D.beam_search(*args, **kw, record_history=True, opt_unroll=4,
                        opt_ancestry=False)
    np.testing.assert_array_equal(np.asarray(base.hist_tokens),
                                  np.asarray(got.hist_tokens))
    np.testing.assert_array_equal(np.asarray(base.hist_len),
                                  np.asarray(got.hist_len))
    np.testing.assert_array_equal(np.asarray(base.hist_finished),
                                  np.asarray(got.hist_finished))
