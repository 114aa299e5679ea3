"""Certificate-gated speculative beam parity (ops/decode.beam_spec_certificate).

The contract is text identity: ``engine.beam_device_spec`` (spec decode +
certificate pass + step-loop fallback) must return exactly the texts the
step-loop beam returns, on every line — certified lines by the soundness
proof, uncertified lines because they run the real beam. Covered here on
three input regimes: random-weight garbage (fallback-dominated), the
trained flagship on clean rendered lines (certificate-dominated), and the
flagship on degraded lines (mixed).

Reference counterpart of the baseline semantics: kiri_ocr/model.py:390-600
(beam_search_decode); the certificate itself has no reference analogue.
"""
import json
from pathlib import Path

import jax
import numpy as np
import pytest

from kiri_tpu.config import CFG
from kiri_tpu.engine import RecognizerEngine
from kiri_tpu.models import recognizer as R
from kiri_tpu.ops import decode as D
from kiri_tpu.tokenizer import CharTokenizer

MODELS = Path(__file__).resolve().parents[1] / "models"
HAVE_REC = (MODELS / "model.safetensors").exists()

CFG_TINY = CFG(ENC_DIM=32, ENC_LAYERS=1, ENC_FF=64, ENC_HEADS=4,
               DEC_DIM=32, DEC_LAYERS=1, DEC_FF=64, DEC_HEADS=4,
               IMG_H=48, IMG_W=160, COMPUTE_DTYPE="float32",
               BATCH_BUCKETS=(1, 2, 4, 8), STEP_BUCKETS=(16, 32, 64))


def _texts(engine, launched):
    """launched [(rows, DecodeOut)] -> text per absolute row."""
    n = sum(len(sel) for sel, _ in launched)
    out = [""] * n
    for sel, dec in launched:
        txts, _, _, _ = engine._decode_texts(dec, len(sel))
        for r, i in enumerate(sel):
            out[int(i)] = txts[r]
    return out


@pytest.fixture(scope="module")
def tiny():
    vocab = {"<unk>": 0}
    for i, ch in enumerate("abcde "):
        vocab[ch] = i + 1
    import tempfile
    vp = Path(tempfile.mkdtemp()) / "vocab.json"
    vp.write_text(json.dumps(vocab))
    tok = CharTokenizer(str(vp), CFG_TINY)
    variables = R.init_recognizer(jax.random.PRNGKey(0), CFG_TINY, tok)
    return RecognizerEngine(variables, CFG_TINY, tok)


def test_spec_beam_random_weights_parity(tiny):
    """Random weights + noise images: certificates overwhelmingly fail, the
    fallback path must reproduce the step-loop beam exactly."""
    imgs = np.random.default_rng(1).integers(0, 255, (6, 48, 160), np.uint8)
    memp, ctc, ids, conf, est, n = tiny.encode_batch(imgs)
    est_np = np.asarray(est)
    base = _texts(tiny, tiny.beam_device_bucketed(memp, ctc, est_np, conf))
    got = _texts(tiny, tiny.beam_device_spec(memp, ctc, ids, est_np, conf))
    assert got == base


def test_spec_beam_recognize_batch_flag(tiny):
    """recognize_batch beam output is unchanged by the SPEC_BEAM flag."""
    imgs = np.random.default_rng(2).integers(0, 255, (4, 48, 160), np.uint8)
    base = tiny.recognize_batch(imgs, "beam")
    object.__setattr__(tiny.cfg, "SPEC_BEAM", True)
    try:
        got = tiny.recognize_batch(imgs, "beam")
    finally:
        object.__setattr__(tiny.cfg, "SPEC_BEAM", False)
    assert [t for t, _ in got] == [t for t, _ in base]


@pytest.mark.skipif(not HAVE_REC, reason="trained recognizer not present")
class TestFlagship:
    @pytest.fixture(scope="class")
    def setup(self):
        from kiri_tpu.data.synth import (MultilingualDatasetGenerator,
                                         sample_text)
        import random
        import tempfile

        from kiri_tpu.train.checkpoints import load_checkpoint

        variables, cfg, _ = load_checkpoint(str(MODELS / "model.safetensors"))
        tok = CharTokenizer(str(MODELS / "vocab.json"), cfg)
        engine = RecognizerEngine(variables, cfg, tok)
        gen = MultilingualDatasetGenerator(
            tempfile.mkdtemp(), height=cfg.IMG_H, augment=False,
            khmer_ratio=0.5, seed=99)
        samples = gen.generate_samples(24, max_width=cfg.IMG_W)
        from kiri_tpu.ops.preprocess import (content_width,
                                             resize_keep_ratio_pad_np)
        imgs = np.stack([
            resize_keep_ratio_pad_np(s["image"], cfg.IMG_H, cfg.IMG_W)
            for s in samples])
        return engine, imgs

    def test_clean_lines_parity_and_cert_rate(self, setup):
        engine, imgs = setup
        memp, ctc, ids, conf, est, n = engine.encode_batch(imgs)
        est_np = np.asarray(est)
        base = _texts(engine,
                      engine.beam_device_bucketed(memp, ctc, est_np, conf))
        launched = engine.beam_device_spec(memp, ctc, ids, est_np, conf)
        got = _texts(engine, launched)
        assert got == base
        # Documented null result (see CFG.SPEC_BEAM): with LM fusion on,
        # the sound competitor bounds never certify — every line falls
        # back, and parity above is carried by the fallback. No assertion
        # on the certification rate: a future low-entropy LM head may
        # legitimately start certifying lines.

    def test_degraded_lines_parity(self, setup):
        engine, imgs = setup
        rng = np.random.default_rng(3)
        noisy = np.clip(imgs.astype(np.float32)
                        + rng.normal(0, 40, imgs.shape), 0, 255
                        ).astype(np.uint8)
        memp, ctc, ids, conf, est, n = engine.encode_batch(noisy)
        est_np = np.asarray(est)
        base = _texts(engine,
                      engine.beam_device_bucketed(memp, ctc, est_np, conf))
        got = _texts(engine,
                     engine.beam_device_spec(memp, ctc, ids, est_np, conf))
        assert got == base
