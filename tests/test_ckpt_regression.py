"""Committed-checkpoint CER regression gate (VERDICT r4 #3).

Round 4 upgraded the Khmer pseudo-font to real shaping (coeng subscripts,
pre-base vowel reordering; data/pseudofont.py) without retraining the
committed flagship — every decode mode silently collapsed to CER 0.22+ on
the repo's own Khmer rendering, and no test caught it because the only
trained-checkpoint accuracy assertion averaged Khmer and English together.

This gate renders held-out lines with the CURRENT generators (so any future
rendering change is automatically covered) and asserts per-script CER
thresholds against the committed checkpoint, per decode mode. If a
rendering/generator change invalidates the model, these tests fail at
commit time instead of shipping a collapsed checkpoint.

Reference benchmark context: the reference's harness is 100% Khmer fonts
(reference benchmark/generate_bench_data.py:26-37) with published average
CER 0.0205 (benchmark/benchmark_table.png); the thresholds here are ~4x
tighter than that baseline but leave headroom over the committed model's
measured held-out CER (~0.002-0.006).
"""
from __future__ import annotations

import json
import unicodedata
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
MODELS = REPO / "models"

pytestmark = pytest.mark.skipif(
    not (MODELS / "model.safetensors").exists(),
    reason="committed flagship checkpoint not present")


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for x, ca in enumerate(a, 1):
        cur = [x]
        for y, cb in enumerate(b, 1):
            cur.append(min(prev[y] + 1, cur[y - 1] + 1,
                           prev[y - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _model_has_khmer() -> bool:
    vp = MODELS / "vocab.json"
    if not vp.exists():
        return False
    vocab = json.loads(vp.read_text())
    toks = vocab if isinstance(vocab, list) else list(vocab)
    return any(len(t) == 1 and 0x1780 <= ord(t) <= 0x17FF for t in toks)


@pytest.fixture(scope="module")
def held_out():
    """(engine-ready images, widths, texts, is_khmer) rendered with the
    current generators at a seed disjoint from every training run."""
    if not _model_has_khmer():
        pytest.skip("committed model has no Khmer vocab")
    import random

    from kiri_tpu.data.synth import (DatasetGenerator, sample_khmer_text,
                                     sample_text)
    from kiri_tpu.ops.preprocess import (content_width,
                                         resize_keep_ratio_pad_np)
    from kiri_tpu.pipeline import OCR

    ocr = OCR(str(MODELS / "model.safetensors"))
    cfg = ocr.cfg
    rng = random.Random(424242)
    charset = "".join(t for t in ocr.tokenizer.token_to_id if len(t) == 1
                      and t.isascii() and t.isprintable())
    texts = ([sample_khmer_text(rng, 2, 4) for _ in range(24)]
             + [sample_text(rng, 2, 5, charset) for _ in range(12)])
    import tempfile

    gen = DatasetGenerator(tempfile.mkdtemp(prefix="kiri_gate_"),
                           height=cfg.IMG_H, augment=False, seed=424242)
    samples = gen.generate_samples(len(texts), texts=texts)
    texts = [s["text"] for s in samples]
    widths = np.asarray([
        content_width(s["image"].shape, cfg.IMG_H, cfg.IMG_W)
        for s in samples], np.int32)
    imgs = np.stack([resize_keep_ratio_pad_np(s["image"], cfg.IMG_H,
                                              cfg.IMG_W) for s in samples])
    is_khmer = [any(0x1780 <= ord(c) <= 0x17FF for c in t) for t in texts]
    assert sum(is_khmer) >= 16, "held-out set lost its Khmer lines"
    return ocr.engine, imgs, widths, texts, is_khmer


def _split_cer(texts, outs, is_khmer):
    def cer(pairs):
        if not pairs:
            return float("nan")
        return float(np.mean([
            _lev(unicodedata.normalize("NFC", t),
                 unicodedata.normalize("NFC", o)) / max(1, len(t))
            for t, o in pairs]))

    kh = [(t, o[0]) for t, o, k in zip(texts, outs, is_khmer) if k]
    en = [(t, o[0]) for t, o, k in zip(texts, outs, is_khmer) if not k]
    return cer(kh), cer(en)


@pytest.mark.parametrize("method,kh_max,en_max", [
    ("ctc", 0.02, 0.02),
    ("decoder", 0.03, 0.03),
    ("beam", 0.02, 0.02),
])
def test_committed_ckpt_per_script_cer(held_out, method, kh_max, en_max):
    engine, imgs, widths, texts, is_khmer = held_out
    outs = engine.recognize_batch(imgs, method, widths=widths)
    kh_cer, en_cer = _split_cer(texts, outs, is_khmer)
    assert kh_cer <= kh_max, (
        f"{method}: Khmer CER {kh_cer:.4f} > {kh_max} — the committed "
        "checkpoint no longer reads the repo's own Khmer rendering "
        "(rendering/generator change without retrain?)")
    assert en_cer <= en_max, (
        f"{method}: English CER {en_cer:.4f} > {en_max}")
