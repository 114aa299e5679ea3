"""Real-TTF Khmer ingestion path, gated on font availability.

No Khmer-capable TTF ships with this image, so the flagship is trained on
the procedural pseudo-font (kiri_tpu/data/pseudofont.py). These tests prove
the REAL-font path end-to-end the moment a Khmer TTF lands on the host
(reference: kiri_ocr/generator.py:118-164): discovery + tofu rejection,
cluster shaping through PIL, dataset generation, and pipeline ingestion.

The non-gated tests exercise the same machinery with DejaVu (Latin) plus
the tofu-detection negative case, so the gate logic itself is always
covered.
"""
import random
from pathlib import Path

import numpy as np
import pytest

from kiri_tpu.data.synth import (FontManager, ImageRenderer, _is_khmer,
                                 sample_khmer_text, sample_khmer_word)


def _real_khmer_fonts():
    """Khmer-capable real TTFs on this host (excludes the pseudo-font)."""
    pool = FontManager(allow_pseudo=False)
    return pool.khmer_fonts


needs_khmer_ttf = pytest.mark.skipif(
    not _real_khmer_fonts(), reason="no Khmer-capable TTF on this host")


# ------------------------------------------------------------ always-run part
def test_gate_detects_absence_and_pseudo_fallback():
    """Discovery must classify DejaVu as non-Khmer (tofu detection) and the
    pseudo-font fallback must engage exactly when no real font exists."""
    real = FontManager(allow_pseudo=False)
    # Any font claiming Khmer support here must actually render distinct
    # glyphs for distinct Khmer consonants (tofu check inside _supports).
    for f in real.khmer_fonts:
        assert real._supports(f, "កខគ")

    pseudo = FontManager(allow_pseudo=True)
    assert pseudo.khmer_fonts, "pseudo fallback must provide Khmer rendering"
    if not real.khmer_fonts:
        from kiri_tpu.data.pseudofont import pseudo_font_paths

        assert set(pseudo.khmer_fonts) == set(pseudo_font_paths())


def test_khmer_sampler_produces_khmer_clusters():
    rng = random.Random(0)
    for _ in range(20):
        w = sample_khmer_word(rng)
        assert w and _is_khmer(w)
    text = sample_khmer_text(rng, 2, 5)
    assert _is_khmer(text)


# ------------------------------------------------------- gated real-TTF part
@needs_khmer_ttf
def test_real_ttf_renders_distinct_clusters():
    """Coeng-stacked clusters must render, differ from each other, and
    differ from their base consonants (shaping actually happened)."""
    pool = FontManager(allow_pseudo=False)
    renderer = ImageRenderer(height=48, augment=False)
    rng = random.Random(0)
    font = pool.get(pool.khmer_fonts[0], 32)

    base = renderer.render("កា", font, rng)          # ka + aa
    stacked = renderer.render("ក្រា", font, rng)  # + coeng ro
    other = renderer.render("ខា", font, rng)
    assert base.shape[0] == 48 and stacked.shape[0] == 48
    for a, b in [(base, stacked), (base, other)]:
        wmin = min(a.shape[1], b.shape[1])
        assert (a.shape[1] != b.shape[1]
                or np.abs(a[:, :wmin].astype(int)
                          - b[:, :wmin].astype(int)).mean() > 1.0)


@needs_khmer_ttf
def test_real_ttf_dataset_and_pipeline_end_to_end(tmp_path):
    """Generate a real-TTF Khmer dataset and push one line through the
    recognizer engine (random weights: shapes/plumbing, not accuracy)."""
    import jax

    from kiri_tpu.config import CFG
    from kiri_tpu.data.synth import MultilingualDatasetGenerator
    from kiri_tpu.engine import RecognizerEngine
    from kiri_tpu.models.recognizer import init_recognizer
    from kiri_tpu.ops.preprocess import resize_keep_ratio_pad_np
    from kiri_tpu.tokenizer import CharTokenizer, build_vocab_from_texts

    gen = MultilingualDatasetGenerator(
        str(tmp_path), augment=False, fonts=FontManager(allow_pseudo=False))
    texts = [sample_khmer_text(random.Random(i), 1, 3) for i in range(4)]
    samples = gen.generate_samples(4, texts=texts)
    assert len(samples) == 4
    assert all(_is_khmer(s["text"]) for s in samples)

    vp = tmp_path / "vocab.json"
    build_vocab_from_texts([s["text"] for s in samples], str(vp))
    cfg = CFG(ENC_DIM=32, ENC_LAYERS=1, ENC_FF=64, ENC_HEADS=2,
              DEC_DIM=32, DEC_LAYERS=1, DEC_FF=64, DEC_HEADS=2,
              COMPUTE_DTYPE="float32")
    tok = CharTokenizer(str(vp), cfg)
    variables = init_recognizer(jax.random.PRNGKey(0), cfg, tok)
    engine = RecognizerEngine(variables, cfg, tok)
    imgs = np.stack([resize_keep_ratio_pad_np(s["image"], cfg.IMG_H, 160)
                     for s in samples])
    out = engine.recognize_batch(imgs, "ctc")
    assert len(out) == 4 and all(isinstance(t, str) for t, _ in out)
