"""Pseudo-glyph font: deterministic Khmer rendering with no host Khmer TTF.

Covers the gap the reference fills with shipped Khmer fonts + tofu routing
(reference: kiri_ocr/generator.py:18-164): on a host with zero Khmer-capable
fonts, the procedural pool must render every Khmer vocab character as a
distinct, reproducible glyph so the bilingual training/benchmark paths work.
"""
import random

import numpy as np
import pytest

from kiri_tpu.data.pseudofont import (N_STYLES, PseudoGlyphFont,
                                      is_pseudo_path, load_pseudo_font,
                                      pseudo_font_paths)
from kiri_tpu.data.synth import (FontManager, MultilingualDatasetGenerator,
                                 sample_khmer_text)
from kiri_tpu.tokenizer import full_charset


def test_pseudo_paths_roundtrip():
    paths = pseudo_font_paths()
    assert len(paths) == N_STYLES
    for p in paths:
        assert is_pseudo_path(p)
        f = load_pseudo_font(p, 32)
        assert isinstance(f, PseudoGlyphFont)
    assert not is_pseudo_path("/usr/share/fonts/foo.ttf")


def test_deterministic_and_distinct_glyphs():
    f = PseudoGlyphFont(32, style=0)
    g = PseudoGlyphFont(32, style=0)
    masks = {}
    for cp in range(0x1780, 0x17A3):  # all consonants
        a = f.render(chr(cp))
        b = g.render(chr(cp))
        assert np.array_equal(a, b), f"nondeterministic glyph U+{cp:04X}"
        assert a.max() > 0, f"blank glyph U+{cp:04X}"
        masks[cp] = a
    # Pairwise distinct (the whole point vs a tofu box).
    keys = list(masks)
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            if masks[keys[i]].shape == masks[keys[j]].shape:
                assert not np.array_equal(masks[keys[i]], masks[keys[j]]), \
                    f"identical glyphs U+{keys[i]:04X} and U+{keys[j]:04X}"


def test_every_khmer_vocab_char_renders():
    """Every Khmer char in the full target charset renders non-blank."""
    f = PseudoGlyphFont(32)
    for ch in full_charset(include_khmer=True):
        if ord(ch) < 0x1780:
            continue
        assert f.render(ch).max() > 0, f"blank render U+{ord(ch):04X}"


def test_cluster_layout():
    """Above/below marks attach to the preceding base without advancing."""
    f = PseudoGlyphFont(32)
    base = "ក"
    above = "កិ"   # U+17B7 above vowel
    below = "កុ"   # U+17BB below vowel
    right = "កា"   # U+17B6 spacing vowel
    assert f.getlength(above) == f.getlength(base)
    assert f.getlength(below) == f.getlength(base)
    assert f.getlength(right) > f.getlength(base)
    body_y = f._body_y
    a = f.render(above)
    assert a[:body_y].max() > 0, "above mark missing above the body"
    b = f.render(below)
    assert b[f._below_y:].max() > 0, "below mark missing below the body"


def test_getbbox_contract():
    """getbbox matches the FreeTypeFont usage in the generators."""
    f = PseudoGlyphFont(28)
    text = "កខគ ឃ"
    l, t, r, b = f.getbbox(text)
    assert l == 0 and t == 0
    assert r == f.getlength(text)
    assert b == f._height > 0
    # Prefix advances are monotonic (docsynth char boxes rely on this).
    prev = 0
    for i in range(1, len(text) + 1):
        cur = f.getbbox(text[:i])[2]
        assert cur >= prev
        prev = cur


def test_draw_text_integration():
    """ImageDraw.text renders through the getmask protocol."""
    from PIL import Image, ImageDraw

    f = PseudoGlyphFont(32)
    img = Image.new("L", (400, 60), 255)
    ImageDraw.Draw(img).text((5, 5), "កា ខិ គុ", fill=0, font=f)
    arr = np.asarray(img)
    assert (arr < 128).sum() > 50, "pseudo font drew nothing via draw.text"


def test_fontmanager_registers_pseudo_pool():
    fm = FontManager()
    assert fm.khmer_fonts, "khmer pool empty despite pseudo fallback"
    font = fm.get(fm.khmer_fonts[0], 32)
    rng = random.Random(0)
    picked = fm.pick("កខគ", rng)
    assert picked is not None
    path, _ = picked
    assert path in fm.khmer_fonts
    assert font.getbbox("ក")[2] > 0


def test_multilingual_generator_produces_khmer(tmp_path):
    gen = MultilingualDatasetGenerator(str(tmp_path), khmer_ratio=1.0, seed=3)
    assert gen.khmer_ratio == 1.0, "khmer_ratio degraded despite pseudo pool"
    samples = gen.generate_samples(5)
    assert len(samples) == 5
    for s in samples:
        assert any(0x1780 <= ord(c) <= 0x17FF for c in s["text"])
        img = s["image"]
        assert img.dtype == np.uint8 and img.shape[0] == 48
        assert img.min() < 128, "no dark text pixels in rendered Khmer line"


def test_generate_dataset_writes_khmer(tmp_path):
    """The disk path (CLI `generate --khmer-ratio`) emits Khmer labels too."""
    gen = MultilingualDatasetGenerator(str(tmp_path), khmer_ratio=1.0, seed=4)
    labels = gen.generate_dataset(4)
    lines = open(labels, encoding="utf-8").read().splitlines()
    assert len(lines) == 4
    assert all(any(0x1780 <= ord(c) <= 0x17FF for c in ln.split("\t", 1)[1])
               for ln in lines)


def test_document_generator_khmer(tmp_path):
    from kiri_tpu.data.docsynth import DocumentGenerator

    gen = DocumentGenerator(320, 320, seed=5, khmer_ratio=1.0)
    doc = gen.generate()
    assert doc["texts"], "no lines drawn"
    assert any(any(0x1780 <= ord(c) <= 0x17FF for c in t)
               for t in doc["texts"])
    assert doc["image"].min() < 200


def test_sample_khmer_text_mixes_scripts():
    rng = random.Random(7)
    texts = [sample_khmer_text(rng, 4, 8, mixed_ratio=0.5) for _ in range(20)]
    assert any(any(c.isascii() and c.isalpha() for c in t) for t in texts)
    assert all(any(0x1780 <= ord(c) <= 0x17FF for c in t) for t in texts)


def test_sign_boost_raises_diacritic_density():
    """sign_boost oversamples above-base marks (the flagship's residual
    confusion class, ំ<->ិ / dropped ៊ ័ ៌  — eval_recognizer --dump-errors)."""
    rng = random.Random(1)
    signs = set("ំះៈ៉៊់៌៍៎៏័")

    def density(vowel_p, sign_p):
        txt = "".join(sample_khmer_text(rng, 4, 8, vowel_p=vowel_p,
                                        sign_p=sign_p) for _ in range(150))
        return sum(c in signs for c in txt) / max(1, len(txt))

    assert density(0.75, 0.50) > 1.5 * density(0.55, 0.18)


def test_generator_sign_boost_plumbing(tmp_path):
    gen = MultilingualDatasetGenerator(str(tmp_path), khmer_ratio=1.0,
                                       sign_boost=1.0)
    signs = set("ំះៈ៉៊់៌៍៎៏័")
    texts = [gen._sample_line(4, 8) for _ in range(60)]
    dens = sum(c in signs for t in texts for c in t) / sum(len(t) for t in texts)
    assert dens > 0.10, dens


def test_doc_crop_aug_conditions():
    """Degraded doc-crop training samples: right count, real degradation."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from train_recognizer import doc_crop_samples

    clean = doc_crop_samples(16, 0.3, seed=7100, aug_conditions=0.0)
    noisy = doc_crop_samples(16, 0.3, seed=7100, aug_conditions=1.0)
    assert len(clean) == len(noisy) == 16
    assert all(c["text"].strip() for c in noisy)
    # Degradations change the crops (pixels, or shapes via the shared rng).
    diff = sum(c["image"].shape != n["image"].shape
               or not np.array_equal(c["image"], n["image"])
               for c, n in zip(clean, noisy))
    assert diff >= 8, diff


def test_doc_crop_resample_aug_runs():
    """The 'resample' doc-crop condition (rotate + rotate-back, modeling
    deskewed serving of rotated scans) must keep texts/boxes usable."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import train_recognizer as tr

    n = 24
    out = tr.doc_crop_samples(n, 0.3, seed=9300, aug_conditions=1.0)
    assert len(out) == n
    assert all(o["text"].strip() and o["image"].size for o in out)
