"""Degradation conditions for detector robustness eval (docsynth.apply_condition)."""
import random

import numpy as np
import pytest

from kiri_tpu.data.docsynth import (CONDITIONS, DocumentGenerator,
                                    apply_condition)


@pytest.fixture(scope="module")
def doc():
    return DocumentGenerator(320, 320, seed=11, augment=False).generate()


@pytest.mark.parametrize("cond", CONDITIONS)
def test_conditions_produce_valid_docs(doc, cond):
    rng = random.Random(3)
    out = apply_condition(doc, cond, rng)
    img = out["image"]
    assert img.dtype == np.uint8 and img.shape == doc["image"].shape
    assert len(out["lines"]) == len(doc["lines"])
    assert out["condition"] == cond
    if cond == "clean":
        np.testing.assert_array_equal(img, doc["image"])


def test_rotation_keeps_text_inside_rotated_boxes(doc):
    """After rotation, dark (text) pixels must still lie inside the union of
    the transformed line boxes — the GT transform matches the image one."""
    rng = random.Random(5)
    out = apply_condition(doc, "rotated", rng)
    img = out["image"]
    mask = np.zeros(img.shape, bool)
    for (x, y, w, h) in out["lines"]:
        # GT boxes are glyph-tight; a few antialiased/descender pixels sit
        # just outside them even pre-rotation, so allow a small pad.
        pad = 6
        mask[max(0, y - pad): y + h + pad, max(0, x - pad): x + w + pad] = True
    dark = img < 100
    inside = float((dark & mask).sum()) / max(1, dark.sum())
    assert inside > 0.99, inside


def test_rotation_each_box_anchored_to_ink(doc):
    """Per-box (not union-of-boxes) check: every rotated line box must
    itself contain ink. The union test above is forgiving — a GT transform
    with the wrong rotation sign still lands inside NEIGHBORING lines'
    padded union (which is how the original sign bug slipped through)."""
    rng = random.Random(7)
    out = apply_condition(doc, "rotated", rng)
    img = np.asarray(out["image"])
    for (x, y, w, h) in out["lines"]:
        crop = img[max(0, y):y + h, max(0, x):x + w]
        assert crop.size
        dark_frac = float((crop < 100).mean())
        assert dark_frac > 0.02, (x, y, w, h, dark_frac)


def test_inverted_flips_polarity(doc):
    out = apply_condition(doc, "inverted", random.Random(0))
    assert float(out["image"].mean()) < 128 < float(doc["image"].mean())


def test_low_contrast_compresses_range(doc):
    out = apply_condition(doc, "low_contrast", random.Random(0))
    assert out["image"].min() >= 60 and out["image"].max() <= 215


def test_forced_layout():
    d = DocumentGenerator(320, 320, seed=2).generate(layout="two_column")
    assert d["layout"] == "two_column"


def test_unknown_condition_raises(doc):
    with pytest.raises(ValueError):
        apply_condition(doc, "underwater", random.Random(0))


def test_rescale_doc_scales_image_and_boxes(doc):
    from kiri_tpu.data.docsynth import rescale_doc

    h, w = doc["image"].shape
    out = rescale_doc(doc, h * 2, w * 2)
    assert out["image"].shape == (h * 2, w * 2)
    assert len(out["lines"]) == len(doc["lines"])
    for (x, y, bw, bh), (x2, y2, bw2, bh2) in zip(doc["lines"], out["lines"]):
        assert abs(x2 - 2 * x) <= 1 and abs(y2 - 2 * y) <= 1
        assert abs(bw2 - 2 * bw) <= 1 and abs(bh2 - 2 * bh) <= 1
    # Ink stays inside the scaled line boxes: each scaled box region must
    # contain dark pixels where the original did.
    for (x, y, bw, bh) in out["lines"][:5]:
        crop = out["image"][y:y + bh, x:x + bw]
        assert crop.size and crop.min() < 200


def test_craft_scale_aug_batch():
    """make_batch with scale_aug produces valid GT at the upscaled size."""
    import numpy as np

    from kiri_tpu.data.docsynth import DocumentGenerator
    from kiri_tpu.detect.craft.train import make_batch

    size = 256
    gen = DocumentGenerator(size, size, seed=3)
    scale_gens = [DocumentGenerator(size // 2, size // 2, seed=4,
                                    fonts=gen.fonts)]
    batch = make_batch(gen, 4, size, aug_conditions=0.5,
                       scale_aug=1.0, scale_gens=scale_gens)
    assert batch["image"].shape == (4, size, size, 1)
    assert batch["region_gt"].shape == (4, size // 2, size // 2)
    assert float(batch["region_gt"].max()) > 0.5
    assert np.isfinite(batch["image"]).all()
