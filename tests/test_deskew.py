"""Deskew stage: skew estimation, box mapping, and facade integration.

The reference has no deskew (it leans on cv2.minAreaRect quads,
reference detector/db/model.py:163,391); this is a first-party robustness
stage, so the tests define its contract: recover docsynth's 'rotated'
condition angles (2-6 deg, data/docsynth.py:48-53) to within a few tenths
of a degree and keep line recall high through the facade.
"""
from __future__ import annotations

import random

import numpy as np
import pytest

from kiri_tpu.data.docsynth import DocumentGenerator, apply_condition
from kiri_tpu.detect.deskew import boxes_to_original, estimate_skew, rotate_image


def _rotated_doc(seed: int, angle_sign: float = 1.0):
    rng = random.Random(seed)
    doc = DocumentGenerator(640, 640, seed=seed, khmer_ratio=0.0).generate()
    # Re-implement the 'rotated' condition with a KNOWN angle.
    angle = rng.uniform(2.0, 6.0) * angle_sign
    img = rotate_image(np.asarray(doc["image"], np.uint8), angle)
    return img, angle, doc


@pytest.mark.parametrize("seed,sign", [(11, 1.0), (23, -1.0), (37, 1.0)])
def test_estimate_skew_recovers_angle(seed, sign):
    img, angle, _ = _rotated_doc(seed, sign)
    est = estimate_skew(img)
    assert abs(est - angle) < 0.35, (est, angle)


def test_estimate_skew_upright_is_near_zero():
    doc = DocumentGenerator(640, 640, seed=3, khmer_ratio=0.3).generate()
    assert abs(estimate_skew(doc["image"])) < 0.35


def test_estimate_skew_polarity_invariant():
    img, angle, _ = _rotated_doc(51)
    est_inv = estimate_skew(255 - img)
    assert abs(est_inv - angle) < 0.35


def test_estimate_skew_blank_page():
    assert estimate_skew(np.full((480, 640), 255, np.uint8)) == 0.0


def test_no_false_positive_on_hard_upright_pages():
    """The measured estimator failure modes must stay gated: a two-column
    page with unaligned rows (half-consistency gate) and a sparse 5-line
    page whose rows overlap at ~8deg (trust-bound gate)."""
    for seed in (5004, 5011):  # the two docs that broke the ungated estimator
        doc = DocumentGenerator(640, 640, seed=seed, khmer_ratio=0.0).generate()
        assert abs(estimate_skew(doc["image"])) < 1.0


def test_boxes_round_trip():
    """Boxes found on the deskewed frame map back onto the rotated GT."""
    rng = random.Random(77)
    doc = DocumentGenerator(640, 640, seed=77, khmer_ratio=0.0).generate()
    rot = apply_condition(doc, "rotated", rng)  # GT boxes transformed too
    angle = estimate_skew(rot["image"])
    # Detect nothing — just map the ORIGINAL upright GT boxes (what a
    # perfect detector would find on the deskewed image) back.
    mapped = boxes_to_original(doc["lines"], angle,
                               np.asarray(rot["image"]).shape)
    for (mx, my, mw, mh), (gx, gy, gw, gh) in zip(mapped, rot["lines"]):
        # Axis-aligned hulls of the same rotated content: centers align.
        assert abs((mx + mw / 2) - (gx + gw / 2)) < 6
        assert abs((my + mh / 2) - (gy + gh / 2)) < 6


def test_facade_deskew_recall_on_rotated_docs():
    """Legacy backend (CPU) + deskew recovers lines on rotated pages."""
    from kiri_tpu.detect import TextDetector

    det = TextDetector(method="legacy", deskew=True)
    rng = random.Random(5)
    hits = total = 0
    for seed in (101, 202):
        doc = DocumentGenerator(640, 640, seed=seed, khmer_ratio=0.0).generate()
        rot = apply_condition(doc, "rotated", rng)
        boxes = det.detect_lines_objects(np.asarray(rot["image"], np.uint8))
        assert abs(det.last_skew_angle - rot.get("angle", det.last_skew_angle)) < 1.0
        total += len(rot["lines"])
        for (gx, gy, gw, gh) in rot["lines"]:
            cx, cy = gx + gw / 2, gy + gh / 2
            hits += any(b.x <= cx <= b.x + b.width
                        and b.y <= cy <= b.y + b.height for b in boxes)
    assert hits / total >= 0.85, (hits, total)


def test_pipeline_recognizes_from_deskewed_frame():
    """End-to-end: on a rotated page the pipeline must crop UPRIGHT text
    (from the detector's deskewed frame), not skewed input-frame crops —
    measured cost of the latter is ~60x CER. Uses the trained flagship."""
    from pathlib import Path

    if not Path("models/model.safetensors").exists():
        pytest.skip("trained flagship not present")
    from kiri_tpu import OCR

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    ocr = OCR(decode_method="fast", det_method="legacy", deskew=True)
    doc = DocumentGenerator(480, 480, seed=313, khmer_ratio=0.0).generate()
    rot = apply_condition(doc, "rotated", random.Random(4))
    results = ocr.process_document(np.asarray(rot["image"], np.uint8))
    assert abs(ocr.detector.last_skew_angle) >= 1.0, "deskew did not fire"
    gt = "\n".join(doc["texts"])
    hyp = "\n".join(r["text"] for r in results)
    cer = lev(hyp, gt) / max(1, len(gt))
    assert cer < 0.25, (cer, hyp[:80])
    # Reported boxes stay in input-frame coordinates: each must cover its
    # (rotated-frame) GT center.
    hits = 0
    for (gx, gy, gw, gh) in rot["lines"]:
        cx, cy = gx + gw / 2, gy + gh / 2
        hits += any(x <= cx <= x + w and y <= cy <= y + h
                    for (x, y, w, h) in (r["box"] for r in results))
    assert hits >= 0.8 * len(rot["lines"])


def test_facade_deskew_noop_on_upright():
    from kiri_tpu.detect import TextDetector

    doc = DocumentGenerator(640, 640, seed=9, khmer_ratio=0.0).generate()
    img = np.asarray(doc["image"], np.uint8)
    plain = TextDetector(method="legacy").detect_lines_objects(img)
    desk = TextDetector(method="legacy", deskew=True).detect_lines_objects(img)
    assert [b.bbox for b in plain] == [b.bbox for b in desk]


def test_eval_pipeline_reading_order():
    """Two-column GT (emitted per-column by the generator) must be re-sorted
    into y-band reading order — the same order the facade emits — before
    doc-level CER, or column interleave charges ~0.3 CER of ordering noise."""
    from kiri_tpu.evalpage import reading_order

    # column-major GT: left column rows 1..3, then right column rows 1..3
    items = [((10, 10, 100, 20), "L1"), ((10, 40, 100, 20), "L2"),
             ((10, 70, 100, 20), "L3"),
             ((200, 12, 100, 20), "R1"), ((200, 41, 100, 20), "R2"),
             ((200, 71, 100, 20), "R3")]
    ordered = [t for _, t in reading_order(items)]
    assert ordered == ["L1", "R1", "L2", "R2", "L3", "R3"]
    assert reading_order([]) == []


def test_extract_crop_single_resample_geometry():
    """The one-warp extraction must reproduce the two-step crop's content
    (same geometry) while preserving MORE stroke contrast at document
    scale — the whole point of skipping the intermediate raster."""
    from kiri_tpu.detect.deskew import extract_crop_single_resample
    from kiri_tpu.ops.preprocess import crop_region, resize_keep_ratio_pad_np

    up = np.full((200, 500), 255, np.uint8)
    for x in range(20, 470, 5):        # 2px strokes = glyph-scale detail
        up[60:78, x:x + 2] = 0
    angle = 4.0
    rot = rotate_image(up, angle)              # "captured" rotated page
    desk = rotate_image(rot, -angle)           # serve-side deskew
    box = (15, 55, 460, 24)

    one = extract_crop_single_resample(rot, angle, box, 48, extra_padding=5)
    assert one is not None and one.shape[0] == 48
    two = resize_keep_ratio_pad_np(crop_region(desk, box, 5), 48, 1024)
    clean = resize_keep_ratio_pad_np(crop_region(up, box, 5), 48, 1024)
    w = min(one.shape[1], two.shape[1], clean.shape[1])
    a, b, c = (x[:, :w].astype(np.float32) for x in (one, clean, two))
    # Same content: close to the clean oracle everywhere.
    assert np.abs(a - b).mean() < 20.0
    # Sharper than the two-step path: stroke floor stays black and the
    # gradient energy matches the clean crop, not the blurred one.
    assert np.percentile(a, 5) <= np.percentile(c, 5)
    g = lambda x: float(np.abs(np.diff(x, axis=1)).mean())
    assert g(a) >= g(c)
    assert abs(g(a) - g(b)) < 0.2 * g(b)


def test_extract_crop_single_resample_guards():
    from kiri_tpu.detect.deskew import extract_crop_single_resample

    page = np.full((100, 100), 255, np.uint8)
    # Empty box -> None.
    assert extract_crop_single_resample(page, 3.0, (50, 120, 10, 10), 48) is None
    # Strong downscale (padded_h >> out_h / min_scale) -> None (two-step
    # path keeps its area-averaging resize).
    assert extract_crop_single_resample(page, 3.0, (0, 0, 90, 90), 48) is None


def test_cut_crops_single_resample_provenance():
    """On a deskewed page, _cut_crops samples upscaled crops straight from
    the original (sharpen=False) and falls back to the deskewed frame
    (sharpen=True) for crops the warp would downscale hard."""
    from pathlib import Path

    if not Path("models/model.safetensors").exists():
        pytest.skip("trained flagship not present")
    from kiri_tpu import OCR
    from kiri_tpu.detect.deskew import extract_crop_single_resample

    ocr = OCR(decode_method="fast", det_method="legacy", deskew=True)
    doc = DocumentGenerator(480, 480, seed=313, khmer_ratio=0.0).generate()
    rot = apply_condition(doc, "rotated", random.Random(4))
    img = np.asarray(rot["image"], np.uint8)
    boxes, _ = ocr._detect_boxes(img, "lines")
    assert ocr.detector.last_deskew_angle != 0.0
    crops, kept, sharpen = ocr._cut_crops(img, boxes)
    assert len(crops) == len(kept) == len(sharpen)
    # docsynth lines are ~16-40px -> every crop upscales to 48: all rows
    # take the single-resample path.
    assert sharpen and not any(sharpen)
    assert all(c.shape[0] == ocr.cfg.IMG_H for c in crops)
    # With the knob off, the two-step path marks every crop resampled.
    ocr.deskew_single_resample = False
    boxes2, _ = ocr._detect_boxes(img, "lines")
    _, _, sharpen2 = ocr._cut_crops(img, boxes2)
    assert sharpen2 and all(sharpen2)


def test_cut_crops_noisy_page_despikes_and_warps_linear():
    """With enhance on, a NOISY rotated page must be despiked at native
    scale and warped with linear interpolation (the upright-noisy
    treatment); a clean rotated page must stay bit-identical to the
    enhance=False crop path (the sigma gate fails)."""
    from pathlib import Path

    if not Path("models/model.safetensors").exists():
        pytest.skip("trained flagship not present")
    cv2 = pytest.importorskip("cv2")
    from kiri_tpu import OCR
    from kiri_tpu.detect.deskew import extract_crop_single_resample
    from kiri_tpu.ops.preprocess import _despike

    ocr = OCR(decode_method="fast", det_method="legacy", deskew=True,
              enhance=True)
    doc = DocumentGenerator(480, 480, seed=909, khmer_ratio=0.0).generate()
    rng = random.Random(11)
    rot = apply_condition(doc, "rotated", rng)
    noisy = apply_condition(rot, "noisy", rng)
    img = np.asarray(noisy["image"], np.uint8)
    boxes, _ = ocr._detect_boxes(img, "lines")
    angle = ocr.detector.last_deskew_angle
    assert angle != 0.0
    crops, kept, _ = ocr._cut_crops(img, boxes)
    assert crops
    # Reproduce the expected treatment: despiked source, linear warp.
    src = np.clip(_despike(img.astype(np.float32)), 0, 255).astype(np.uint8)
    fill = int(np.median(img))
    _, crop_boxes = ocr._deskew_crop_view(img, boxes)
    want = extract_crop_single_resample(
        src, angle, crop_boxes[kept[0]], ocr.cfg.IMG_H, fill=fill,
        interp=cv2.INTER_LINEAR)
    assert np.array_equal(crops[0], want)
    # And NOT the raw cubic warp of the noisy page.
    raw = extract_crop_single_resample(
        img, angle, crop_boxes[kept[0]], ocr.cfg.IMG_H, fill=fill)
    assert not np.array_equal(crops[0], raw)

    # Clean rotated page: enhance must not perturb the crop cut.
    img_c = np.asarray(rot["image"], np.uint8)
    boxes_c, _ = ocr._detect_boxes(img_c, "lines")
    crops_c, _, _ = ocr._cut_crops(img_c, boxes_c)
    ocr_plain = OCR(decode_method="fast", det_method="legacy", deskew=True)
    boxes_p, _ = ocr_plain._detect_boxes(img_c, "lines")
    crops_p, _, _ = ocr_plain._cut_crops(img_c, boxes_p)
    assert len(crops_c) == len(crops_p)
    assert all(np.array_equal(a, b) for a, b in zip(crops_c, crops_p))


def test_assemble_text_groups_by_deskewed_frame():
    """Input-frame hulls on a rotated page grow ~w*sin(a) and merge adjacent
    text lines into one space-joined group; the deskewed-frame twins must
    restore the upright grouping (one transcript line per text line)."""
    from kiri_tpu.pipeline import OCR

    # Two stacked 400px-wide lines at 4deg: hull heights ~ 22 + 400*sin(4deg)
    # ~ 50px overlap vertically -> reference grouping joins them.
    results = [
        {"box": [10, 20, 400, 50], "text": "first", "line_number": 1},
        {"box": [10, 52, 400, 50], "text": "second", "line_number": 2},
    ]
    merged = OCR._assemble_text(results)
    assert merged == "first second"        # the hull failure mode
    twins = [(10, 20, 400, 22), (10, 80, 400, 22)]
    split = OCR._assemble_text(results, OCR._align_twins(twins, results))
    assert split == "first\nsecond"


def test_extract_text_rotated_uses_deskewed_grouping():
    """End-to-end: extract_text on a rotated page must emit one transcript
    line per text line, not hull-merged space-joined groups."""
    from pathlib import Path

    if not Path("models/model.safetensors").exists():
        pytest.skip("trained flagship not present")
    from kiri_tpu import OCR

    ocr = OCR(decode_method="fast", det_method="legacy", deskew=True)
    doc = DocumentGenerator(480, 480, seed=313, khmer_ratio=0.0).generate()
    rot = apply_condition(doc, "rotated", random.Random(4))
    text, results = ocr.extract_text(np.asarray(rot["image"], np.uint8))
    assert ocr.detector.last_deskew_angle != 0.0
    # Every batch row got its own transcript line (docsynth single-column
    # pages have no side-by-side regions).
    assert len(text.split("\n")) == len(results)


def test_pooled_documents_deskew_matches_single():
    """process_documents must restore each page's deskew state (frame,
    twins, APPLIED angle) before cutting crops: results and batch
    transcripts on a [rotated, upright] pair must match the per-page API,
    through the batched DB dispatch path."""
    from pathlib import Path

    if not (Path("models/model.safetensors").exists()
            and Path("models/detector.safetensors").exists()):
        pytest.skip("trained checkpoints not present")
    from kiri_tpu import OCR

    ocr = OCR(decode_method="fast", deskew=True)
    doc = DocumentGenerator(480, 480, seed=313, khmer_ratio=0.0).generate()
    rot = apply_condition(doc, "rotated", random.Random(4))
    imgs = [np.asarray(rot["image"], np.uint8),
            np.asarray(doc["image"], np.uint8)]
    pooled = ocr.process_documents(imgs)
    batch_texts = ocr.extract_text_batch(imgs)
    for img, pooled_res, (btext, bres) in zip(imgs, pooled, batch_texts):
        single = ocr.process_document(img)
        assert [r["text"] for r in pooled_res] == [r["text"] for r in single]
        assert [r["box"] for r in pooled_res] == [r["box"] for r in single]
        stext, _ = ocr.extract_text(img)
        assert btext == stext
        assert [r["text"] for r in bres] == [r["text"] for r in single]


def test_estimate_skew_sparse_textured_page():
    """Regression: on a SPARSE page (3 lines) with paper texture, the old
    (p5+p95)/2 ink threshold landed inside the texture band (242..254),
    labeled ~40% of the background as ink, and the profile landscape
    degenerated to a +-8deg alias the gates refused — deskew silently never
    fired (est 0.0, page CER 0.24). The (p0.5+p99.5)/2 threshold must
    recover the true angle."""
    doc = DocumentGenerator(640, 640, seed=7000 + 13 * 2,
                            khmer_ratio=0.4).generate()
    assert len(doc["lines"]) <= 5, "fixture page should be sparse"
    rot = rotate_image(np.asarray(doc["image"], np.uint8), 3.98)
    est = estimate_skew(rot)
    assert abs(est - 3.98) < 0.4, est
