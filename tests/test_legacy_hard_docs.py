"""Legacy CV detector recall on hard documents.

The candidate breadth exists for documents where the learned detectors
fail (reference legacy/detector.py:283-494: multi-space binarizations,
MSER, gradient). These fixtures cover those failure modes: inverted,
low-contrast, and colored text/background.
"""
import numpy as np
import pytest
from PIL import Image, ImageDraw, ImageFont

from kiri_tpu.detect.legacy import ImageProcessingTextDetector


def _doc(fg, bg, color=False, n_lines=4):
    """Synthetic document with n_lines of text; returns (img, line_ys)."""
    size = (480, 360)
    mode = "RGB" if color else "L"
    img = Image.new(mode, size, bg)
    draw = ImageDraw.Draw(img)
    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 26)
    except Exception:
        font = ImageFont.load_default()
    ys = []
    for i in range(n_lines):
        y = 40 + i * 70
        draw.text((30, y), f"Hard document line {i} text", fill=fg, font=font)
        ys.append(y)
    arr = np.asarray(img)
    if color:
        arr = arr[:, :, ::-1].copy()  # RGB -> BGR as cv2 users pass
    return arr, ys


def _recall(boxes, ys, tol=30):
    hits = 0
    for y in ys:
        if any(b[1] - tol <= y <= b[1] + b[3] + tol for b in boxes):
            hits += 1
    return hits / len(ys)


@pytest.fixture(scope="module")
def det():
    return ImageProcessingTextDetector()


def test_normal_doc(det):
    img, ys = _doc(fg=0, bg=255)
    assert _recall(det.detect_lines(img), ys) >= 0.75


def test_inverted_doc(det):
    img, ys = _doc(fg=255, bg=20)
    assert _recall(det.detect_lines(img), ys) >= 0.75


def test_low_contrast_doc(det):
    img, ys = _doc(fg=120, bg=165)
    assert _recall(det.detect_lines(img), ys) >= 0.75


def test_colored_doc(det):
    # Blue text on yellow background: grayscale-only binarization struggles,
    # channel candidates (reference :451-494) recover it.
    img, ys = _doc(fg=(40, 40, 200), bg=(250, 240, 120), color=True)
    assert _recall(det.detect_lines(img), ys) >= 0.75


def test_textured_background(det):
    img, ys = _doc(fg=0, bg=235)
    rng = np.random.default_rng(0)
    noisy = np.clip(img.astype(np.int16)
                    + rng.integers(-25, 25, img.shape), 0, 255).astype(np.uint8)
    assert _recall(det.detect_lines(noisy), ys) >= 0.75


def test_source_toggles(det):
    """use_mser / use_gradient / use_color_channels are honored."""
    img, ys = _doc(fg=0, bg=255)
    bare = ImageProcessingTextDetector(use_mser=False, use_gradient=False,
                                       use_color_channels=False)
    assert _recall(bare.detect_lines(img), ys) >= 0.75  # easy doc still fine
    assert len(bare._binary_candidates(img, None)) < \
        len(det._binary_candidates(img, None)) + 15  # gray-only sweep


def test_nms_dedup():
    boxes = np.array([[10, 10, 50, 20], [12, 11, 50, 20], [200, 10, 40, 18]],
                     np.int32)
    out = ImageProcessingTextDetector._nms_boxes(boxes, iou_thr=0.5)
    assert len(out) == 2


def test_candidate_sweep_breadth():
    """Candidate count is in the reference's ~25 ballpark on color input."""
    det = ImageProcessingTextDetector()
    img, _ = _doc(fg=(0, 0, 0), bg=(255, 255, 255), color=True)
    gray = np.asarray(Image.fromarray(img[:, :, ::-1]).convert("L"))
    cands = det._binary_candidates(gray, img)
    assert len(cands) >= 24
    names = [n for n, _ in cands]
    for expected in ("otsu", "sauvola", "niblack", "hsv_v_otsu", "lab_l_otsu",
                     "morph_gradient", "red_otsu"):
        assert expected in names
