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


def test_multi_polarity_doc(det):
    """Dark body text AND light text on a dark band on the same page: the
    single-best-mask selection catches one population; the complementary
    union (legacy.py _complementary_mask) must recover both."""
    img = Image.new("L", (480, 360), 255)
    draw = ImageDraw.Draw(img)
    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 26)
    except Exception:
        font = ImageFont.load_default()
    ys = []
    for i in range(3):  # dark-on-white body text
        y = 30 + i * 60
        draw.text((30, y), f"Dark body text line {i} here", fill=0, font=font)
        ys.append(y)
    draw.rectangle([0, 230, 480, 360], fill=25)  # dark band
    for i in range(2):  # light-on-dark band text
        y = 250 + i * 55
        draw.text((30, y), f"Light banner line {i} words", fill=245,
                  font=font)
        ys.append(y)
    arr = np.asarray(img)
    assert _recall(det.detect_lines(arr), ys) >= 0.8
    # The union must fire on this page and contribute glyph-sized
    # components only — never the solid band (which a raw OR of a
    # band-foreground mask would weld into one giant blob).
    det._debug = {}
    det._binarize(arr)
    sec = det._debug.get("bin_union_second")
    assert sec is not None
    assert (sec[240:340, 20:300] > 0).mean() < 0.10


def test_complementary_union_inactive_on_single_polarity(det):
    """On a plain dark-on-white page the runner-up masks overlap the winner,
    so the union must not fire (output identical to best-mask-only)."""
    img, _ = _doc(fg=0, bg=255)
    det._debug = {}
    det._binarize(np.asarray(Image.fromarray(img).convert("L"))
                  if img.ndim == 3 else img)
    assert "bin_union_second" not in det._debug
