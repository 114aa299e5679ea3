"""CRAFT polygon mode (reference: kiri_ocr/detector/craft/utils.py:102-281).

Curved components must yield polygon outlines that track the curve; straight
text must fall back to the quad (None from the core)."""
import numpy as np
import pytest

from kiri_tpu.detect.craft.poly import (get_poly_core, perspective_matrix,
                                        warp_label_nearest)


def _curved_component(h=120, w=400, amp=25, thick=16):
    """Label map with a sine-curved text band labeled 1, plus its quad."""
    labels = np.zeros((h, w), np.int32)
    xs = np.arange(20, w - 20)
    cy = h / 2 + amp * np.sin((xs - 20) / (w - 40) * np.pi)
    for x, c in zip(xs, cy):
        y0 = max(0, int(c - thick / 2))
        y1 = min(h, int(c + thick / 2))
        labels[y0:y1, x] = 1
    from kiri_tpu import native

    ys, xx = np.nonzero(labels)
    pts = np.stack([xx, ys], 1).astype(np.float64)
    quad = native.box_points(native.min_area_rect(pts)).astype(np.float32)
    start = quad.sum(axis=1).argmin()
    quad = np.roll(quad, 4 - start, 0)
    return labels, quad


def test_perspective_matrix_identity():
    src = np.float32([[0, 0], [10, 0], [10, 5], [0, 5]])
    m = perspective_matrix(src, src)
    np.testing.assert_allclose(m, np.eye(3), atol=1e-9)


def test_perspective_matrix_maps_corners():
    src = np.float32([[3, 4], [103, 14], [98, 64], [-2, 54]])
    dst = np.float32([[0, 0], [100, 0], [100, 50], [0, 50]])
    m = perspective_matrix(src, dst)
    for s, d in zip(src, dst):
        p = m @ np.array([s[0], s[1], 1.0])
        np.testing.assert_allclose(p[:2] / p[2], d, atol=1e-6)


def test_warp_label_nearest_identity():
    labels = np.zeros((20, 30), np.int32)
    labels[5:10, 8:20] = 7
    out = warp_label_nearest(labels, np.eye(3), 30, 20)
    np.testing.assert_array_equal(out, labels)


def test_poly_core_curved_band():
    labels, quad = _curved_component()
    polys = get_poly_core([quad], labels, [1])
    assert len(polys) == 1
    poly = polys[0]
    assert poly is not None, "curved band should produce a polygon"
    assert poly.shape == (2 * 5 + 4, 2)  # 5 pivots x 2 edges + 4 cap points
    # Top-edge pivot points must track the sine curve: the middle of the
    # top edge sits lower (greater y) at the curve's crest than the ends.
    top = poly[1:6]
    assert top[2][1] > min(top[0][1], top[-1][1]) + 5
    # All points within a sane margin of the map.
    assert poly[:, 0].min() > -80 and poly[:, 0].max() < labels.shape[1] + 80


def test_poly_core_straight_text_returns_none():
    labels = np.zeros((60, 300), np.int32)
    labels[20:45, 30:270] = 1  # fills most of its rectified height
    quad = np.float32([[30, 20], [270, 20], [270, 45], [30, 45]])
    polys = get_poly_core([quad], labels, [1])
    assert polys == [None]


def test_poly_core_small_component_returns_none():
    labels = np.zeros((30, 30), np.int32)
    labels[10:14, 10:16] = 1
    quad = np.float32([[10, 10], [16, 10], [16, 14], [10, 14]])
    assert get_poly_core([quad], labels, [1]) == [None]


def test_get_det_boxes_poly_dispatch():
    """poly=True returns (boxes, polys) aligned; poly=False returns boxes."""
    from kiri_tpu.data.docsynth import craft_ground_truth
    from kiri_tpu.data.docsynth import DocumentGenerator
    from kiri_tpu.detect.craft import get_det_boxes

    doc = DocumentGenerator(320, 320, seed=11, augment=False).generate()
    region, affinity = craft_ground_truth(doc["image"].shape, doc["chars"])
    boxes = get_det_boxes(region, affinity, 0.6, 0.3, 0.3)
    boxes2, polys = get_det_boxes(region, affinity, 0.6, 0.3, 0.3, poly=True)
    assert len(boxes) == len(boxes2) == len(polys)
    for b, b2 in zip(boxes, boxes2):
        np.testing.assert_array_equal(b, b2)
    for p in polys:
        assert p is None or (p.ndim == 2 and p.shape[1] == 2)


def test_facade_handles_polygon_points():
    from kiri_tpu.detect import TextDetector

    det = TextDetector(method="legacy")
    poly = np.float32([[10, 10], [40, 8], [80, 12], [80, 30], [40, 28],
                       [10, 32]])
    out = det._process_boxes_objects([(poly, 0.9)])
    assert len(out) == 1
    assert out[0].bbox == (10, 8, 70, 24)
