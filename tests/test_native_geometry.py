"""Native geometry library vs cv2/pyclipper-equivalent oracles."""
import numpy as np
import pytest

from kiri_tpu import native

cv2 = pytest.importorskip("cv2")


def test_library_builds():
    assert native.get_lib() is not None, "g++ build of geometry.cpp failed"


def test_connected_components_vs_cv2():
    rng = np.random.default_rng(0)
    bitmap = (rng.random((60, 80)) > 0.7).astype(np.uint8)
    n, labels, stats = native.connected_components(bitmap)
    n_cv, labels_cv, stats_cv, _ = cv2.connectedComponentsWithStats(
        bitmap, connectivity=8)
    assert n == n_cv - 1  # cv2 counts background
    # Component pixel-sets must match (label numbering may differ).
    ours = {frozenset(zip(*np.nonzero(labels == i))) for i in range(1, n + 1)}
    theirs = {frozenset(zip(*np.nonzero(labels_cv == i)))
              for i in range(1, n_cv)}
    assert ours == theirs
    # Areas must match as multisets.
    assert sorted(stats[:, 4]) == sorted(stats_cv[1:, cv2.CC_STAT_AREA])


def test_min_area_rect_vs_cv2():
    """Same minimal area as cv2 and encloses all points (the rect itself may
    legitimately differ when two hull edges tie on area)."""
    rng = np.random.default_rng(1)
    for _ in range(20):
        pts = rng.normal(size=(12, 2)).astype(np.float32) * 20 + 50
        rect = native.min_area_rect(pts)
        ((cx, cy), (w, h), ang) = rect
        (_, (w2, h2), _) = cv2.minAreaRect(pts)
        assert abs(w * h - w2 * h2) / max(w2 * h2, 1e-6) < 0.005
        # Containment: project onto the rect axes.
        a = np.radians(ang)
        axis_u = np.array([np.cos(a), np.sin(a)])
        axis_v = np.array([-np.sin(a), np.cos(a)])
        rel = pts - np.array([cx, cy])
        u = rel @ axis_u
        v = rel @ axis_v
        assert (np.abs(u) <= w / 2 + 1e-3).all()
        assert (np.abs(v) <= h / 2 + 1e-3).all()


def test_box_points_vs_cv2():
    rect = ((50.0, 40.0), (30.0, 10.0), 35.0)
    ours = native.box_points(rect)
    theirs = cv2.boxPoints(rect)
    # Same 4 corners up to cyclic order.
    for p in theirs:
        assert np.min(np.linalg.norm(ours - p, axis=1)) < 1e-3


def test_convex_hull():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 1]], float)
    hull = native.convex_hull(pts)
    assert len(hull) == 4
    assert {tuple(p) for p in hull} == {(0, 0), (4, 0), (4, 4), (0, 4)}


def test_offset_polygon_expands():
    quad = np.array([[10, 10], [50, 10], [50, 30], [10, 30]], float)
    out = native.offset_polygon(quad, 5.0)
    assert out is not None
    a0, _ = native.polygon_area_perimeter(quad)
    a1, _ = native.polygon_area_perimeter(native.convex_hull(out))
    # Expanded area ~ (w+2d)(h+2d) + round-corner loss.
    assert a1 > a0 * 1.5
    assert out[:, 0].min() < 10 - 4 and out[:, 0].max() > 50 + 4


def test_offset_polygon_matches_pyclipper_semantics():
    """Offset distance formula: area * ratio / perimeter (DB unclip)."""
    quad = np.array([[0, 0], [100, 0], [100, 20], [0, 20]], float)
    area, perim = native.polygon_area_perimeter(quad)
    assert abs(area - 2000) < 1e-6
    assert abs(perim - 240) < 1e-6
    d = area * 1.6 / perim
    out = native.offset_polygon(quad, d)
    (_, (w, h), _) = native.min_area_rect(out)
    exp_w, exp_h = 100 + 2 * d, 20 + 2 * d
    assert abs(max(w, h) - exp_w) < 1.0
    assert abs(min(w, h) - exp_h) < 1.0


def test_box_score_vs_cv2_fillpoly():
    rng = np.random.default_rng(2)
    pred = rng.random((40, 60)).astype(np.float32)
    box = np.array([[5, 5], [30, 8], [28, 25], [4, 22]], float)
    ours = native.box_score(pred, box)
    mask = np.zeros_like(pred, np.uint8)
    cv2.fillPoly(mask, box[None].astype(np.int32), 1)
    theirs = float(pred[mask > 0].mean())
    assert abs(ours - theirs) < 0.03


def test_dilate_vs_cv2():
    rng = np.random.default_rng(3)
    b = (rng.random((30, 30)) > 0.9).astype(np.uint8)
    ours = native.dilate(b, 3)
    theirs = cv2.dilate(b, np.ones((3, 3), np.uint8))
    np.testing.assert_array_equal(ours, theirs)


def test_component_boundary_feeds_rect():
    bitmap = np.zeros((40, 60), np.uint8)
    bitmap[10:20, 15:45] = 1
    n, labels, stats = native.connected_components(bitmap)
    assert n == 1
    pts = native.component_boundary(labels, 1)
    (cx, cy), (w, h), _ = native.min_area_rect(pts)
    assert abs(max(w, h) - 29) < 1.5 and abs(min(w, h) - 9) < 1.5
