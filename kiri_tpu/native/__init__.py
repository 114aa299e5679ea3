"""ctypes bindings for the native geometry library (geometry.cpp).

Builds ``libkiri_geom.so`` on first use with g++ (cached next to the source;
rebuilt when the source is newer). Every entry point has a pure-numpy
fallback so the package works without a compiler — the native path is the
performance
default, mirroring how the reference leaned on OpenCV/pyclipper C++ (SURVEY
§2.2) but first-party.
"""
from __future__ import annotations

import ctypes
import math
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "geometry.cpp"
_SO = _HERE / "libkiri_geom.so"

_lib = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    try:
        if (not _SO.exists()) or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_SO))
    except Exception:
        _build_failed = True
        return None

    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_f64p = ctypes.POINTER(ctypes.c_double)

    lib.connected_components.restype = ctypes.c_int
    lib.connected_components.argtypes = [c_u8p, ctypes.c_int, ctypes.c_int,
                                         c_i32p, c_i32p, ctypes.c_int]
    lib.convex_hull.restype = ctypes.c_int
    lib.convex_hull.argtypes = [c_f64p, ctypes.c_int, c_f64p]
    lib.min_area_rect.restype = None
    lib.min_area_rect.argtypes = [c_f64p, ctypes.c_int, c_f64p]
    lib.offset_convex_polygon.restype = ctypes.c_int
    lib.offset_convex_polygon.argtypes = [c_f64p, ctypes.c_int,
                                          ctypes.c_double, c_f64p,
                                          ctypes.c_int, ctypes.c_int]
    lib.box_score.restype = ctypes.c_double
    lib.box_score.argtypes = [c_f32p, ctypes.c_int, ctypes.c_int, c_f64p]
    lib.polygon_area_perimeter.restype = None
    lib.polygon_area_perimeter.argtypes = [c_f64p, ctypes.c_int, c_f64p, c_f64p]
    lib.component_boundary.restype = ctypes.c_int
    lib.component_boundary.argtypes = [c_i32p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, c_f64p, ctypes.c_int]
    lib.dilate.restype = None
    lib.dilate.argtypes = [c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                           c_u8p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        _lib = _build()
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


# ---------------------------------------------------------------------------
# Public API (native with numpy fallback)
# ---------------------------------------------------------------------------
def connected_components(bitmap: np.ndarray, max_components: int = 4096
                         ) -> Tuple[int, np.ndarray, np.ndarray]:
    """8-connected components. Returns (n, labels int32 [h,w],
    stats int32 [n,5] = (x, y, w, h, area))."""
    bitmap = np.ascontiguousarray(bitmap.astype(np.uint8))
    h, w = bitmap.shape
    lib = get_lib()
    if lib is not None:
        labels = np.zeros((h, w), np.int32)
        stats = np.zeros((max_components, 5), np.int32)
        n = lib.connected_components(
            _ptr(bitmap, ctypes.c_uint8), h, w,
            _ptr(labels, ctypes.c_int32), _ptr(stats, ctypes.c_int32),
            max_components)
        return n, labels, stats[:n]
    # numpy/scipy-free fallback: BFS labeling.
    labels = np.zeros((h, w), np.int32)
    stats = []
    n = 0
    fg = bitmap > 0
    for sy, sx in zip(*np.nonzero(fg & (labels == 0))):
        if labels[sy, sx]:
            continue
        n += 1
        stack = [(sy, sx)]
        labels[sy, sx] = n
        xs, ys = [sx], [sy]
        while stack:
            y, x = stack.pop()
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w and fg[yy, xx] \
                            and not labels[yy, xx]:
                        labels[yy, xx] = n
                        stack.append((yy, xx))
                        xs.append(xx)
                        ys.append(yy)
        xs_, ys_ = np.asarray(xs), np.asarray(ys)
        stats.append([xs_.min(), ys_.min(), xs_.max() - xs_.min() + 1,
                      ys_.max() - ys_.min() + 1, len(xs)])
        if n >= max_components:
            break
    return n, labels, np.asarray(stats, np.int32).reshape(n, 5)


def min_area_rect(points: np.ndarray) -> Tuple[Tuple[float, float],
                                               Tuple[float, float], float]:
    """cv2.minAreaRect-compatible: ((cx, cy), (w, h), angle in (0, 90])."""
    pts = np.ascontiguousarray(points.reshape(-1, 2).astype(np.float64))
    lib = get_lib()
    if lib is not None:
        out = np.zeros(5, np.float64)
        lib.min_area_rect(_ptr(pts, ctypes.c_double), len(pts),
                          _ptr(out, ctypes.c_double))
        return ((out[0], out[1]), (out[2], out[3]), out[4])
    try:
        import cv2

        return cv2.minAreaRect(pts.astype(np.float32))
    except Exception:
        x0, y0 = pts.min(axis=0)
        x1, y1 = pts.max(axis=0)
        return (((x0 + x1) / 2, (y0 + y1) / 2), (x1 - x0, y1 - y0), 90.0)


def box_points(rect) -> np.ndarray:
    """cv2.boxPoints-compatible corner computation."""
    (cx, cy), (w, h), angle = rect
    a = math.radians(angle)
    ca, sa = math.cos(a), math.sin(a)
    dx, dy = w / 2.0, h / 2.0
    corners = np.array([[-dx, dy], [-dx, -dy], [dx, -dy], [dx, dy]])
    rot = np.array([[ca, -sa], [sa, ca]])
    return (corners @ rot.T + np.array([cx, cy])).astype(np.float32)


def convex_hull(points: np.ndarray) -> np.ndarray:
    pts = np.ascontiguousarray(points.reshape(-1, 2).astype(np.float64))
    lib = get_lib()
    if lib is not None:
        out = np.zeros_like(pts)
        k = lib.convex_hull(_ptr(pts, ctypes.c_double), len(pts),
                            _ptr(out, ctypes.c_double))
        return out[:k]
    try:
        import cv2

        return cv2.convexHull(pts.astype(np.float32)).reshape(-1, 2)
    except Exception:
        return pts


def offset_polygon(poly: np.ndarray, distance: float,
                   arc_points: int = 16) -> Optional[np.ndarray]:
    """Expand a convex polygon by `distance` with round joins
    (pyclipper JT_ROUND equivalent; reference _unclip db/model.py:199-212)."""
    poly = np.ascontiguousarray(poly.reshape(-1, 2).astype(np.float64))
    lib = get_lib()
    if lib is not None:
        max_out = len(poly) * (arc_points + 2) + 8
        out = np.zeros((max_out, 2), np.float64)
        m = lib.offset_convex_polygon(
            _ptr(poly, ctypes.c_double), len(poly), float(distance),
            _ptr(out, ctypes.c_double), max_out, arc_points)
        if m == 0:
            return None
        return out[:m]
    # numpy fallback: push vertices along averaged edge normals + arcs.
    n = len(poly)
    if n < 3 or distance <= 0:
        return poly
    sa = 0.0
    for i in range(n):
        j = (i + 1) % n
        sa += poly[i, 0] * poly[j, 1] - poly[j, 0] * poly[i, 1]
    orient = 1.0 if sa >= 0 else -1.0
    out = []
    for i in range(n):
        prev, nxt = (i - 1) % n, (i + 1) % n
        e1 = poly[i] - poly[prev]
        e2 = poly[nxt] - poly[i]
        l1, l2 = np.hypot(*e1), np.hypot(*e2)
        if l1 < 1e-12 or l2 < 1e-12:
            continue
        n1 = orient * np.array([e1[1], -e1[0]]) / l1
        n2 = orient * np.array([e2[1], -e2[0]]) / l2
        a1, a2 = math.atan2(n1[1], n1[0]), math.atan2(n2[1], n2[0])
        da = a2 - a1
        while da > math.pi:
            da -= 2 * math.pi
        while da < -math.pi:
            da += 2 * math.pi
        steps = max(1, int(abs(da) / math.pi * arc_points))
        for s in range(steps + 1):
            a = a1 + da * s / steps
            out.append(poly[i] + distance * np.array([math.cos(a),
                                                      math.sin(a)]))
    return np.asarray(out) if out else None


def polygon_area_perimeter(poly: np.ndarray) -> Tuple[float, float]:
    poly = np.ascontiguousarray(poly.reshape(-1, 2).astype(np.float64))
    lib = get_lib()
    if lib is not None:
        a = ctypes.c_double()
        p = ctypes.c_double()
        lib.polygon_area_perimeter(_ptr(poly, ctypes.c_double), len(poly),
                                   ctypes.byref(a), ctypes.byref(p))
        return a.value, p.value
    n = len(poly)
    a = 0.0
    p = 0.0
    for i in range(n):
        j = (i + 1) % n
        a += poly[i, 0] * poly[j, 1] - poly[j, 0] * poly[i, 1]
        p += float(np.hypot(*(poly[j] - poly[i])))
    return abs(a) / 2.0, p


def box_score(pred: np.ndarray, box: np.ndarray) -> float:
    """Mean of pred inside the quad (reference _box_score_fast)."""
    pred = np.ascontiguousarray(pred.astype(np.float32))
    quad = np.ascontiguousarray(box.reshape(4, 2).astype(np.float64))
    lib = get_lib()
    if lib is not None:
        h, w = pred.shape
        return float(lib.box_score(_ptr(pred, ctypes.c_float), h, w,
                                   _ptr(quad, ctypes.c_double)))
    try:
        import cv2

        h, w = pred.shape
        b = quad.copy()
        xmin = int(np.clip(np.floor(b[:, 0].min()), 0, w - 1))
        xmax = int(np.clip(np.ceil(b[:, 0].max()), 0, w - 1))
        ymin = int(np.clip(np.floor(b[:, 1].min()), 0, h - 1))
        ymax = int(np.clip(np.ceil(b[:, 1].max()), 0, h - 1))
        if xmax <= xmin or ymax <= ymin:
            return 0.0
        mask = np.zeros((ymax - ymin + 1, xmax - xmin + 1), np.uint8)
        b[:, 0] -= xmin
        b[:, 1] -= ymin
        cv2.fillPoly(mask, b.reshape(1, -1, 2).astype(np.int32), 1)
        return float(cv2.mean(pred[ymin:ymax + 1, xmin:xmax + 1], mask)[0])
    except Exception:
        return 0.0


def component_boundary(labels: np.ndarray, label: int,
                       max_pts: int = 100000) -> np.ndarray:
    labels = np.ascontiguousarray(labels.astype(np.int32))
    lib = get_lib()
    if lib is not None:
        h, w = labels.shape
        out = np.zeros((max_pts, 2), np.float64)
        m = lib.component_boundary(_ptr(labels, ctypes.c_int32), h, w,
                                   int(label), _ptr(out, ctypes.c_double),
                                   max_pts)
        return out[:m]
    ys, xs = np.nonzero(labels == label)
    return np.stack([xs, ys], axis=1).astype(np.float64)


def dilate(bitmap: np.ndarray, ksize: int) -> np.ndarray:
    bitmap = np.ascontiguousarray(bitmap.astype(np.uint8))
    lib = get_lib()
    if lib is not None:
        h, w = bitmap.shape
        out = np.zeros_like(bitmap)
        lib.dilate(_ptr(bitmap, ctypes.c_uint8), h, w, int(ksize),
                   _ptr(out, ctypes.c_uint8))
        return out
    try:
        import cv2

        return cv2.dilate(bitmap, np.ones((ksize, ksize), np.uint8))
    except Exception:
        return bitmap
