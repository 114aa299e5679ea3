"""Global page deskew: projection-profile skew estimation + rotation helpers.

The trained DB/CRAFT detectors absorb small rotations, but steeply skewed
pages (2-6 degrees) cost recall on short lines whose axis-aligned boxes
smear across neighbours. The reference has no deskew stage (its DB head
emits `cv2.minAreaRect` quads, reference detector/db/model.py:163,391, and
otherwise relies on trained invariance); production document OCR normally
straightens the page first. This module is that stage: estimate the global
text-line angle from the horizontal projection profile, rotate the page
upright for detection/recognition, and map boxes back to the input frame.

Everything here is host-side numpy/PIL on a downscaled binarized view —
it runs once per page in well under a millisecond of useful work and keeps
the TPU path (detector forward) operating on upright text.

Angle convention matches `PIL.Image.rotate` (and docsynth's `rotated`
condition, data/docsynth.py:48-71): `estimate_skew` returns the angle `a`
such that the page content looks like an upright page passed through
`Image.rotate(a)`; `Image.rotate(-a)` (== `rotate_image(img, -a)`)
straightens it.

Scope: the facade applies deskew on the line-detection path
(`TextDetector.detect_lines_objects`); word/char/block detection goes
straight to the legacy backend un-deskewed.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

__all__ = ["estimate_skew", "rotate_image", "boxes_to_original",
           "extract_crop_single_resample"]


def _ink_coords(img: np.ndarray, max_side: int = 1200,
                max_px: int = 60_000) -> Tuple[np.ndarray, np.ndarray]:
    """(x, y) coordinates of ink pixels on a downscaled view.

    Polarity-agnostic: ink is whichever side of the robust mid-threshold is
    the minority, so inverted (light-on-dark) pages work unchanged.
    """
    h, w = img.shape[:2]
    k = max(1, int(np.ceil(max(h, w) / max_side)))
    small = img[::k, ::k]
    # (0.5, 99.5) percentiles, not (5, 95): on a SPARSE page (a few short
    # lines, <5% ink) with paper texture, p5/p95 both land inside the
    # texture band (e.g. 242..254) and the midpoint labels ~half the
    # background as ink, drowning the text signal (measured: a 3-line
    # rotated page scored a monotone alias landscape and the gates
    # correctly refused it — deskew silently never fired).
    lo, hi = np.percentile(small, (0.5, 99.5))
    thr = (float(lo) + float(hi)) / 2.0
    dark = small < thr
    ink = dark if dark.mean() <= 0.5 else ~dark
    if ink.mean() > 0.25:
        # Ink covering >25% of a document page is implausible — the
        # histogram is lopsided (e.g. texture on one side of the midpoint);
        # re-threshold 25% of the range from the ink-side extreme.
        if dark.mean() <= 0.5:            # ink = dark side
            thr = float(lo) + 0.25 * (float(hi) - float(lo))
        else:                             # inverted page: ink = bright side
            thr = float(hi) - 0.25 * (float(hi) - float(lo))
        dark = small < thr
        ink = dark if dark.mean() <= 0.5 else ~dark
    ys, xs = np.nonzero(ink)
    if xs.size > max_px:
        sel = np.linspace(0, xs.size - 1, max_px).astype(np.int64)
        xs, ys = xs[sel], ys[sel]
    return xs.astype(np.float32), ys.astype(np.float32)


def _profile_score(xs: np.ndarray, ys: np.ndarray, angle_deg: float) -> float:
    """Sharpness of the horizontal projection profile after un-rotating by
    `angle_deg`: high when text rows align into tight bands."""
    return float(_profile_scores(xs, ys, np.asarray([angle_deg]))[0])


def _profile_scores(xs: np.ndarray, ys: np.ndarray,
                    angles_deg: np.ndarray) -> np.ndarray:
    """Vectorized `_profile_score` over a grid of candidate angles."""
    th = np.deg2rad(np.asarray(angles_deg, np.float64))[:, None]
    # Inverse of the PIL.rotate(a) content transform
    # p' = (x c + y s, -x s + y c): y_orig = x*sin(th) + y*cos(th).
    y0 = xs[None, :] * np.sin(th) + ys[None, :] * np.cos(th)   # [A, N]
    y0 -= y0.min(axis=1, keepdims=True)
    rows = np.round(y0).astype(np.int64)
    width = int(rows.max()) + 1
    # One flat bincount for all angles: offset each angle's rows into its
    # own [width] stripe of a shared histogram.
    offs = rows + (np.arange(len(th), dtype=np.int64) * width)[:, None]
    prof = np.bincount(offs.ravel(),
                       minlength=len(th) * width).reshape(len(th), width)
    prof = prof.astype(np.float64)
    # Variance over each angle's OWN occupied span [0, max_row_i], exactly
    # as the scalar per-angle bincount would compute it (a shared width
    # would dilute short-span angles with zero bins).
    w_i = rows.max(axis=1).astype(np.float64) + 1.0
    n_pts = float(xs.size)
    sum_p2 = (prof * prof).sum(axis=1)
    return sum_p2 / w_i - (n_pts / w_i) ** 2


def _search(xs: np.ndarray, ys: np.ndarray, max_angle: float,
            coarse_step: float, fine_step: float) -> float:
    if xs.size < 64:
        return 0.0
    coarse = np.arange(-max_angle, max_angle + 1e-6, coarse_step)
    best = coarse[int(np.argmax(_profile_scores(xs, ys, coarse)))]
    fine = np.arange(best - coarse_step, best + coarse_step + 1e-6, fine_step)
    return float(fine[int(np.argmax(_profile_scores(xs, ys, fine)))])


def estimate_skew(img, max_angle: float = 8.0, coarse_step: float = 0.5,
                  fine_step: float = 0.05, max_trusted: float = 6.0,
                  half_tol: float = 0.75, min_gain: float = 1.10) -> float:
    """Estimate the global skew angle of a document image, in degrees.

    Primary signal: independent coarse-to-fine projection-profile searches
    on the LEFT and RIGHT halves of the ink. A true global rotation is
    spatially consistent, so the halves must agree within `half_tol` deg —
    this both rejects upright two-column pages with unaligned rows and
    survives rotated multi-column pages where a FULL-page search aliases to
    a column-interleave harmonic (both measured failure modes;
    tests/test_deskew.py). The agreed angle is then refined on the full ink
    and passed through two more gates:
    - |angle| <= `max_trusted`: plausible scan skew only. A sparse 5-line
      page can genuinely score best at ~8deg by overlapping rows.
    - profile score at the angle >= `min_gain` x the upright score: real
      skew sharpens the projection profile severalfold.
    Returns the angle in `PIL.Image.rotate` convention (module docstring);
    0.0 for blank pages or when any gate fails.
    """
    img = np.asarray(img)
    if img.ndim == 3:
        img = img.mean(axis=2)
    xs, ys = _ink_coords(img)
    if xs.size < 128:
        return 0.0
    mid = np.median(xs)
    left = xs < mid
    a_l = _search(xs[left], ys[left], max_angle, coarse_step, fine_step)
    a_r = _search(xs[~left], ys[~left], max_angle, coarse_step, fine_step)
    if abs(a_l - a_r) > half_tol:
        return 0.0
    center = (a_l + a_r) / 2.0
    if abs(center) > max_trusted:
        return 0.0
    # Refine on the full ink inside a +-coarse_step window around the
    # trusted center; no trust re-check here — on rotated multi-column
    # pages the full-page profile pulls toward a column-interleave harmonic
    # and can drift the refined value just past the bound.
    fine = np.arange(center - coarse_step, center + coarse_step + 1e-6,
                     fine_step)
    best = float(fine[int(np.argmax(_profile_scores(xs, ys, fine)))])
    if _profile_score(xs, ys, best) < min_gain * _profile_score(xs, ys, 0.0):
        return 0.0
    return best


def rotate_image(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate a uint8 image about its center (PIL semantics, expand=False),
    filling the revealed corners with the median background level."""
    img = np.asarray(img, np.uint8)
    if abs(angle_deg) < 1e-6:
        return img
    bg = int(np.median(img))
    fill = bg if img.ndim == 2 else tuple([bg] * img.shape[2])
    pil = Image.fromarray(img).rotate(angle_deg, resample=Image.BILINEAR,
                                      expand=False, fillcolor=fill)
    return np.asarray(pil, np.uint8)


def extract_crop_single_resample(orig: np.ndarray, angle_deg: float,
                                 box: Tuple[int, int, int, int], out_h: int,
                                 extra_padding: int = 5,
                                 min_scale: float = 0.75,
                                 fill: Optional[int] = None,
                                 interp: Optional[int] = None
                                 ) -> Optional[np.ndarray]:
    """Cut one deskewed line crop straight from the ORIGINAL page, rotated
    and scaled to height ``out_h`` in a SINGLE cubic resample.

    ``box`` is (x, y, w, h) in the deskewed frame (``rotate_image(img,
    -angle_deg)``); the padded box is clipped to the frame exactly like
    ``ops.preprocess.crop_region``. The two-step path — bilinear page
    rotation, then the preprocess resize — interpolates the pixels twice,
    and on small document lines the intermediate low-res raster is where
    stroke detail dies (measured: the rotated condition was the end-to-end
    CER outlier at 0.055 vs 0.0075 clean). Composing rotation + scale into
    one ``cv2.warpAffine`` gives rotated pages the same interpolation count
    as upright ones.

    Returns the uint8 crop of height ``out_h``, or None when the box is
    empty, cv2 is unavailable, or the implied scale ``out_h / padded_h`` is
    below ``min_scale`` — strong downscales want the area-averaging resize
    of the two-step path, which ``warpAffine`` cannot do.

    ``interp`` overrides the cv2 interpolation flag (default: cubic when
    upscaling, linear when downscaling). Noisy captures want
    ``cv2.INTER_LINEAR``: the cubic kernel's ringing re-crisps sensor noise
    and smears salt-and-pepper impulses into blobs the downstream
    ``enhance_crop`` despike no longer recognizes as isolated spikes.
    """
    if not _HAS_CV2:
        return None
    orig = np.asarray(orig)
    h, w = orig.shape[:2]
    x, y, bw, bh = box
    x1 = max(0, int(x) - extra_padding)
    y1 = max(0, int(y) - extra_padding)
    x2 = min(w, int(x) + int(bw) + extra_padding)
    y2 = min(h, int(y) + int(bh) + extra_padding)
    ph, pw = y2 - y1, x2 - x1
    if ph <= 0 or pw <= 0:
        return None
    k = out_h / float(ph)
    if k < min_scale:
        return None
    out_w = max(1, int(round(pw * k)))
    th = np.deg2rad(angle_deg)
    c, s = np.cos(th), np.sin(th)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    # Destination pixel (u, v) samples deskewed-frame point
    # (x1 + (u+0.5)/k - 0.5, y1 + (v+0.5)/k - 0.5) (cv2 center-aligned
    # resize convention), which maps to the original frame through the
    # forward PIL.rotate(angle) content transform p' = (xc + ys, -xs + yc)
    # about the page center (same rotation as boxes_to_original).
    ox = x1 + 0.5 / k - 0.5 - cx
    oy = y1 + 0.5 / k - 0.5 - cy
    m = np.array([[c / k, s / k, c * ox + s * oy + cx],
                  [-s / k, c / k, -s * ox + c * oy + cy]], np.float64)
    if fill is None:
        fill = int(np.median(orig))
    if interp is None:
        interp = cv2.INTER_CUBIC if k >= 1.0 else cv2.INTER_LINEAR
    return cv2.warpAffine(
        orig, m, (out_w, out_h), flags=interp | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_CONSTANT, borderValue=fill)


def boxes_to_original(boxes: Sequence[Tuple[float, float, float, float]],
                      angle_deg: float,
                      shape: Tuple[int, int]) -> List[Tuple[int, int, int, int]]:
    """Map (x, y, w, h) boxes found on `rotate_image(img, -angle)` back to
    the input frame, as the axis-aligned hull of the rotated corners,
    clipped to the image."""
    h, w = shape[:2]
    th = np.deg2rad(angle_deg)
    c, s = np.cos(th), np.sin(th)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    out: List[Tuple[int, int, int, int]] = []
    for (x, y, bw, bh) in boxes:
        pts = np.array([[x, y], [x + bw, y], [x, y + bh], [x + bw, y + bh]],
                       np.float64) - (cx, cy)
        # Forward PIL.rotate(angle) content transform (docsynth rot_box,
        # data/docsynth.py:59-71): p' = (x c + y s, -x s + y c).
        pts = pts @ np.array([[c, -s], [s, c]]) + (cx, cy)
        x0, y0 = pts.min(axis=0)
        x1, y1 = pts.max(axis=0)
        x0, y0 = max(0, int(round(x0))), max(0, int(round(y0)))
        x1, y1 = min(w, int(round(x1))), min(h, int(round(y1)))
        out.append((x0, y0, max(0, x1 - x0), max(0, y1 - y0)))
    return out
