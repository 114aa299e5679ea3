"""Line-image preprocessing for the recognizer.

Reference semantics (kiri_ocr/model.py:311-339, kiri_ocr/core.py:489-528):

* grayscale
* invert when mean < 127 (dark background)
* resize keeping aspect ratio to height H (bilinear); width = round(iw * H/ih)
* if the resized width >= W: crop to W; else pad right side with gray=128
  (left-aligned content)
* normalize: (x/255 - 0.5) / 0.5  ->  [-1, 1]

TPU-first design: the host produces a *uint8* [N, H, W] batch (4x fewer
host->device bytes than f32); the jitted model casts + normalizes on device,
where XLA fuses it into the first convolution. Two host paths are provided:

* ``preprocess_pil``    — bit-exact mirror of the reference PIL path
                          (used for parity tests and single-image API).
* ``preprocess_np``     — fast cv2 path used by the batched pipeline and by
                          training (self-consistent: train == serve).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from PIL import Image


# --------------------------------------------------------------------------
# Reference-exact PIL path
# --------------------------------------------------------------------------
class ResizeKeepRatioPadNoCrop:
    """Mirror of the reference transform (kiri_ocr/model.py:311-331)."""

    def __init__(self, h: int, w: int):
        self.h = h
        self.w = w

    def __call__(self, img: Image.Image) -> Image.Image:
        iw, ih = img.size
        if ih <= 0 or iw <= 0:
            return img.resize((self.w, self.h), Image.BILINEAR)

        scale = self.h / float(ih)
        nw = max(1, int(round(iw * scale)))
        img = img.resize((nw, self.h), Image.BILINEAR)

        if nw >= self.w:
            return img.crop((0, 0, self.w, self.h))

        new_img = Image.new("L", (self.w, self.h), 128)
        new_img.paste(img, (0, 0))
        return new_img


def preprocess_pil(cfg, pil: Image.Image) -> np.ndarray:
    """PIL image -> normalized f32 array [1, 1, H, W] (reference-exact)."""
    img = pil.convert("L")
    img = ResizeKeepRatioPadNoCrop(cfg.IMG_H, cfg.IMG_W)(img)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    return arr[None, None]


def preprocess_pil_u8(cfg, pil: Image.Image) -> np.ndarray:
    """PIL image -> uint8 [H, W] (resize/pad only; normalization on device)."""
    img = pil.convert("L")
    img = ResizeKeepRatioPadNoCrop(cfg.IMG_H, cfg.IMG_W)(img)
    return np.asarray(img, dtype=np.uint8)


# --------------------------------------------------------------------------
# Fast numpy/cv2 path (batched pipeline + training)
# --------------------------------------------------------------------------
def resize_keep_ratio_pad_np(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """uint8 [ih, iw] -> uint8 [h, w]; same geometry as the PIL transform.

    Interpolation is scale-aware (a deliberate deviation from the
    reference's always-BILINEAR, model.py:319-323): AREA for downscale,
    CUBIC for upscale. Small document crops upscaled to model height keep
    visibly crisper strokes under cubic — measured line CER on 22 px
    renders: mixed-script 0.0168 -> 0.0089, Khmer 0.0272 -> 0.0238,
    English unchanged (LANCZOS4 regressed English and was rejected).
    """
    ih, iw = img.shape[:2]
    if ih <= 0 or iw <= 0:
        return np.full((h, w), 128, dtype=np.uint8)
    scale = h / float(ih)
    nw = max(1, int(round(iw * scale)))
    if _HAS_CV2:
        resized = cv2.resize(img, (min(nw, w) if nw >= w else nw, h),
                             interpolation=(cv2.INTER_AREA if scale < 1.0
                                            else cv2.INTER_CUBIC))
        # cv2.resize to (min(nw,w), h) already crops horizontally when nw >= w
        if resized.shape[1] >= w:
            return np.ascontiguousarray(resized[:, :w])
    else:  # PIL fallback
        pil = Image.fromarray(img).resize(
            (nw, h), Image.BILINEAR if scale == 1.0 else Image.BICUBIC)
        resized = np.asarray(pil, dtype=np.uint8)
        if nw >= w:
            return np.ascontiguousarray(resized[:, :w])
    out = np.full((h, w), 128, dtype=np.uint8)
    out[:, : resized.shape[1]] = resized
    return out


def invert_if_dark(img: np.ndarray) -> np.ndarray:
    """Invert when mean < 127 (reference: kiri_ocr/core.py:524-526)."""
    if float(img.mean()) < 127.0:
        return 255 - img
    return img


def _median3(f: np.ndarray) -> np.ndarray:
    """3x3 median filter, pure numpy (edge-replicated)."""
    p = np.pad(f, 1, mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(p, (3, 3))
    return np.median(win, axis=(-2, -1))


_GAUSS5 = None


def _gauss08(f: np.ndarray) -> np.ndarray:
    """Separable 5-tap gaussian blur, sigma 0.8 (edge-replicated)."""
    global _GAUSS5
    if _GAUSS5 is None:
        x = np.arange(-2, 3, dtype=np.float32)
        k = np.exp(-x * x / (2 * 0.8 ** 2))
        _GAUSS5 = k / k.sum()
    k = _GAUSS5
    p = np.pad(f, ((2, 2), (0, 0)), mode="edge")
    f = sum(w * p[i: i + f.shape[0]] for i, w in enumerate(k))
    p = np.pad(f, ((0, 0), (2, 2)), mode="edge")
    return sum(w * p[:, i: i + f.shape[1]] for i, w in enumerate(k))


#: Shared noise gate: enhance_crop's default noise_thresh AND the
#: page-level despike gate in pipeline._cut_crops use this one value, so a
#: retune cannot silently split the two paths.
NOISE_SIGMA_THRESH = 2.5


def _despike(f: np.ndarray, band_rows: int = 1024) -> np.ndarray:
    """Remove isolated full-range impulses (salt-and-pepper noise).

    A pixel is replaced by its 8-neighbor median only when it is extreme AND
    every neighbor sits far on the opposite side. Anti-aliased glyph features
    (i-dots, thin strokes, Khmer diacritics) always carry a mid-gray corona
    and are untouched — measured: 1 pixel changed across 160 clean crops,
    while docsynth-noisy CER drops 0.1655 -> 0.0039 (48 px) /
    0.0986 -> 0.0335 (22 px) combined with the blur stage. A plain median
    despike (|f - med| test) erases thin strokes instead (0.099 -> 0.30).

    Pages taller than ``band_rows`` are processed in row bands with a
    1-pixel halo (bit-identical: every 3x3 window is local), bounding the
    ~9x float32 window temporaries to band size instead of page size.
    """
    h = f.shape[0]
    if h > band_rows:
        out = np.empty_like(f)
        for y0 in range(0, h, band_rows):
            y1 = min(h, y0 + band_rows)
            lo, hi = max(0, y0 - 1), min(h, y1 + 1)
            out[y0:y1] = _despike(f[lo:hi])[y0 - lo: y0 - lo + (y1 - y0)]
        return out
    p = np.pad(f, 1, mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(
        p, (3, 3)).reshape(f.shape + (9,))
    nbrs = np.delete(win, 4, axis=-1)
    dark = (f <= 10.0) & (nbrs.min(axis=-1) >= 160.0)
    bright = (f >= 245.0) & (nbrs.max(axis=-1) <= 95.0)
    spikes = dark | bright
    if spikes.any():
        med = np.median(nbrs, axis=-1)
        f = np.where(spikes, med, f)
    return f


def estimate_noise_sigma(img: np.ndarray, max_px: int = 1_500_000) -> float:
    """Robust additive-noise estimate: 1.4826 * median(|img - median3(img)|).

    Clean renders and contrast-compressed (but noiseless) captures measure
    ~0; gaussian sensor noise of sigma 14-26 measures ~5-8 — cleanly
    separable with a threshold around NOISE_SIGMA_THRESH.

    Images above ``max_px`` pixels are stride-subsampled first: the
    estimator reads i.i.d. per-pixel noise, which survives striding, and
    the median is robust to the minority of glyph-edge pixels — so the
    estimate is scale-stable while the float32 temporaries stay bounded.
    """
    img = np.asarray(img)
    px = img.shape[0] * img.shape[1]
    if px > max_px:
        k = int(np.ceil(np.sqrt(px / max_px)))
        img = img[::k, ::k]
    f = img.astype(np.float32)
    return float(np.median(np.abs(f - _median3(f)))) * 1.4826


def enhance_crop(img: np.ndarray, noise_thresh: float = NOISE_SIGMA_THRESH,
                 range_thresh: float = 200.0, min_blur_height: int = 36,
                 sharpen: bool = False, target_h: int = 48) -> np.ndarray:
    """Adaptive cleanup for degraded line crops (uint8 in, uint8 out).

    Conditional repairs, each a no-op on clean input:

    * isolated full-range impulses -> 8-neighbor median (``_despike``);
      runs first at any scale so salt-and-pepper neither skews the noise
      estimate nor survives the blur
    * noise sigma > ``noise_thresh`` AND crop height >= ``min_blur_height``
      -> light gaussian blur (sigma 0.8). The height gate matters: at model
      scale (48 px) the blur cut noisy-crop CER 0.0441 -> 0.0019, but on
      small document-scale crops (~22 px glyphs) the same kernel destroys
      glyph detail (0.0166 -> 0.1954 measured). Small noisy crops are
      instead LINEAR-upscaled to ``target_h`` first and blurred at model
      scale (linear, not cubic: the resize path's cubic upscale crisps
      noise right back). Measured on docsynth-noisy 22 px renders:
      0.1358 raw-with-cubic-resize -> 0.0366.
    * ``sharpen=True`` (caller knows the crop came through a resampling
      transform, e.g. the deskew rotation) -> unsharp mask at native scale
      (amount 1.4, sigma 0.8; swept 0.6/1.0/1.4/1.8 -> 0.0398/0.0352/
      0.0289/0.0296): rotated-resample CER 0.0854 -> 0.0289 on 22 px
      renders. Skipped when the noise gate fired (sharpening would
      amplify noise).
    * p99 - p1 < ``range_thresh`` -> percentile contrast stretch, applied
      last so it never amplifies raw noise. Scale-independent: low-contrast
      CER 0.0174 -> 0.0059 at 48 px, 0.2398 -> 0.0052 at 22 px.

    All numbers measured with the round-3 flagship via
    scripts/eval_recognizer.py --degrade; clean crops are bit-identical.
    The reference has no equivalent stage; enable with
    ``OCR(..., enhance=True)``.
    """
    f = _despike(img.astype(np.float32))
    if estimate_noise_sigma(f) > noise_thresh:
        if img.shape[0] < min_blur_height:
            h, w = f.shape
            nw = max(1, round(w * target_h / h))
            u8 = np.clip(f, 0.0, 255.0).astype(np.uint8)
            if _HAS_CV2:
                f = cv2.resize(u8, (nw, target_h),
                               interpolation=cv2.INTER_LINEAR
                               ).astype(np.float32)
            else:
                f = np.asarray(Image.fromarray(u8).resize(
                    (nw, target_h), Image.BILINEAR), np.float32)
        f = _gauss08(f)
    elif sharpen:
        f = np.clip(f + 1.4 * (f - _gauss08(f)), 0.0, 255.0)
    lo, hi = np.percentile(f, 1.0), np.percentile(f, 99.0)
    # hi < 240 pins the stretch to genuinely compressed captures (no white
    # anywhere): dense-ink lines can have p99-p1 < 200 with a pure-white
    # background, and stretching those is a (measured CER-neutral but
    # non-identity) misfire.
    if hi < 240.0 and 1.0 < hi - lo < range_thresh:
        f = (f - lo) / (hi - lo) * 255.0
    return np.clip(f, 0.0, 255.0).astype(np.uint8)


def to_gray(img: np.ndarray) -> np.ndarray:
    if img.ndim == 3:
        if _HAS_CV2:
            return cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        return np.asarray(Image.fromarray(img[..., ::-1]).convert("L"), dtype=np.uint8)
    return img


def preprocess_np(cfg, img: np.ndarray) -> np.ndarray:
    """Grayscale ndarray -> uint8 [H, W] model input (no normalization)."""
    img = to_gray(img)
    img = invert_if_dark(img)
    return resize_keep_ratio_pad_np(img, cfg.IMG_H, cfg.IMG_W)


def crop_region(img_gray: np.ndarray, box: Tuple[int, int, int, int],
                extra_padding: int = 5) -> Optional[np.ndarray]:
    """Crop a detection box with bounds-checked padding
    (reference: kiri_ocr/core.py:489-517). Returns None for empty crops."""
    img_h, img_w = img_gray.shape[:2]
    x, y, w, h = box
    x1 = max(0, int(x) - extra_padding)
    y1 = max(0, int(y) - extra_padding)
    x2 = min(img_w, int(x) + int(w) + extra_padding)
    y2 = min(img_h, int(y) + int(h) + extra_padding)
    roi = img_gray[y1:y2, x1:x2]
    if roi.size == 0:
        return None
    return roi


def content_width(shape: Tuple[int, int], h: int, w: int) -> int:
    """Width the aspect-preserving resize-to-height-h produces, capped at w
    (i.e. how many columns of the padded [h, w] canvas hold real content)."""
    ih, iw = shape[:2]
    if ih <= 0 or iw <= 0:
        return w
    return min(w, max(1, int(round(iw * (h / float(ih))))))


def width_buckets(cfg) -> List[int]:
    """The usable width buckets for this config: configured buckets that fit
    inside IMG_W, with IMG_W itself always the final bucket."""
    bs = sorted(b for b in getattr(cfg, "WIDTH_BUCKETS", ()) if b < cfg.IMG_W)
    return bs + [cfg.IMG_W]


def pick_width_bucket(cfg, w: int) -> int:
    """Smallest width bucket that holds content width ``w``."""
    for b in width_buckets(cfg):
        if w <= b:
            return b
    return cfg.IMG_W


def preprocess_regions(cfg, img_gray: np.ndarray,
                       boxes: Sequence[Tuple[int, int, int, int]],
                       extra_padding: int = 5, enhance: bool = False,
                       sharpen: bool = False
                       ) -> Tuple[np.ndarray, List[int], np.ndarray]:
    """Crop + preprocess all boxes of a page into one uint8 [N, H, W] batch.

    Replaces the reference per-box Python/model round-trips
    (kiri_ocr/core.py:770-793) with a single host pass; the device then sees
    one batched call. Returns (batch, kept_indices, content_widths) where
    kept_indices maps batch rows back to input box indices (empty crops are
    dropped, matching the reference `continue`) and content_widths[i] is the
    number of non-pad columns of row i — the engine groups rows into width
    buckets from it so narrow lines skip full-width compute.
    """
    crops = []
    kept = []
    for i, box in enumerate(boxes):
        roi = crop_region(img_gray, box, extra_padding)
        if roi is None:
            continue
        crops.append(roi)
        kept.append(i)
    batch, widths = preprocess_crops(cfg, crops, enhance=enhance,
                                     sharpen=sharpen)
    return batch, kept, widths


def preprocess_crops(cfg, crops: Sequence[np.ndarray],
                     enhance: bool = False, sharpen=False
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Preprocess pre-cut line crops into one uint8 [N, H, W] batch.

    The crop-cutting half of ``preprocess_regions`` factored out: callers
    that extract crops themselves (the pipeline's deskew single-resample
    path, detect/deskew.extract_crop_single_resample) feed them here for
    invert-if-dark, optional ``enhance_crop``, and the aspect resize + pad.
    ``sharpen`` is a bool or a per-crop sequence (resample provenance —
    single-resample deskew crops don't need the double-resample repair).
    Returns (batch, content_widths).
    """
    n = len(crops)
    if isinstance(sharpen, (bool, np.bool_)):
        sharpen = [bool(sharpen)] * n
    out = []
    widths = []
    for roi, sh in zip(crops, sharpen):
        roi = invert_if_dark(to_gray(roi))
        if enhance:
            roi = enhance_crop(roi, sharpen=sh, target_h=cfg.IMG_H)
        widths.append(content_width(roi.shape, cfg.IMG_H, cfg.IMG_W))
        out.append(resize_keep_ratio_pad_np(roi, cfg.IMG_H, cfg.IMG_W))
    if not out:
        return (np.zeros((0, cfg.IMG_H, cfg.IMG_W), dtype=np.uint8),
                np.zeros((0,), np.int32))
    return np.stack(out), np.asarray(widths, np.int32)


def normalize_u8(batch_u8, dtype):
    """uint8 [..., H, W] -> normalized float [..., 1, H, W] on device.

    This is the device-side half of preprocessing; called inside jit so XLA
    fuses it with the stem convolution.
    """
    import jax.numpy as jnp

    x = batch_u8.astype(dtype) / jnp.asarray(255.0, dtype)
    x = (x - jnp.asarray(0.5, dtype)) / jnp.asarray(0.5, dtype)
    if x.ndim == 3:
        x = x[:, None]
    return x
