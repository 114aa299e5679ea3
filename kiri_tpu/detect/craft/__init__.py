"""CRAFT text detector: JAX net + first-party box extraction.

Behavior parity with the reference wrapper (kiri_ocr/detector/craft/
model.py:191-292 + craft/utils.py:16-99): resize with aspect ratio to a
/32-padded canvas (canvas 1280, mag ratio 1.5), run the net, threshold the
region/affinity score maps, combine, connected components, per-component
dilation, min-area rect, and rescale coordinates by the 2x net ratio.
Geometry uses the first-party native library instead of OpenCV.
"""
from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from ... import native
from .net import craft_forward, init_craft_net

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def resize_aspect_ratio(img: np.ndarray, square_size: int, mag_ratio: float
                        ) -> Tuple[np.ndarray, float]:
    """Aspect-preserving magnified resize padded to /32
    (reference craft/imgproc.py:73-114)."""
    h, w = img.shape[:2]
    target = mag_ratio * max(h, w)
    if target > square_size:
        target = square_size
    ratio = target / max(h, w)
    nh, nw = int(h * ratio), int(w * ratio)
    if _HAS_CV2:
        proc = cv2.resize(img, (nw, nh))
    else:
        from PIL import Image

        proc = np.asarray(Image.fromarray(img).resize((nw, nh)))
    ch = nh + (32 - nh % 32) % 32
    cw = nw + (32 - nw % 32) % 32
    canvas = np.zeros((ch, cw), dtype=img.dtype)
    canvas[:nh, :nw] = proc
    return canvas, ratio


def get_det_boxes(textmap: np.ndarray, linkmap: np.ndarray,
                  text_threshold: float, link_threshold: float,
                  low_text: float, poly: bool = False):
    """Score maps -> min-area quads (reference craft/utils.py:16-99).

    With ``poly=True`` also returns per-box polygon outlines (None where
    the quad is the better description), mirroring the reference dispatch
    (craft/utils.py:271-281).
    """
    boxes, labels, mapper = _det_boxes_core(textmap, linkmap, text_threshold,
                                            link_threshold, low_text)
    if not poly:
        return boxes
    from .poly import get_poly_core

    return boxes, get_poly_core(boxes, labels, mapper)


def _det_boxes_core(textmap: np.ndarray, linkmap: np.ndarray,
                    text_threshold: float, link_threshold: float,
                    low_text: float):
    """Returns (quads, label_map, mapper: component id per quad)."""
    text_score = (textmap >= low_text).astype(np.uint8)
    link_score = (linkmap >= link_threshold).astype(np.uint8)
    combined = np.clip(text_score + link_score, 0, 1).astype(np.uint8)

    n, labels, stats = native.connected_components(combined)
    boxes = []
    mapper = []
    for comp in range(1, n + 1):
        x, y, w, h, size = stats[comp - 1]
        if size < 10:
            continue
        if textmap[labels == comp].max() < text_threshold:
            continue
        # Dilate the component segmentation before the rect
        # (reference craft/utils.py:60-75).
        seg = np.zeros_like(combined)
        mask = labels == comp
        seg[mask & ~(link_score.astype(bool) & ~text_score.astype(bool))] = 1
        niter = int(np.sqrt(size * min(w, h) / max(w * h, 1)) * 2)
        pad = niter
        x0, y0 = max(0, x - pad), max(0, y - pad)
        x1 = min(seg.shape[1], x + w + pad + 1)
        y1 = min(seg.shape[0], y + h + pad + 1)
        window = seg[y0:y1, x0:x1]
        if niter > 0:
            window = native.dilate(window, 1 + 2 * niter)
        ys, xs = np.nonzero(window)
        if len(xs) < 4:
            continue
        pts = np.stack([xs + x0, ys + y0], axis=1).astype(np.float64)
        rect = native.min_area_rect(pts)
        box = native.box_points(rect)
        # Align diamond-shaped rects to axis (reference utils.py:80-88).
        bw = np.linalg.norm(box[0] - box[1])
        bh = np.linalg.norm(box[1] - box[2])
        ratio = max(bw, bh) / (min(bw, bh) + 1e-5)
        if abs(1 - ratio) <= 0.1:
            l, r = xs.min() + x0, xs.max() + x0
            t, b = ys.min() + y0, ys.max() + y0
            box = np.array([[l, t], [r, t], [r, b], [l, b]], dtype=np.float32)
        # Clockwise order starting top-left.
        startidx = box.sum(axis=1).argmin()
        box = np.roll(box, 4 - startidx, 0)
        boxes.append(box)
        mapper.append(comp)
    return boxes, labels, mapper


class CRAFTDetector:
    """CRAFT wrapper with the reference parameter surface
    (canvas_size=1280, mag_ratio=1.5, thresholds per craft/model.py:254-257)."""

    def __init__(self, model_path: Optional[str] = None,
                 text_threshold: float = 0.7, link_threshold: float = 0.4,
                 low_text: float = 0.4, canvas_size: int = 1280,
                 mag_ratio: float = 1.5, variables: Optional[Dict] = None):
        import jax

        from ...utils.cache import enable_persistent_cache

        enable_persistent_cache()
        self.text_threshold = text_threshold
        self.link_threshold = link_threshold
        self.low_text = low_text
        self.canvas_size = canvas_size
        self.mag_ratio = mag_ratio
        self.model_path = model_path

        if variables is not None:
            self.variables = variables
        elif model_path and Path(model_path).exists():
            self.variables = load_craft_checkpoint(model_path)
        else:
            raise FileNotFoundError(f"CRAFT model not found at {model_path}")
        # uint8 in, sigmoid'd float16 maps out: one upload + one download
        # per document at minimal wire bytes (see DBDetector._fwd note).
        import jax.numpy as jnp

        def _fwd_u8(variables, canvas_u8):
            x = (canvas_u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
            region, affinity, _ = craft_forward(variables, x[None, ..., None],
                                                train=False)
            return (jax.nn.sigmoid(region[0]).astype(jnp.float16),
                    jax.nn.sigmoid(affinity[0]).astype(jnp.float16))

        self._fwd = jax.jit(_fwd_u8)

        def _fwd_u8_batch(variables, canvas_u8):
            x = (canvas_u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
            region, affinity, _ = craft_forward(variables, x[..., None],
                                                train=False)
            return (jax.nn.sigmoid(region).astype(jnp.float16),
                    jax.nn.sigmoid(affinity).astype(jnp.float16))

        self._fwd_batch = jax.jit(_fwd_u8_batch)

    def _load_gray(self, image) -> np.ndarray:
        if isinstance(image, (str, Path)):
            if _HAS_CV2:
                img = cv2.imread(str(image), cv2.IMREAD_GRAYSCALE)
            else:
                from PIL import Image

                img = np.asarray(Image.open(image).convert("L"))
            if img is None:
                raise ValueError(f"Image not found: {image}")
            return img
        img = np.asarray(image)
        if img.ndim == 3:
            if _HAS_CV2:
                return cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            return np.asarray(np.dot(img[..., ::-1],
                                     [0.299, 0.587, 0.114]), np.uint8)
        return img

    def predict_maps(self, gray: np.ndarray) -> Tuple[np.ndarray, np.ndarray, float]:
        import jax
        import jax.numpy as jnp

        from ...ops.preprocess import invert_if_dark

        # Polarity guard: dark-mode pages sit outside the training
        # distribution (reference recognizer preprocess does the same,
        # kiri_ocr/core.py:524-526).
        gray = invert_if_dark(gray)
        canvas, ratio = resize_aspect_ratio(gray, self.canvas_size,
                                            self.mag_ratio)
        region, affinity = jax.device_get(
            self._fwd(self.variables, jnp.asarray(canvas)))
        return (np.asarray(region, np.float32),
                np.asarray(affinity, np.float32), ratio)

    def detect_text(self, image, poly: bool = False
                    ) -> List[Tuple[np.ndarray, float]]:
        """(points, confidence) list; coordinates in original image space.

        points is a [4,2] quad, or with ``poly=True`` a polygon outline
        where one was found (quad otherwise) — reference wrapper flag
        semantics (craft/model.py:223-291: polys[k] falls back to boxes[k]).
        """
        gray = self._load_gray(image)
        region, affinity, ratio = self.predict_maps(gray)
        return self._postprocess(gray, region, affinity, ratio, poly)

    def _postprocess(self, gray, region, affinity, ratio, poly):
        if poly:
            boxes, polys = get_det_boxes(region, affinity,
                                         self.text_threshold,
                                         self.link_threshold, self.low_text,
                                         poly=True)
            shapes = [p if p is not None else b
                      for b, p in zip(boxes, polys)]
        else:
            shapes = get_det_boxes(region, affinity, self.text_threshold,
                                   self.link_threshold, self.low_text)
            boxes = shapes
        # Net output is half-res; adjust by 2/ratio (craft/utils.py:297-315).
        results = []
        for quad, pts in zip(boxes, shapes):
            scaled = pts * (2.0 / ratio)
            xs = np.clip(scaled[:, 0], 0, gray.shape[1])
            ys = np.clip(scaled[:, 1], 0, gray.shape[0])
            # min_area_rect corners can fall slightly outside the map on
            # rotated pages; clip BOTH axes (a negative iy0 would python-
            # wrap the slice to empty and .max() on it throws).
            ix0, iy0 = max(0, int(quad[:, 0].min())), max(0, int(quad[:, 1].min()))
            ix1 = min(region.shape[1], int(quad[:, 0].max()) + 1)
            iy1 = min(region.shape[0], int(quad[:, 1].max()) + 1)
            conf = (float(region[iy0:iy1, ix0:ix1].max())
                    if (ix1 > ix0 and iy1 > iy0) else 1.0)
            results.append((np.stack([xs, ys], axis=1).astype(np.float32),
                            conf))
        return results

    def _iter_maps_batch(self, grays: List[np.ndarray]):
        """Yield (page index, region, affinity, ratio) as downloads land:
        one upload + dispatch per (canvas shape, batch bucket) group, all
        host copies started async up front so the caller's per-page CPU
        postproc overlaps the remaining transfers (see detect/_batch.py)."""
        import jax.numpy as jnp

        from ...ops.preprocess import invert_if_dark
        from .._batch import iter_grouped_batches

        canvases, ratios = [], []
        for gray in grays:
            canvas, ratio = resize_aspect_ratio(invert_if_dark(gray),
                                                self.canvas_size,
                                                self.mag_ratio)
            canvases.append(canvas)
            ratios.append(ratio)
        for chunk, (regs, affs) in iter_grouped_batches(
                canvases,
                lambda a: self._fwd_batch(self.variables, jnp.asarray(a))):
            for r, i in enumerate(chunk):
                yield (i, regs[r].astype(np.float32),
                       affs[r].astype(np.float32), ratios[i])

    def predict_maps_batch(self, grays: List[np.ndarray]):
        """Gray uint8 pages -> [(region, affinity, ratio), ...] via
        grouped batched forwards (see _iter_maps_batch)."""
        out: List = [None] * len(grays)
        for i, region, affinity, ratio in self._iter_maps_batch(grays):
            out[i] = (region, affinity, ratio)
        return out

    def iter_detect_text(self, images: List, poly: bool = False):
        """Yield (page index, ``detect_text`` result) in download-arrival
        order; page postproc overlaps later pages' downloads."""
        grays = [self._load_gray(image) for image in images]
        for i, region, affinity, ratio in self._iter_maps_batch(grays):
            yield i, self._postprocess(grays[i], region, affinity,
                                       ratio, poly)

    def detect_text_batch(self, images: List, poly: bool = False
                          ) -> List[List[Tuple[np.ndarray, float]]]:
        """Batched ``detect_text``: same per-page results, grouped batched
        net forwards across all pages (see iter_detect_text)."""
        results: List = [None] * len(images)
        for i, res in self.iter_detect_text(images, poly=poly):
            results[i] = res
        return results


# ---------------------------------------------------------------------------
def save_craft_checkpoint(path, variables) -> None:
    from ..db import save_db_checkpoint

    save_db_checkpoint(path, variables)  # same flat safetensors layout


def load_craft_checkpoint(path) -> Dict:
    from ..db import load_db_checkpoint

    return load_db_checkpoint(path)
