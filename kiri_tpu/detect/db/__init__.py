"""DB text detector: JAX network + native geometry post-processing.

Public behavior mirrors the reference DBDetector (kiri_ocr/detector/db/
model.py:25-518) — same constructor parameter surface incl. legacy aliases,
same algorithm chain (binarize -> components -> min-area rect -> box score ->
unclip -> rescale -> smart neighbor-aware padding -> reading-order sort) and
the same tunable thresholds. Differences are implementation-level and
TPU-first:

* the CNN is our first-party JAX DB net (detect/db/net.py), jit-compiled per
  input-shape bucket, instead of an ONNX Runtime session
* geometry runs in the first-party C++ library (kiri_tpu/native) instead of
  OpenCV + pyclipper
* input is grayscale normalized to [-1, 1] (the net is trained that way by
  our detector trainer) rather than ImageNet-normalized BGR
"""
from __future__ import annotations

import math
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from ... import native
from .net import db_forward, init_db_net

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


# Input-shape buckets (multiples of 32) to bound XLA compile count.
_SIZE_BUCKETS = (320, 448, 576, 704, 832, 960)


def _bucket(v: int) -> int:
    for b in _SIZE_BUCKETS:
        if b >= v:
            return b
    return _SIZE_BUCKETS[-1]


class DBDetector:
    """DB text detector (JAX). See module docstring for reference parity."""

    def __init__(
        self,
        model_path: Optional[str] = None,
        use_gpu: bool = False,  # accepted for API compat; device is TPU/JAX
        det_db_thresh: float = 0.3,
        det_db_box_thresh: float = 0.5,
        det_db_unclip_ratio: float = 1.6,
        max_side_len: int = 960,
        min_size: int = 3,
        binary_threshold: Optional[float] = None,
        polygon_threshold: Optional[float] = None,
        unclip_ratio: Optional[float] = None,
        input_size: Optional[Tuple[int, int]] = None,
        max_candidates: int = 1000,
        padding_pct: float = 0.01,
        padding_px: int = 5,
        padding_y_pct: float = 0.05,
        padding_y_px: int = 5,
        line_tolerance_ratio: float = 0.7,
        debug: bool = False,
        variables: Optional[Dict] = None,
        det_map_downsample: int = 1,
    ):
        # Legacy alias handling (reference: db/model.py:92-95).
        self.det_db_thresh = (binary_threshold if binary_threshold is not None
                              else det_db_thresh)
        self.det_db_box_thresh = (polygon_threshold
                                  if polygon_threshold is not None
                                  else det_db_box_thresh)
        self.det_db_unclip_ratio = (unclip_ratio if unclip_ratio is not None
                                    else det_db_unclip_ratio)
        self.max_side_len = max_side_len
        self.min_size = min_size
        self.max_candidates = max_candidates
        self.padding_pct = padding_pct
        self.padding_px = padding_px
        self.padding_y_pct = padding_y_pct
        self.padding_y_px = padding_y_px
        self.line_tolerance_ratio = line_tolerance_ratio
        self.debug = debug
        self.model_path = model_path
        # Serving knob (no reference equivalent): download the prob map at
        # 1/ds spatial resolution (2x2 mean-pool on device, bilinear
        # upsample on host). ds=2 cuts detection wire bytes ~40% per page;
        # measured on synthetic docs it preserves box COUNTS with <=4 px
        # coordinate shifts (crops carry >=5 px padding downstream).
        # Default 1 keeps the exact full-res maps.
        self.det_map_downsample = int(det_map_downsample)
        if self.det_map_downsample < 1 or 32 % self.det_map_downsample:
            # Canvases are /32-bucketed, so ds must divide 32 or the
            # device-side pool reshape fails mid-inference with an opaque
            # XLA error (and the pipeline would silently fall back to
            # per-page detection every call).
            raise ValueError(
                f"det_map_downsample must be a divisor of 32, got "
                f"{det_map_downsample}")

        import jax

        from ...utils.cache import enable_persistent_cache

        enable_persistent_cache()
        # .onnx routing: the reference's default detector is a pretrained
        # PP-OCR ONNX file run by onnxruntime (kiri_ocr/detector/db/
        # model.py:113-116). Here the graph is imported into JAX
        # (utils/onnx_import.py) and jit-compiled for TPU; post-processing
        # below is shared with the first-party net.
        self._onnx = None
        if variables is not None:
            self.variables = variables
        elif model_path and str(model_path).endswith(".onnx"):
            if not Path(model_path).exists():
                raise FileNotFoundError(f"DB model not found at {model_path}")
            from ...utils.onnx_import import import_onnx

            self._onnx = import_onnx(model_path)
            self.variables = self._onnx.params
        elif model_path and Path(model_path).exists():
            self.variables = load_db_checkpoint(model_path)
        else:
            raise FileNotFoundError(f"DB model not found at {model_path}")

        # uint8 in: the page upload crosses the host<->device link once per
        # document, so shipping u8 (4x fewer bytes than f32) cuts the upload
        # cost; normalize runs fused on device. The prob map downloads as
        # u16 fixed-point (see _fwd_u8 below), optionally mean-pooled by
        # det_map_downsample.
        import jax.numpy as jnp

        ds = self.det_map_downsample

        def _pool(prob):
            """[..., H, W] -> [..., H/ds, W/ds] mean pool (ds=1: no-op)."""
            if ds <= 1:
                return prob
            *lead, h, w = prob.shape
            return prob.reshape(*lead, h // ds, ds, w // ds, ds).mean(
                axis=(-3, -1))

        if self._onnx is not None:
            # PP-OCR graphs take ImageNet-normalized NCHW RGB; the pipeline
            # is grayscale by this point, so the gray canvas is replicated
            # across channels (mean/std from db/model.py:125-126).
            _mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
            _std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)

            def _onnx_prob(params, canvas_u8):
                """uint8 [..., H, W] -> prob [..., H, W] via the ONNX graph."""
                x = canvas_u8.astype(jnp.float32) / 255.0
                lead = x.shape[:-2]
                x = x.reshape((-1, 1) + x.shape[-2:])          # [B,1,H,W]
                # broadcasting [B,1,H,W] against [1,3,1,1] replicates the
                # gray channel to RGB while applying per-channel norm
                x = (x - _mean[None, :, None, None]) / _std[None, :, None, None]
                out = self._onnx.apply(params, x)
                if isinstance(out, tuple):
                    out = out[0]
                return out.reshape(lead + out.shape[-2:])

            def _fwd_u8(variables, canvas_u8):
                prob = _onnx_prob(variables, canvas_u8[None])
                return jnp.round(_pool(prob[0]) * 65535.0).astype(jnp.uint16)

            def _fwd_u8_batch(variables, canvas_u8):
                prob = _onnx_prob(variables, canvas_u8)
                return jnp.round(_pool(prob) * 65535.0).astype(jnp.uint16)

            self._fwd = jax.jit(_fwd_u8)
            self._fwd_batch = jax.jit(_fwd_u8_batch)
            return

        def _fwd_u8(variables, canvas_u8):
            x = (canvas_u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
            prob, _, _ = db_forward(variables, x[None, ..., None], train=False)
            # u16 fixed-point download (prob * 65535): the page prob map is
            # the dominant wire cost of document detection (~1.6 MB f32 per
            # 640px page over a ~27 MB/s link) and f16 was measured to move
            # marginal boxes — its rounding step near the 0.3 threshold is
            # ~2.4e-4. u16's step (1.5e-5) is 16x finer than that while
            # still halving the download.
            return jnp.round(_pool(prob[0]) * 65535.0).astype(jnp.uint16)

        self._fwd = jax.jit(_fwd_u8)

        def _fwd_u8_batch(variables, canvas_u8):
            x = (canvas_u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
            prob, _, _ = db_forward(variables, x[..., None], train=False)
            return jnp.round(_pool(prob) * 65535.0).astype(jnp.uint16)

        self._fwd_batch = jax.jit(_fwd_u8_batch)

    # ------------------------------------------------------------ preprocess
    def _resize_image(self, img: np.ndarray):
        """Resize to a /32-bucketed canvas (pad bottom/right with white)."""
        h, w = img.shape[:2]
        ratio = 1.0
        if max(h, w) > self.max_side_len:
            ratio = self.max_side_len / max(h, w)
        new_h = max(32, int(round(h * ratio / 32) * 32))
        new_w = max(32, int(round(w * ratio / 32) * 32))
        if _HAS_CV2:
            resized = cv2.resize(img, (new_w, new_h))
        else:
            from PIL import Image

            resized = np.asarray(Image.fromarray(img).resize((new_w, new_h)))
        canvas_h, canvas_w = _bucket(new_h), _bucket(new_w)
        canvas = np.full((canvas_h, canvas_w), 255, np.uint8)
        canvas[:new_h, :new_w] = resized
        return canvas, (new_h, new_w), (h, w)

    @staticmethod
    def _to_gray(img: np.ndarray) -> np.ndarray:
        if img.ndim == 3:
            if img.shape[2] == 4:
                img = img[..., :3]
            if _HAS_CV2:
                return cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            return np.asarray(
                np.dot(img[..., ::-1], [0.299, 0.587, 0.114]), np.uint8)
        return img

    def _to_prob(self, wire: np.ndarray, net_h: int, net_w: int
                 ) -> np.ndarray:
        """u16 wire map -> f32 prob cropped to content (bilinear-upsampled
        back to canvas resolution when det_map_downsample > 1)."""
        prob = wire.astype(np.float32) / 65535.0
        ds = self.det_map_downsample
        if ds > 1:
            h, w = prob.shape[0] * ds, prob.shape[1] * ds
            if _HAS_CV2:
                prob = cv2.resize(prob, (w, h),
                                  interpolation=cv2.INTER_LINEAR)
            else:
                from PIL import Image

                prob = np.asarray(
                    Image.fromarray(prob).resize((w, h), Image.BILINEAR),
                    np.float32)
        return prob[:net_h, :net_w]

    # -------------------------------------------------------------- inference
    def predict_maps(self, img: np.ndarray) -> Tuple[np.ndarray, Tuple]:
        """Gray uint8 page -> (prob map cropped to content, scale info)."""
        import jax.numpy as jnp

        canvas, (net_h, net_w), (orig_h, orig_w) = self._resize_image(img)
        prob = self._fwd(self.variables, jnp.asarray(canvas))
        prob = self._to_prob(np.asarray(prob), net_h, net_w)
        return prob, (net_h, net_w, orig_h, orig_w)

    def _iter_maps_batch(self, imgs: List[np.ndarray]):
        """Yield (page index, prob map, scale info) as downloads land.

        ALL same-canvas pages run through batched forwards: one upload +
        one dispatch per (canvas shape, batch bucket) group, and every
        group's host copy is started async up front — so the caller's
        per-page CPU postproc overlaps the remaining wire transfers.
        This is where pooled multi-document throughput comes from on a
        link-bound host — detection is ~100 ms/page run serially (the
        reference runs one ONNX session call per page; it has no batch
        API at all)."""
        import jax.numpy as jnp

        from .._batch import iter_grouped_batches

        canvases, infos = [], []
        for img in imgs:
            canvas, (net_h, net_w), (orig_h, orig_w) = self._resize_image(img)
            canvases.append(canvas)
            infos.append((net_h, net_w, orig_h, orig_w))
        for chunk, arr in iter_grouped_batches(
                canvases,
                lambda a: self._fwd_batch(self.variables, jnp.asarray(a))):
            for r, i in enumerate(chunk):
                net_h, net_w, orig_h, orig_w = infos[i]
                yield i, self._to_prob(arr[r], net_h, net_w), infos[i]

    def predict_maps_batch(self, imgs: List[np.ndarray]):
        """Gray uint8 pages -> [(prob map, scale info), ...] via grouped
        batched forwards (see _iter_maps_batch)."""
        out: List = [None] * len(imgs)
        for i, prob, info in self._iter_maps_batch(imgs):
            out[i] = (prob, info)
        return out

    def iter_detect_text(self, images: List):
        """Yield (page index, ``detect_text`` result) in download-arrival
        order (see _iter_maps_batch): page postproc runs while later
        pages' maps are still on the wire, and callers can do their own
        per-page CPU work under the remaining transfers too."""
        from ...ops.preprocess import invert_if_dark

        grays = [invert_if_dark(self._to_gray(self._load_bgr(image)))
                 for image in images]
        for i, pred, (net_h, net_w, orig_h, orig_w) in \
                self._iter_maps_batch(grays):
            boxes, scores = self._finish_page(pred, orig_w, orig_h)
            yield i, self._padded_sorted(boxes, scores)

    def detect_text_batch(self, images: List) -> List[List]:
        """Batched ``detect_text``: same per-page results, grouped batched
        net forwards across all pages (see iter_detect_text)."""
        results: List = [None] * len(images)
        for i, res in self.iter_detect_text(images):
            results[i] = res
        return results

    # ------------------------------------------------------------- postproc
    def _get_mini_boxes(self, points: np.ndarray) -> Tuple[np.ndarray, float]:
        """Sorted min-area quad + short side (reference db/model.py:161-178)."""
        rect = native.min_area_rect(points)
        pts = sorted(native.box_points(rect).tolist(), key=lambda p: p[0])
        if pts[1][1] > pts[0][1]:
            i1, i4 = 0, 1
        else:
            i1, i4 = 1, 0
        if pts[3][1] > pts[2][1]:
            i2, i3 = 2, 3
        else:
            i2, i3 = 3, 2
        box = np.array([pts[i1], pts[i2], pts[i3], pts[i4]])
        return box, min(rect[1])

    def _unclip(self, box: np.ndarray) -> Optional[np.ndarray]:
        area, perim = native.polygon_area_perimeter(box)
        if area == 0 or perim == 0:
            return None
        distance = area * self.det_db_unclip_ratio / perim
        return native.offset_polygon(box.astype(float), distance)

    def _boxes_from_bitmap(self, pred: np.ndarray, bitmap: np.ndarray,
                           dest_w: int, dest_h: int):
        height, width = bitmap.shape
        n, labels, stats = native.connected_components(
            bitmap, max_components=self.max_candidates)
        boxes, scores = [], []
        for comp in range(1, n + 1):
            if stats[comp - 1, 4] < 4:
                continue
            pts = native.component_boundary(labels, comp)
            if len(pts) < 4:
                continue
            box, sside = self._get_mini_boxes(pts)
            if sside < self.min_size:
                continue
            score = native.box_score(pred, box)
            if score < self.det_db_box_thresh:
                continue
            expanded = self._unclip(box)
            if expanded is None:
                continue
            box, sside = self._get_mini_boxes(expanded)
            if sside < self.min_size + 2:
                continue
            box[:, 0] = np.clip(box[:, 0] / width * dest_w, 0, dest_w)
            box[:, 1] = np.clip(box[:, 1] / height * dest_h, 0, dest_h)
            boxes.append(box.astype(np.int32))
            scores.append(float(score))
        return boxes, scores

    def _finish_page(self, pred: np.ndarray, orig_w: int, orig_h: int):
        """prob map -> (raw boxes, scores); shared by the single-page and
        batched paths so threshold/debug behavior cannot diverge."""
        bitmap = (pred > self.det_db_thresh).astype(np.uint8)
        if self.debug:
            print(f"  pred {pred.shape} max={pred.max():.3f} "
                  f"fg={int(bitmap.sum())}")
        return self._boxes_from_bitmap(pred, bitmap, orig_w, orig_h)

    def _padded_sorted(self, boxes, scores):
        """raw boxes -> smart-padded (box, score) list in reading order."""
        if not boxes:
            return []
        padded = self._apply_smart_padding(boxes)
        return self._sort_boxes_reading_order(list(zip(padded, scores)))

    def detect(self, img: np.ndarray, return_scores: bool = False):
        if img is None:
            return ([], []) if return_scores else []
        gray = self._to_gray(img)
        # Dark-mode pages (white-on-black) are outside the net's training
        # distribution; normalize polarity like the recognizer preprocess
        # does (reference: kiri_ocr/core.py:524-526).
        from ...ops.preprocess import invert_if_dark

        gray = invert_if_dark(gray)
        pred, (net_h, net_w, orig_h, orig_w) = self.predict_maps(gray)
        boxes, scores = self._finish_page(pred, orig_w, orig_h)
        return (boxes, scores) if return_scores else boxes

    # -------------------------------------------------- padding + sort (ref)
    @staticmethod
    def _bounding_rect(box: np.ndarray) -> Tuple[int, int, int, int]:
        x0, y0 = box[:, 0].min(), box[:, 1].min()
        x1, y1 = box[:, 0].max(), box[:, 1].max()
        return int(x0), int(y0), int(x1 - x0), int(y1 - y0)

    def _apply_smart_padding(self, boxes: List[np.ndarray]) -> List[np.ndarray]:
        """Neighbor-clamped expansion (reference db/model.py:335-415)."""
        if not boxes:
            return []
        n = len(boxes)
        aabbs = [self._bounding_rect(b) for b in boxes]
        max_pad_w = np.full(n, np.inf)
        max_pad_h = np.full(n, np.inf)
        for i in range(n):
            xi, yi, wi, hi = aabbs[i]
            for j in range(n):
                if i == j:
                    continue
                xj, yj, wj, hj = aabbs[j]
                if max(yi, yj) < min(yi + hi, yj + hj):  # y-band overlap
                    if xi >= xj + wj:
                        dist_x = xi - (xj + wj)
                    elif xj >= xi + wi:
                        dist_x = xj - (xi + wi)
                    else:
                        dist_x = 0
                    max_pad_w[i] = min(max_pad_w[i], dist_x)
                if max(xi, xj) < min(xi + wi, xj + wj):  # x-band overlap
                    if yi >= yj + hj:
                        dist_y = yi - (yj + hj)
                    elif yj >= yi + hi:
                        dist_y = yj - (yi + hi)
                    else:
                        dist_y = 0
                    max_pad_h[i] = min(max_pad_h[i], dist_y)

        out = []
        for i, box in enumerate(boxes):
            (cx, cy), (w, h), angle = native.min_area_rect(box.astype(float))
            if w < h:
                w, h = h, w
                angle += 90
            target_pad_w = (w * self.padding_pct) + (h * 0.5) + self.padding_px
            target_pad_h = (h * self.padding_y_pct) + self.padding_y_px
            # Shared-budget clamp: the reference (db/model.py:404-406) lets a
            # box consume the ENTIRE gap to its nearest neighbor — when both
            # sides do, the padded boxes end up touching and the recognizer's
            # +5px crop window bleeds the neighboring line's pixels into the
            # crop (dense layouts merge lines). Each box may take at most
            # half the gap, so half the clearance always survives padding.
            pw = min(target_pad_w, max(0.0, max_pad_w[i] * 0.5))
            ph = min(target_pad_h, max(0.0, max_pad_h[i] * 0.5))
            new_box = native.box_points(((cx, cy), (w + pw, h + ph), angle))
            out.append(np.int32(np.round(new_box)))
        return out

    def _sort_boxes_reading_order(self, results):
        """Median-height line grouping (reference db/model.py:265-333)."""
        if not results:
            return []
        data = []
        for box, conf in results:
            x, y, w, h = self._bounding_rect(box)
            data.append({"box": box, "conf": conf, "cy": y + h / 2,
                         "x": x, "h": h})
        data.sort(key=lambda b: b["cy"])
        median_h = float(np.median([b["h"] for b in data])) if data else 20.0
        y_tol = median_h * 0.8
        lines, current = [], []
        for item in data:
            if not current:
                current.append(item)
                continue
            avg_y = np.mean([b["cy"] for b in current])
            if abs(item["cy"] - avg_y) < y_tol:
                current.append(item)
            else:
                lines.append(current)
                current = [item]
        if current:
            lines.append(current)
        out = []
        for line in lines:
            line.sort(key=lambda b: b["x"])
            out.extend((i["box"], i["conf"]) for i in line)
        return out

    # ----------------------------------------------------------- public API
    @staticmethod
    def _load_bgr(image: Union[str, Path, np.ndarray]) -> np.ndarray:
        """Path or array -> BGR/gray ndarray (reference db/model.py:487-495)."""
        if isinstance(image, (str, Path)):
            if _HAS_CV2:
                img = cv2.imread(str(image))
            else:
                from PIL import Image

                img = np.asarray(Image.open(image).convert("RGB"))[..., ::-1]
            if img is None:
                raise ValueError(f"Image not found at {image}")
            return img
        if isinstance(image, np.ndarray):
            return image
        raise TypeError("Image must be a path or numpy array")

    def detect_text(self, image: Union[str, Path, np.ndarray]):
        """(box quad, confidence) list in reading order."""
        boxes, scores = self.detect(self._load_bgr(image),
                                    return_scores=True)
        return self._padded_sorted(boxes, scores)

    def __call__(self, img: np.ndarray):
        return self.detect(img)


# ---------------------------------------------------------------------------
# Checkpoint I/O
# ---------------------------------------------------------------------------
def save_db_checkpoint(path, variables) -> None:
    from safetensors.numpy import save_file

    import jax

    from ...utils.transfer import faithful_device_get

    # Checksum-verified download: the experimental TPU backend can return
    # wrong data for some arrays produced by donated computations
    # (see utils/transfer.py).
    variables = {"params": faithful_device_get(variables["params"]),
                 "batch_stats": faithful_device_get(variables["batch_stats"])}

    flat = {}

    def walk(prefix, tree, out):
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(key, v, out)
            else:
                # C-contiguity required: raw-memory serialization scrambles
                # stride-transposed arrays (see utils/transfer.py).
                out[key] = np.ascontiguousarray(np.asarray(v, np.float32))

    walk("params", jax.device_get(variables["params"]), flat)
    walk("stats", jax.device_get(variables["batch_stats"]), flat)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    save_file(flat, str(path))


def load_db_checkpoint(path) -> Dict:
    from safetensors.numpy import load_file

    import jax.numpy as jnp

    flat = load_file(str(path))
    params: Dict = {}
    stats: Dict = {}
    for key, val in flat.items():
        parts = key.split(".")
        root = params if parts[0] == "params" else stats
        node = root
        for p in parts[1:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return {"params": params, "batch_stats": stats}
