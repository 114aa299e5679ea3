"""Unified text-detection facade.

Routing / fallback semantics mirror the reference ``TextDetector``
(reference: kiri_ocr/detector/__init__.py:28-397): method 'db' | 'craft' |
'legacy', with any backend failure falling back to the classic-CV detector;
polygon outputs are converted to ``TextBox`` rows, sorted in reading order,
and optionally merged.
"""
from __future__ import annotations

import os
import warnings
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from .base import DetectionLevel, TextBox
from .legacy import ImageProcessingTextDetector

try:
    from .db import DBDetector
except Exception:  # pragma: no cover
    DBDetector = None

try:
    from .craft import CRAFTDetector
except Exception:  # pragma: no cover
    CRAFTDetector = None


class TextDetector:
    """Unified detector facade with db / craft / legacy backends."""

    def __init__(self, method: str = "db", model_path: Optional[str] = None, **kwargs):
        self.conf_threshold = kwargs.pop("conf_threshold", 0.25)
        #: Straighten skewed pages before detection (detect/deskew.py) and
        #: map boxes back to the input frame. Off by default to match the
        #: reference surface; `last_skew_angle` records the estimate.
        self.deskew = kwargs.pop("deskew", False)
        #: Angles below this are left alone: the trained detectors absorb
        #: sub-degree skew, and estimator noise on busy upright pages can
        #: reach ~0.5deg (measured: deskewing those cost english-row recall).
        self.deskew_min_angle = kwargs.pop("deskew_min_angle", 1.0)
        self.last_skew_angle = 0.0
        #: Split detected boxes that bridge an aligned column gutter
        #: (_split_column_merges); off restores raw backend boxes.
        self.split_columns = kwargs.pop("split_columns", True)
        self.last_deskewed_image = None   # set per-page when deskew fires
        self.last_deskew_boxes = None     # deskewed-frame twins of the result
        self.last_deskew_angle = 0.0      # APPLIED angle (0.0 = not fired)
        self.method = method
        self.kwargs = kwargs
        self.craft_detector = None
        self.db_detector = None

        if model_path is None and self.method in ("db", "craft"):
            model_path = self._find_default_model()
        elif (model_path and "/" in model_path
              and not os.path.exists(model_path)
              and not model_path.startswith((".", "/"))):
            # Repo-id form, e.g. "org/name": fetch from the HF hub
            # (reference: kiri_ocr/detector/__init__.py:82-107).
            model_path = self._download_from_hub(model_path) or model_path
        self.model_path = model_path

        if self.method == "craft":
            if CRAFTDetector is None:
                warnings.warn("CRAFT detector not available. Falling back to legacy.")
                self.method = "legacy"
            else:
                try:
                    self.craft_detector = CRAFTDetector(model_path=self.model_path)
                except Exception as e:
                    print(f"Error loading CRAFT detector: {e}. Falling back to legacy.")
                    self.method = "legacy"
        elif self.method == "db":
            if DBDetector is None:
                warnings.warn("DB detector not available. Falling back to legacy.")
                self.method = "legacy"
            else:
                try:
                    if self.model_path and os.path.exists(self.model_path):
                        db_keys = ["det_db_thresh", "det_db_box_thresh",
                                   "det_db_unclip_ratio", "max_side_len", "min_size",
                                   "binary_threshold", "polygon_threshold",
                                   "unclip_ratio", "max_candidates", "padding_pct",
                                   "padding_px", "padding_y_pct", "padding_y_px",
                                   "line_tolerance_ratio", "debug",
                                   "det_map_downsample"]
                        db_kwargs = {k: v for k, v in self.kwargs.items() if k in db_keys}
                        self.db_detector = DBDetector(self.model_path, **db_kwargs)
                    else:
                        print(f"Warning: DB model path not found: {self.model_path}")
                        self.method = "legacy"
                except Exception as e:
                    print(f"Error loading DB detector: {e}. Falling back to legacy.")
                    self.method = "legacy"

        self.legacy_detector = ImageProcessingTextDetector(**kwargs)

    #: Official model repo tried when no local checkpoint exists
    #: (reference: kiri_ocr/detector/__init__.py:77-79).
    DEFAULT_HUB_REPO = "mrrtmob/kiri-ocr"

    def _find_default_model(self) -> Optional[str]:
        fname = {"db": "detector.safetensors",
                 "craft": "craft.safetensors"}[self.method]
        pkg_dir = Path(__file__).resolve().parent
        repo_root = pkg_dir.parent.parent
        candidates = [
            Path("models") / fname,
            Path(fname),
            pkg_dir / fname,
            repo_root / "models" / fname,
        ]
        for p in candidates:
            if p.exists():
                return str(p)
        # No local checkpoint: try the official hub repo before giving up
        # (reference: kiri_ocr/detector/__init__.py:82-107; legacy fallback
        # still applies when offline or the file is absent).
        return self._download_from_hub(self.DEFAULT_HUB_REPO)

    def _download_from_hub(self, repo_id: str) -> Optional[str]:
        """Fetch a detector checkpoint from the HF hub; None when offline.

        Tries the TPU-format safetensors layouts. The reference's ONNX
        artifact (detector/DB/detector.onnx) is deliberately not fetched:
        this framework's DB net is a first-party trainable JAX model with
        its own checkpoint format, not an ONNX runtime wrapper.
        """
        fname = {"db": "detector.safetensors",
                 "craft": "craft.safetensors"}.get(self.method)
        if fname is None:
            return None
        try:
            from huggingface_hub import hf_hub_download
        except Exception:
            return None
        for remote in (f"detector/{fname}", fname, f"models/{fname}"):
            try:
                local = hf_hub_download(repo_id=repo_id, filename=remote)
                if local and os.path.exists(local):
                    return local
            except Exception:
                continue
        print(f"Warning: could not find a {self.method} detector model in "
              f"HuggingFace repo: {repo_id}")
        return None

    # --------------------------------------------------------------- lines
    def detect_lines(self, image) -> List[Tuple[int, int, int, int]]:
        return [b.bbox for b in self.detect_lines_objects(image)]

    def detect_lines_objects(self, image) -> List[TextBox]:
        # Reset per-page deskew state: consumers (pipeline._recognize_regions)
        # crop from last_deskewed_image when it is set, so stale state from a
        # previous page must never leak into this one.
        self.last_deskewed_image = None
        self.last_deskew_boxes = None
        self.last_deskew_angle = 0.0
        if self.deskew:
            img = self.legacy_detector._load_image(image)
            if img is not None:
                from .deskew import boxes_to_original, estimate_skew, rotate_image
                angle = estimate_skew(img)
                self.last_skew_angle = angle
                if abs(angle) >= self.deskew_min_angle:
                    desk = rotate_image(img, -angle)
                    boxes = self._detect_lines_upright(desk)
                    mapped = boxes_to_original(
                        [(b.x, b.y, b.width, b.height) for b in boxes],
                        angle, img.shape[:2])
                    pairs = [(b, m) for b, m in zip(boxes, mapped)
                             if m[2] > 0 and m[3] > 0]
                    # Recognition must crop UPRIGHT text: keep the deskewed
                    # page and its frame's boxes (1:1 with the returned,
                    # input-frame boxes) for downstream croppers — a 2-6 deg
                    # skewed crop costs the recognizer ~60x CER.
                    self.last_deskewed_image = desk
                    self.last_deskew_boxes = [b for b, _ in pairs]
                    self.last_deskew_angle = angle
                    return [TextBox(x, y, w, h, confidence=b.confidence,
                                    level=b.level)
                            for b, (x, y, w, h) in pairs]
        return self._detect_lines_upright(image)

    def iter_lines_objects_batch(self, images):
        """Yield ``(page index, TextBox list)`` over many pages, in
        download-arrival order (NOT input order).

        With the DB or CRAFT backend, all pages' net forwards run as
        grouped batched dispatches (iter_detect_text on the backend) —
        one upload + one compiled call per (canvas shape, batch bucket)
        instead of a full link round-trip per page — and pages are
        yielded as their maps land, so the caller's per-page CPU work
        (cropping, preprocessing) runs under the remaining transfers.
        The legacy backend yields from the per-page loop. Per-page
        results are identical to the single-page API.

        ``self.last_batch_state[i]`` is filled when page ``i`` is
        yielded; afterwards it holds every page's
        ``(deskewed_image, deskew_boxes, applied_angle)`` — the batch
        equivalent of ``last_deskewed_image`` / ``last_deskew_boxes`` /
        ``last_deskew_angle``.
        """
        images = list(images)
        state: List = [None] * len(images)
        self.last_batch_state = state
        # Reset single-page deskew state: consumers crop from
        # last_deskewed_image when it is set (see detect_lines_objects),
        # so a previous page's frame must never leak into this batch.
        self.last_deskewed_image = None
        self.last_deskew_boxes = None
        self.last_deskew_angle = 0.0

        if self.method == "db" and self.db_detector is not None:
            backend_iter = self.db_detector.iter_detect_text
            post_kwargs = dict(merge=False, skip_sort=True)
        elif self.method == "craft" and self.craft_detector is not None:
            backend_iter = self.craft_detector.iter_detect_text
            post_kwargs = dict(merge=True)
        else:
            for i, image in enumerate(images):
                boxes = self.detect_lines_objects(image)
                state[i] = (self.last_deskewed_image,
                            self.last_deskew_boxes,
                            self.last_deskew_angle)
                yield i, boxes
            return

        from .deskew import boxes_to_original, estimate_skew, rotate_image

        # (upright image-or-path, applied angle, estimated angle or None,
        #  orig hw or None) — estimate is recorded even when below the
        # apply threshold, matching the single-page API's last_skew_angle.
        preps = []
        for image in images:
            img, est = None, None
            if self.deskew:
                img = self.legacy_detector._load_image(image)
                if img is not None:
                    est = estimate_skew(img)
            if est is not None and abs(est) >= self.deskew_min_angle:
                preps.append((rotate_image(img, -est), est, est,
                              img.shape[:2]))
            else:
                preps.append((img if img is not None else image, 0.0, est,
                              None))

        for i, detected in backend_iter([p[0] for p in preps]):
            upright, angle, est, orig_hw = preps[i]
            boxes = self._process_boxes_objects(detected, **post_kwargs)
            boxes = self._split_column_merges(upright, boxes)
            if angle:
                mapped = boxes_to_original(
                    [(b.x, b.y, b.width, b.height) for b in boxes],
                    angle, orig_hw)
                pairs = [(b, m) for b, m in zip(boxes, mapped)
                         if m[2] > 0 and m[3] > 0]
                state[i] = (upright, [b for b, _ in pairs], angle)
                boxes = [TextBox(x, y, w, h, confidence=b.confidence,
                                 level=b.level)
                         for b, (x, y, w, h) in pairs]
            else:
                state[i] = (None, None, 0.0)
            if est is not None:
                self.last_skew_angle = est
            yield i, boxes

    def detect_lines_objects_batch(self, images) -> List[List[TextBox]]:
        """Batched ``detect_lines_objects`` (see iter_lines_objects_batch);
        returns per-page results in input order, falling back to the
        per-page loop if the batched backend path fails."""
        images = list(images)
        try:
            out: List = [None] * len(images)
            for i, boxes in self.iter_lines_objects_batch(images):
                out[i] = boxes
            return out
        except Exception as e:
            print(f"{self.method} batch detection failed: {e}. "
                  f"Falling back to per-page detection.")
            state, out = [], []
            for image in images:
                out.append(self.detect_lines_objects(image))
                state.append((self.last_deskewed_image,
                              self.last_deskew_boxes,
                              self.last_deskew_angle))
            self.last_batch_state = state
            return out

    def _detect_lines_upright(self, image) -> List[TextBox]:
        if self.method == "craft" and self.craft_detector:
            try:
                detected = self.craft_detector.detect_text(image)
                boxes = self._process_boxes_objects(detected, merge=True)
                return self._split_column_merges(image, boxes)
            except Exception as e:
                print(f"CRAFT detection failed: {e}. Falling back to legacy.")
                return self._wrap_legacy(self.legacy_detector.detect_lines(image))
        if self.method == "db" and self.db_detector:
            try:
                detected = self.db_detector.detect_text(image)
                # DB results arrive pre-sorted in reading order.
                boxes = self._process_boxes_objects(detected, merge=False,
                                                    skip_sort=True)
                return self._split_column_merges(image, boxes)
            except Exception as e:
                print(f"DB detection failed: {e}. Falling back to legacy.")
                return self._wrap_legacy(self.legacy_detector.detect_lines(image))
        return self._wrap_legacy(self.legacy_detector.detect_lines(image))

    def _split_column_merges(self, image, tbs: List[TextBox],
                             min_gap: int = 14) -> List[TextBox]:
        """Split detection boxes that bridge a column gutter.

        The DB/CRAFT probability maps can bridge a narrow (~20-30 px)
        two-column gutter, emitting ONE box that spans both columns —
        recognition then reads both columns' text as a single line
        (measured: 0.31 doc-CER on an otherwise clean page, the dominant
        clean-condition outlier). A gutter is NOT distinguishable from a
        wide word space inside one line (measured zero-run widths overlap:
        gutters 27-32 px vs word spaces up to 26 px) — but it IS by
        alignment: the gutter's ink-free column band continues through the
        rows of the OTHER detected lines, while word spaces don't line up
        across lines.

        For each in-box ink-free column run >= ``min_gap`` px, the box is
        split at the run iff the same columns are ink-free over the rows of
        other boxes too (>= 24 supporting rows; conservative — sparse pages
        without neighbor evidence are left alone). Parts are tightened to
        their own ink and re-padded. Disable with det kwarg
        ``split_columns=False``. No reference equivalent (its DB would
        merge the same way); runs on the upright frame before any
        deskew box mapping.
        """
        if not self.split_columns or len(tbs) < 3:
            return tbs
        img = self.legacy_detector._load_image(image)
        if img is None:
            return tbs
        if img.ndim == 3:
            img = img.mean(axis=2)
        ih, iw = img.shape[:2]
        lo, hi = np.percentile(img, (0.5, 99.5))
        thr = (float(lo) + float(hi)) / 2.0
        dark = img < thr
        ink = dark if dark.mean() <= 0.5 else ~dark
        row_of = np.zeros(ih, bool)
        spans = []
        for b in tbs:
            y0, y1 = max(0, b.y), min(ih, b.y + b.height)
            spans.append((y0, y1))
            row_of[y0:y1] = True
        out: List[TextBox] = []
        for bi, b in enumerate(tbs):
            x0, x1 = max(0, b.x), min(iw, b.x + b.width)
            y0, y1 = spans[bi]
            if x1 - x0 < 3 * min_gap or y1 <= y0:
                out.append(b)
                continue
            prof = ink[y0:y1, x0:x1].sum(axis=0)
            nz = np.nonzero(prof)[0]
            if nz.size == 0:
                out.append(b)
                continue
            own = np.zeros(ih, bool)
            own[y0:y1] = True
            support = row_of & ~own
            if support.sum() < 24:
                out.append(b)
                continue
            # Interior zero runs of the in-box column profile. A run is a
            # gutter only if a >= 10 px SUB-band of it is also ink-free
            # across the other boxes' rows — the full run can overhang
            # neighbors' ink because lines end at different x (measured:
            # the survivor's 32 px run included 7 px of a neighbor's last
            # glyph, while word spaces never clear a 10 px common band).
            blocked_thr = max(2.0, 0.004 * support.sum())
            cuts = []
            run = 0
            for c in range(nz[0], nz[-1] + 1):
                if prof[c] == 0:
                    run += 1
                    continue
                if run >= min_gap:
                    g0, g1 = x0 + c - run, x0 + c
                    blocked = ink[support, g0:g1].sum(axis=0) > blocked_thr
                    clear, best = 0, None
                    for cc in range(g0, g1):
                        if not blocked[cc - g0]:
                            clear += 1
                            if best is None or clear > best[1] - best[0]:
                                best = (cc - clear + 1, cc + 1)
                        else:
                            clear = 0
                    if best is not None and best[1] - best[0] >= 10:
                        cuts.append(best)
                run = 0
            if not cuts:
                out.append(b)
                continue
            edges = [x0 + nz[0]] + [g for cut in cuts for g in cut] \
                + [x0 + nz[-1] + 1]
            for s0, s1 in zip(edges[::2], edges[1::2]):
                sub = ink[y0:y1, s0:s1]
                ys, xs = np.nonzero(sub)
                if ys.size < 10:
                    continue
                py0, py1 = y0 + ys.min(), y0 + ys.max() + 1
                px0, px1 = s0 + xs.min(), s0 + xs.max() + 1
                pad = max(2, int(round(0.1 * (py1 - py0))))
                out.append(TextBox(
                    max(0, px0 - pad), max(0, py0 - pad),
                    min(iw, px1 + pad) - max(0, px0 - pad),
                    min(ih, py1 + pad) - max(0, py0 - pad),
                    confidence=b.confidence, level=b.level))
        return out

    def _wrap_legacy(self, bboxes) -> List[TextBox]:
        return [TextBox(x, y, w, h, confidence=1.0, level=DetectionLevel.LINE)
                for (x, y, w, h) in bboxes]

    def _process_boxes_objects(self, detected_boxes, merge=True,
                               skip_sort=False) -> List[TextBox]:
        boxes = []
        padding = self.kwargs.get("padding", 0)
        for item in detected_boxes:
            if isinstance(item, tuple) and len(item) == 2:
                box, confidence = item
            else:
                box, confidence = item, 1.0
            shape = getattr(box, "shape", None)
            if shape is not None and len(shape) == 2 and shape[1] == 2:
                # Quad or polygon outline ([N,2] points).
                x1, y1 = box[:, 0].min(), box[:, 1].min()
                x2, y2 = box[:, 0].max(), box[:, 1].max()
            else:
                x1, y1, x2, y2 = box
            w, h = x2 - x1, y2 - y1
            if padding:
                x1 = max(0, x1 - padding)
                y1 = max(0, y1 - padding)
                w += 2 * padding
                h += 2 * padding
            boxes.append(TextBox(int(x1), int(y1), int(w), int(h),
                                 confidence=float(confidence),
                                 level=DetectionLevel.LINE))
        if not skip_sort:
            boxes = self._sort_reading_order(boxes)
        if merge:
            boxes = self._merge_overlapping_boxes(boxes)
        return boxes

    def _sort_reading_order(self, boxes: List[TextBox]) -> List[TextBox]:
        """Median-height line grouping sort (reference: detector/__init__.py:245-291)."""
        if not boxes:
            return []
        get_cy = lambda b: b.y + b.height / 2
        get_cx = lambda b: b.x + b.width / 2
        boxes = sorted(boxes, key=get_cy)
        heights = [b.height for b in boxes]
        median_h = float(np.median(heights)) if heights else 20.0
        y_tol = median_h * 0.7
        lines, current = [], [boxes[0]]
        for b in boxes[1:]:
            avg_cy = float(np.mean([get_cy(lb) for lb in current]))
            if abs(get_cy(b) - avg_cy) < y_tol:
                current.append(b)
            else:
                lines.append(current)
                current = [b]
        lines.append(current)
        out = []
        for line in lines:
            out.extend(sorted(line, key=get_cx))
        return out

    def _merge_overlapping_boxes(self, boxes: List[TextBox],
                                 iou_threshold: float = 0.3) -> List[TextBox]:
        """Merge vertically-overlapping boxes (reference: detector/__init__.py:331-367)."""
        if not boxes:
            return []
        boxes = sorted(boxes, key=lambda b: b.y)
        merged, current = [], boxes[0]
        for nxt in boxes[1:]:
            y1c, y2c = current.y, current.y + current.height
            y1n, y2n = nxt.y, nxt.y + nxt.height
            overlap = max(0, min(y2c, y2n) - max(y1c, y1n))
            min_h = min(current.height, nxt.height)
            if min_h > 0 and overlap / min_h > iou_threshold:
                x1 = min(current.x, nxt.x)
                y1 = min(current.y, nxt.y)
                x2 = max(current.x + current.width, nxt.x + nxt.width)
                y2 = max(current.y + current.height, nxt.y + nxt.height)
                conf = (current.confidence + nxt.confidence) / 2
                current = TextBox(x1, y1, x2 - x1, y2 - y1, confidence=conf,
                                  level=current.level)
            else:
                merged.append(current)
                current = nxt
        merged.append(current)
        return merged

    # ------------------------------------------------------- other levels
    def detect_words(self, image):
        # No deskew on word/char/block paths; clear per-page state so a
        # previous line-detection's deskewed frame can't be mistaken for
        # this call's output by downstream croppers.
        self.last_deskewed_image = None
        self.last_deskew_boxes = None
        self.last_deskew_angle = 0.0
        return self.legacy_detector.detect_words(image)

    def detect_blocks(self, image):
        if (self.method in ("craft", "db")
                and (self.craft_detector or self.db_detector)):
            lines_bbox = self.detect_lines(image)
            lines = [TextBox(x, y, w, h, level=DetectionLevel.LINE)
                     for (x, y, w, h) in lines_bbox]
            img = self.legacy_detector._load_image(image)
            if img is None:
                return []
            h, w = img.shape[:2]
            blocks = self.legacy_detector._group_lines_into_blocks(lines, w, h)
            return [b.bbox for b in blocks]
        return self.legacy_detector.detect_blocks(image)

    def detect_characters(self, image):
        return self.legacy_detector.detect_characters(image)

    def detect_all(self, image) -> List[TextBox]:
        return self.legacy_detector.detect_all(image)

    def is_multiline(self, image, threshold: int = 2) -> bool:
        return len(self.detect_lines(image)) >= threshold

    def get_debug_images(self) -> Dict[str, np.ndarray]:
        return self.legacy_detector.get_debug_images()


# ---------------------------------------------------------------------------
def detect_text_lines(image, **kwargs):
    return TextDetector(**kwargs).detect_lines(image)


def detect_text_words(image, **kwargs):
    return TextDetector(**kwargs).detect_words(image)


def detect_text_blocks(image, **kwargs):
    return TextDetector(**kwargs).detect_blocks(image)
