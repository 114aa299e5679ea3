"""Classic computer-vision text detector (no learned model).

Capability-parity rebuild of the reference's dependency-light fallback
detector (reference: kiri_ocr/detector/legacy/detector.py:17-1098):

* a wide binarization candidate sweep — CLAHE-enhanced grayscale families
  (Otsu, adaptive Gaussian/mean, Sauvola-/Niblack-like, both polarities,
  morphological gradient) plus per-RGB-channel / HSV / LAB binarizations on
  color inputs (reference :391-494) — scored by text-likeness and reduced
  to the best mask;
* MSER components with solidity filtering (reference :283-332) and
  gradient/Canny stroke components (reference :334-387) as additional
  candidate sources, gated by ``use_mser`` / ``use_gradient``;
* IoU NMS dedup across sources (reference :679-729), then the
  line / word / block / character hierarchy.

The scored-selection design (pick one best mask, then union the auxiliary
sources) keeps the host cost bounded while covering the reference's
failure modes: low-contrast, inverted, colored and textured documents.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import cv2
import numpy as np

from .base import DetectionLevel, TextBox


class ImageProcessingTextDetector:
    def __init__(self, min_area: int = 10, max_area_ratio: float = 0.9,
                 min_aspect: float = 0.02, max_aspect: float = 50.0,
                 line_overlap_ratio: float = 0.5,
                 word_gap_ratio: float = 0.7,
                 block_gap_ratio: float = 1.8,
                 max_side: int = 1600,
                 use_mser: bool = True,
                 use_gradient: bool = True,
                 use_color_channels: bool = True,
                 min_text_width: int = 2,
                 min_text_height: int = 6, **_ignored):
        self.min_area = min_area
        self.max_area_ratio = max_area_ratio
        self.min_aspect = min_aspect
        self.max_aspect = max_aspect
        self.line_overlap_ratio = line_overlap_ratio
        self.word_gap_ratio = word_gap_ratio
        self.block_gap_ratio = block_gap_ratio
        self.max_side = max_side
        self.use_mser = use_mser
        self.use_gradient = use_gradient
        self.use_color_channels = use_color_channels
        self.min_text_width = min_text_width
        self.min_text_height = min_text_height
        self._debug: Dict[str, np.ndarray] = {}

    # ------------------------------------------------------------ public API
    def detect_lines(self, image) -> List[Tuple[int, int, int, int]]:
        lines = self._detect_lines_objects(image)
        return [b.bbox for b in lines]

    def detect_words(self, image) -> List[Tuple[int, int, int, int]]:
        img, color = self._load_images(image)
        if img is None:
            return []
        comps = self._components(img, color)
        lines = self._group_into_lines(comps)
        words = []
        for line in lines:
            words.extend(self._split_line_to_words(line))
        return [w.bbox for w in words]

    def detect_characters(self, image) -> List[Tuple[int, int, int, int]]:
        img, color = self._load_images(image)
        if img is None:
            return []
        return [tuple(c) for c in self._components(img, color)]

    def detect_blocks(self, image) -> List[Tuple[int, int, int, int]]:
        img, color = self._load_images(image)
        if img is None:
            return []
        lines = self._lines_from_components(self._components(img, color))
        h, w = img.shape[:2]
        return [b.bbox for b in self._group_lines_into_blocks(lines, w, h)]

    def detect_all(self, image) -> List[TextBox]:
        """Full hierarchy: blocks containing lines containing words/chars."""
        img, color = self._load_images(image)
        if img is None:
            return []
        h, w = img.shape[:2]
        comps = self._components(img, color)
        comp_lines = self._group_into_lines(comps)
        line_boxes = self._lines_from_components(comps)
        for lb, lc in zip(line_boxes, comp_lines):
            words = self._split_line_to_words(lc)
            for wbox in words:
                wbox.children = [
                    TextBox(int(c[0]), int(c[1]), int(c[2]), int(c[3]),
                            level=DetectionLevel.CHARACTER)
                    for c in lc
                    if wbox.x <= c[0] + c[2] / 2 <= wbox.x + wbox.width]
            lb.children = words
        blocks = self._group_lines_into_blocks(line_boxes, w, h)
        return blocks

    def is_multiline(self, image, threshold: int = 2) -> bool:
        return len(self.detect_lines(image)) >= threshold

    def get_debug_images(self) -> Dict[str, np.ndarray]:
        return self._debug

    # ----------------------------------------------------------- core stages
    def _load_image(self, image) -> Optional[np.ndarray]:
        gray, _ = self._load_images(image)
        return gray

    def _load_images(self, image) -> Tuple[Optional[np.ndarray],
                                           Optional[np.ndarray]]:
        """Returns (gray, color-or-None); color kept for channel candidates."""
        if isinstance(image, (str, Path)):
            img = cv2.imread(str(image))
            if img is None:
                return None, None
        else:
            img = np.asarray(image)
        if img.ndim == 3:
            return cv2.cvtColor(img, cv2.COLOR_BGR2GRAY), img
        return img, None

    def _binary_candidates(self, gray: np.ndarray,
                           color: Optional[np.ndarray] = None
                           ) -> List[Tuple[str, np.ndarray]]:
        """The reference's multi-space binarization sweep
        (legacy/detector.py:391-494): CLAHE-enhanced grayscale families in
        both polarities, per-channel RGB/HSV/LAB masks on color input, and
        a morphological-gradient edge mask."""
        cands: List[Tuple[str, np.ndarray]] = []
        clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
        enhanced = clahe.apply(gray)

        _, otsu = cv2.threshold(enhanced, 0, 255,
                                cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        cands += [("otsu", otsu), ("otsu_inv", 255 - otsu)]
        adapt_gauss = cv2.adaptiveThreshold(
            enhanced, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
            cv2.THRESH_BINARY, 21, 10)
        cands += [("adaptive_gauss", adapt_gauss),
                  ("adaptive_gauss_inv", 255 - adapt_gauss)]
        adapt_mean = cv2.adaptiveThreshold(
            enhanced, 255, cv2.ADAPTIVE_THRESH_MEAN_C,
            cv2.THRESH_BINARY, 15, 8)
        cands += [("adaptive_mean", adapt_mean),
                  ("adaptive_mean_inv", 255 - adapt_mean)]
        sauvola = cv2.adaptiveThreshold(
            enhanced, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
            cv2.THRESH_BINARY, 51, 20)
        cands += [("sauvola", sauvola), ("sauvola_inv", 255 - sauvola)]
        niblack = cv2.adaptiveThreshold(
            enhanced, 255, cv2.ADAPTIVE_THRESH_MEAN_C,
            cv2.THRESH_BINARY, 11, 5)
        cands += [("niblack", niblack), ("niblack_inv", 255 - niblack)]

        if self.use_color_channels and color is not None:
            for i, ch_name in enumerate(("blue", "green", "red")):
                ch = clahe.apply(color[:, :, i])
                _, m = cv2.threshold(ch, 0, 255,
                                     cv2.THRESH_BINARY + cv2.THRESH_OTSU)
                cands += [(f"{ch_name}_otsu", m),
                          (f"{ch_name}_otsu_inv", 255 - m)]
            hsv = cv2.cvtColor(color, cv2.COLOR_BGR2HSV)
            v = clahe.apply(hsv[:, :, 2])
            _, m = cv2.threshold(v, 0, 255,
                                 cv2.THRESH_BINARY + cv2.THRESH_OTSU)
            cands += [("hsv_v_otsu", m), ("hsv_v_otsu_inv", 255 - m)]
            _, s_m = cv2.threshold(hsv[:, :, 1], 50, 255, cv2.THRESH_BINARY)
            cands.append(("hsv_s", s_m))
            lab = cv2.cvtColor(color, cv2.COLOR_BGR2LAB)
            l_ch = clahe.apply(lab[:, :, 0])
            _, m = cv2.threshold(l_ch, 0, 255,
                                 cv2.THRESH_BINARY + cv2.THRESH_OTSU)
            cands += [("lab_l_otsu", m), ("lab_l_otsu_inv", 255 - m)]
            for i, ch_name in enumerate(("a", "b")):
                ch = lab[:, :, i + 1]
                _, hi = cv2.threshold(ch, 160, 255, cv2.THRESH_BINARY)
                _, lo = cv2.threshold(ch, 96, 255, cv2.THRESH_BINARY_INV)
                cands += [(f"lab_{ch_name}_high", hi),
                          (f"lab_{ch_name}_low", lo)]

        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
        morph_grad = cv2.morphologyEx(enhanced, cv2.MORPH_GRADIENT, kernel)
        _, morph_bin = cv2.threshold(morph_grad, 0, 255,
                                     cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        cands.append(("morph_gradient", morph_bin))
        return cands

    def _binarize(self, gray: np.ndarray,
                  color: Optional[np.ndarray] = None) -> np.ndarray:
        """Pick the best text-mask among the candidate sweep by text-likeness
        scoring (reference legacy/detector.py:496-569), then union in at most
        one *complementary* mask.

        The reference unions all ~25 binarizations; scoring-and-keeping-one
        bounds cost but under-recalls pages where text lives in two
        polarities/channels at once (dark body text + light text on a dark
        band). The complementary pass recovers exactly that case: a second
        mask is OR-ed in only when its own score is substantial (>= 30% of
        best) AND its foreground barely overlaps the winner's (< 25%), i.e.
        it found a *different* text population. On single-polarity pages the
        runner-up masks are near-duplicates of the winner (high overlap), so
        the union never fires and the output is unchanged.
        """
        cands = self._binary_candidates(gray, color)
        img_area = gray.shape[0] * gray.shape[1]
        scored: List[Tuple[float, str, np.ndarray]] = []
        best, best_score = cands[0][1], -1.0
        for name, b in cands:
            n, _, stats, _ = cv2.connectedComponentsWithStats(b, connectivity=8)
            if n <= 1:
                continue
            areas = stats[1:, cv2.CC_STAT_AREA]
            hs = stats[1:, cv2.CC_STAT_HEIGHT]
            good = ((areas > self.min_area) & (areas < img_area * 0.2)).sum()
            fg_ratio = float(b.mean()) / 255.0
            if fg_ratio > 0.5 or fg_ratio < 0.0005:
                score = 0.0
            else:
                h_med = float(np.median(hs)) if len(hs) else 1.0
                h_consistency = float((np.abs(hs - h_med) < h_med).mean()) if len(hs) else 0
                score = good * (0.5 + 0.5 * h_consistency)
            self._debug[f"bin_{name}"] = b
            if score > 0:
                scored.append((score, name, b))
            if score > best_score:
                best, best_score = b, score
        if best_score > 0:
            comp = self._complementary_mask(best, best_score, scored)
            if comp is not None:
                self._debug["bin_union_second"] = comp
                best = cv2.bitwise_or(best, comp)
        return best

    def _complementary_mask(self, best: np.ndarray, best_score: float,
                            scored: List[Tuple[float, str, np.ndarray]]
                            ) -> Optional[np.ndarray]:
        """Highest-scoring mask whose foreground is mostly disjoint from the
        winner's (a different text polarity/channel), reduced to its
        text-sized components, or None.

        The component filter matters: a mask that binarizes a solid color
        band as foreground is "disjoint" from the winner too, and OR-ing it
        raw would weld the band's real text into one giant blob. Keeping
        only components in the text size range unions the recovered glyphs
        and drops background fills.
        """
        best_fg = best > 0
        img_area = best.shape[0] * best.shape[1]
        pick, pick_score = None, 0.3 * best_score
        for score, _name, b in scored:
            if score <= pick_score or b is best:
                continue
            fg = b > 0
            own = int(fg.sum())
            if own == 0:
                continue
            overlap = int((fg & best_fg).sum()) / own
            if overlap < 0.25:
                pick, pick_score = b, score
        if pick is None:
            return None
        n, labels, stats, _ = cv2.connectedComponentsWithStats(
            pick, connectivity=8)
        if n <= 1:
            return None
        areas = stats[1:, cv2.CC_STAT_AREA]
        keep = np.flatnonzero((areas > self.min_area)
                              & (areas < img_area * 0.05)) + 1
        if keep.size == 0:
            return None
        out = np.isin(labels, keep).astype(np.uint8) * 255
        return out

    def _mser_components(self, gray: np.ndarray) -> np.ndarray:
        """MSER candidate boxes with solidity filtering, both polarities
        (reference legacy/detector.py:283-332)."""
        try:
            mser = cv2.MSER_create(
                delta=5, min_area=30, max_area=14400, max_variation=0.25,
                min_diversity=0.2, max_evolution=200, area_threshold=1.01,
                min_margin=0.003, edge_blur_size=5)
        except Exception:
            return np.zeros((0, 4), np.int32)
        out = []
        for src in (gray, 255 - gray):
            try:
                regions, _ = mser.detectRegions(src)
            except cv2.error:
                continue
            for region in regions:
                x, y, w, h = cv2.boundingRect(region)
                if w < self.min_text_width or h < self.min_text_height:
                    continue
                pts = region.reshape(-1, 1, 2)
                area = cv2.contourArea(pts)
                hull_area = cv2.contourArea(cv2.convexHull(pts))
                solidity = area / hull_area if hull_area > 0 else 0.0
                if 0.2 < solidity < 0.95:
                    out.append((x, y, w, h))
        return np.asarray(out, np.int32).reshape(-1, 4)

    def _gradient_components(self, gray: np.ndarray) -> np.ndarray:
        """Canny/Sobel stroke components (reference legacy/detector.py:334-387):
        dilated edges -> contours, kept when stroke width is consistent."""
        gx = cv2.Sobel(gray, cv2.CV_64F, 1, 0, ksize=3)
        gy = cv2.Sobel(gray, cv2.CV_64F, 0, 1, ksize=3)
        magnitude = np.sqrt(gx ** 2 + gy ** 2)
        mmax = magnitude.max()
        if mmax <= 0:
            return np.zeros((0, 4), np.int32)
        magnitude = (magnitude / mmax * 255).astype(np.uint8)
        edges = cv2.Canny(gray, 50, 150)
        kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 1))
        dilated = cv2.dilate(edges, kernel, iterations=2)
        self._debug["gradient_edges"] = dilated
        contours, _ = cv2.findContours(dilated, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        out = []
        for contour in contours:
            x, y, w, h = cv2.boundingRect(contour)
            if w < self.min_text_width or h < self.min_text_height:
                continue
            roi = magnitude[y:y + h, x:x + w]
            strong = roi[roi > 20]
            if strong.size <= 10:
                continue
            consistency = 1.0 - float(np.std(strong)) / (float(np.mean(strong)) + 1e-6)
            aspect = w / h
            if consistency > 0 and 0.05 < aspect < 15:
                out.append((x, y, w, h))
        return np.asarray(out, np.int32).reshape(-1, 4)

    @staticmethod
    def _nms_boxes(boxes: np.ndarray, iou_thr: float = 0.5) -> np.ndarray:
        """Greedy IoU dedup, larger boxes first (reference :679-729)."""
        if len(boxes) <= 1:
            return boxes
        areas = boxes[:, 2].astype(np.float64) * boxes[:, 3]
        order = np.argsort(-areas)
        b = boxes[order].astype(np.float64)
        a = areas[order]
        x1, y1 = b[:, 0], b[:, 1]
        x2, y2 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
        keep = []
        alive = np.ones(len(b), bool)
        for i in range(len(b)):
            if not alive[i]:
                continue
            keep.append(order[i])
            xx1 = np.maximum(x1[i], x1[i + 1:])
            yy1 = np.maximum(y1[i], y1[i + 1:])
            xx2 = np.minimum(x2[i], x2[i + 1:])
            yy2 = np.minimum(y2[i], y2[i + 1:])
            inter = (np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1))
            iou = inter / np.maximum(1e-9, a[i] + a[i + 1:] - inter)
            alive[i + 1:] &= iou <= iou_thr
        return boxes[np.asarray(keep, np.int64)]

    def _filter_boxes(self, boxes: np.ndarray, img_area: int,
                      img_h: int) -> np.ndarray:
        if len(boxes) == 0:
            return boxes.reshape(0, 4)
        w = boxes[:, 2].astype(np.float32)
        h = boxes[:, 3].astype(np.float32)
        areas = w * h
        aspect = w / np.maximum(h, 1)
        keep = ((areas > self.min_area)
                & (areas < img_area * self.max_area_ratio)
                & (aspect > self.min_aspect) & (aspect < self.max_aspect)
                & (h < img_h * 0.95))
        return boxes[keep]

    def _components(self, gray: np.ndarray,
                    color: Optional[np.ndarray] = None) -> np.ndarray:
        """[K, 4] (x, y, w, h) candidate character components from the best
        binarization plus the MSER and gradient sources, NMS-deduped."""
        h0, w0 = gray.shape[:2]
        scale = 1.0
        if max(h0, w0) > self.max_side:
            scale = self.max_side / max(h0, w0)
            gray = cv2.resize(gray, (int(w0 * scale), int(h0 * scale)))
            if color is not None:
                color = cv2.resize(color, (gray.shape[1], gray.shape[0]))
        binary = self._binarize(gray, color)
        self._debug["binary"] = binary
        img_area = gray.shape[0] * gray.shape[1]

        n, _, stats, _ = cv2.connectedComponentsWithStats(binary, connectivity=8)
        if n > 1:
            cc_boxes = stats[1:, [cv2.CC_STAT_LEFT, cv2.CC_STAT_TOP,
                                  cv2.CC_STAT_WIDTH, cv2.CC_STAT_HEIGHT]]
            # The CC source filters on component pixel area (tighter than
            # bbox area for sparse glyph strokes).
            cc_areas = stats[1:, cv2.CC_STAT_AREA]
            w = cc_boxes[:, 2].astype(np.float32)
            h = cc_boxes[:, 3].astype(np.float32)
            aspect = w / np.maximum(h, 1)
            keep = ((cc_areas > self.min_area)
                    & (cc_areas < img_area * self.max_area_ratio)
                    & (aspect > self.min_aspect) & (aspect < self.max_aspect)
                    & (h < gray.shape[0] * 0.95))
            boxes = cc_boxes[keep]
        else:
            boxes = np.zeros((0, 4), np.int32)

        extra = []
        if self.use_mser:
            extra.append(self._filter_boxes(self._mser_components(gray),
                                            img_area, gray.shape[0]))
        if self.use_gradient:
            extra.append(self._filter_boxes(self._gradient_components(gray),
                                            img_area, gray.shape[0]))
        if extra:
            boxes = np.concatenate([boxes.reshape(-1, 4)] +
                                   [e.reshape(-1, 4) for e in extra], axis=0)
        boxes = self._nms_boxes(boxes.astype(np.int32))
        if scale != 1.0 and len(boxes):
            boxes = (boxes / scale).astype(np.int32)
        return boxes.astype(np.int32)

    def _group_into_lines(self, comps: np.ndarray) -> List[np.ndarray]:
        """Group components into text lines by vertical-overlap transitivity."""
        if len(comps) == 0:
            return []
        order = np.argsort(comps[:, 1] + comps[:, 3] / 2)
        comps = comps[order]
        lines: List[List[np.ndarray]] = []
        for c in comps:
            cy = c[1] + c[3] / 2
            placed = False
            for line in lines:
                arr = np.array(line)
                ly1 = np.median(arr[:, 1])
                ly2 = np.median(arr[:, 1] + arr[:, 3])
                lh = max(1.0, ly2 - ly1)
                ov = min(ly2, c[1] + c[3]) - max(ly1, c[1])
                if ov > self.line_overlap_ratio * min(lh, c[3]):
                    line.append(c)
                    placed = True
                    break
            if not placed:
                lines.append([c])
        out = [np.array(l) for l in lines]
        out.sort(key=lambda l: float(np.median(l[:, 1])))
        return out

    def _lines_from_components(self, comps: np.ndarray) -> List[TextBox]:
        boxes = []
        for line in self._group_into_lines(comps):
            x1 = int(line[:, 0].min())
            y1 = int(line[:, 1].min())
            x2 = int((line[:, 0] + line[:, 2]).max())
            y2 = int((line[:, 1] + line[:, 3]).max())
            boxes.append(TextBox(x1, y1, x2 - x1, y2 - y1,
                                 level=DetectionLevel.LINE))
        return boxes

    def _detect_lines_objects(self, image) -> List[TextBox]:
        img, color = self._load_images(image)
        if img is None:
            return []
        return self._lines_from_components(self._components(img, color))

    def _split_line_to_words(self, line_comps: np.ndarray) -> List[TextBox]:
        if len(line_comps) == 0:
            return []
        order = np.argsort(line_comps[:, 0])
        cs = line_comps[order]
        med_h = float(np.median(cs[:, 3]))
        gap_thr = max(2.0, self.word_gap_ratio * med_h * 0.5)
        words: List[List[np.ndarray]] = [[cs[0]]]
        for c in cs[1:]:
            prev = np.array(words[-1])
            right = (prev[:, 0] + prev[:, 2]).max()
            if c[0] - right > gap_thr:
                words.append([c])
            else:
                words[-1].append(c)
        out = []
        for wgroup in words:
            arr = np.array(wgroup)
            x1, y1 = int(arr[:, 0].min()), int(arr[:, 1].min())
            x2 = int((arr[:, 0] + arr[:, 2]).max())
            y2 = int((arr[:, 1] + arr[:, 3]).max())
            out.append(TextBox(x1, y1, x2 - x1, y2 - y1,
                               level=DetectionLevel.WORD))
        return out

    def _group_lines_into_blocks(self, line_boxes: List[TextBox], img_w: int,
                                 img_h: int) -> List[TextBox]:
        """Vertically-adjacent, x-overlapping lines -> blocks (reference
        facade delegates block grouping here, detector/__init__.py:299-321)."""
        if not line_boxes:
            return []
        lines = sorted(line_boxes, key=lambda b: b.y)
        med_h = float(np.median([b.height for b in lines])) or 10.0
        blocks: List[List[TextBox]] = [[lines[0]]]
        for b in lines[1:]:
            last = blocks[-1][-1]
            v_gap = b.y - (last.y + last.height)
            x_ov = (min(b.x + b.width, last.x + last.width)
                    - max(b.x, last.x))
            if v_gap < self.block_gap_ratio * med_h and x_ov > 0:
                blocks[-1].append(b)
            else:
                blocks.append([b])
        out = []
        for group in blocks:
            x1 = min(b.x for b in group)
            y1 = min(b.y for b in group)
            x2 = max(b.x + b.width for b in group)
            y2 = max(b.y + b.height for b in group)
            blk = TextBox(x1, y1, x2 - x1, y2 - y1, level=DetectionLevel.BLOCK)
            blk.children = group
            out.append(blk)
        return out
