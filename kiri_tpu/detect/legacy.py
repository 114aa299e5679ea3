"""Classic computer-vision text detector (no learned model).

Capability-parity rebuild of the reference's dependency-light fallback
detector (reference: kiri_ocr/detector/legacy/detector.py:17-1098): multiple
binarization candidates scored by text-likeness, connected-component
extraction, dedup, and a line / word / block / character hierarchy.

The design here is deliberately simpler than the reference's ~25-binarization
sweep: a small candidate set (Otsu both polarities + adaptive) scored by
component statistics covers the same document classes at a fraction of the
host cost, and all heavy ops are single cv2/numpy calls.
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
                 max_side: int = 1600, **_ignored):
        self.min_area = min_area
        self.max_area_ratio = max_area_ratio
        self.min_aspect = min_aspect
        self.max_aspect = max_aspect
        self.line_overlap_ratio = line_overlap_ratio
        self.word_gap_ratio = word_gap_ratio
        self.block_gap_ratio = block_gap_ratio
        self.max_side = max_side
        self._debug: Dict[str, np.ndarray] = {}

    # ------------------------------------------------------------ public API
    def detect_lines(self, image) -> List[Tuple[int, int, int, int]]:
        lines = self._detect_lines_objects(image)
        return [b.bbox for b in lines]

    def detect_words(self, image) -> List[Tuple[int, int, int, int]]:
        img = self._load_image(image)
        if img is None:
            return []
        comps = self._components(img)
        lines = self._group_into_lines(comps)
        words = []
        for line in lines:
            words.extend(self._split_line_to_words(line))
        return [w.bbox for w in words]

    def detect_characters(self, image) -> List[Tuple[int, int, int, int]]:
        img = self._load_image(image)
        if img is None:
            return []
        return [tuple(c) for c in self._components(img)]

    def detect_blocks(self, image) -> List[Tuple[int, int, int, int]]:
        img = self._load_image(image)
        if img is None:
            return []
        lines = self._lines_from_components(self._components(img))
        h, w = img.shape[:2]
        return [b.bbox for b in self._group_lines_into_blocks(lines, w, h)]

    def detect_all(self, image) -> List[TextBox]:
        """Full hierarchy: blocks containing lines containing words/chars."""
        img = self._load_image(image)
        if img is None:
            return []
        h, w = img.shape[:2]
        comps = self._components(img)
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
        if isinstance(image, (str, Path)):
            img = cv2.imread(str(image))
            if img is None:
                return None
        else:
            img = np.asarray(image)
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        return img

    def _binarize(self, gray: np.ndarray) -> np.ndarray:
        """Pick the best text-mask among a small candidate set.

        Candidates are scored by component statistics (count, size spread,
        fill ratio) — the same idea as the reference's text-likeness scoring
        (legacy/detector.py:496-569) over a reduced, cheap candidate set.
        """
        cands = []
        _, otsu = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY_INV + cv2.THRESH_OTSU)
        cands.append(("otsu_inv", otsu))
        _, otsu2 = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        cands.append(("otsu", otsu2))
        ad = cv2.adaptiveThreshold(gray, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                                   cv2.THRESH_BINARY_INV, 31, 15)
        cands.append(("adaptive_inv", ad))

        best, best_score = cands[0][1], -1.0
        img_area = gray.shape[0] * gray.shape[1]
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
            if score > best_score:
                best, best_score = b, score
        return best

    def _components(self, gray: np.ndarray) -> np.ndarray:
        """[K, 4] (x, y, w, h) candidate character components."""
        h0, w0 = gray.shape[:2]
        scale = 1.0
        if max(h0, w0) > self.max_side:
            scale = self.max_side / max(h0, w0)
            gray = cv2.resize(gray, (int(w0 * scale), int(h0 * scale)))
        binary = self._binarize(gray)
        self._debug["binary"] = binary
        n, _, stats, _ = cv2.connectedComponentsWithStats(binary, connectivity=8)
        if n <= 1:
            return np.zeros((0, 4), np.int32)
        img_area = gray.shape[0] * gray.shape[1]
        boxes = stats[1:, [cv2.CC_STAT_LEFT, cv2.CC_STAT_TOP,
                           cv2.CC_STAT_WIDTH, cv2.CC_STAT_HEIGHT]]
        areas = stats[1:, cv2.CC_STAT_AREA]
        w = boxes[:, 2].astype(np.float32)
        h = boxes[:, 3].astype(np.float32)
        aspect = w / np.maximum(h, 1)
        keep = ((areas > self.min_area)
                & (areas < img_area * self.max_area_ratio)
                & (aspect > self.min_aspect) & (aspect < self.max_aspect)
                & (h < gray.shape[0] * 0.95))
        boxes = boxes[keep]
        if scale != 1.0:
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
        img = self._load_image(image)
        if img is None:
            return []
        return self._lines_from_components(self._components(img))

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
