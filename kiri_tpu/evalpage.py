"""Page-level accuracy evaluation shared by scripts/eval_pipeline.py and
the driver bench (bench.py ``page_cer_*`` keys).

Measures the product metric the component evals don't: synthetic pages →
``OCR.process_document`` → line-matched + document-level CER against the
generator's ground truth, per robustness condition. The reference validates
itself only on pre-cropped single lines (its harness feeds
``recognize_single_line_image``, /root/reference/benchmark/run_benchmark.py:85-107);
this module scores the full detection→crop→recognize→assemble stack so the
bench artifact carries distribution-shifted accuracy, not just self-synthetic
line CER.

Matching rules (identical to the long-standing eval_pipeline behavior):
- A GT line matches the detected result whose box covers its center; when
  several boxes cover it (deskew hulls of adjacent long lines overlap at
  4-6°), the box whose own center is nearest wins.
- Unmatched GT lines count their full length as errors in ``end2end_cer``,
  so it is bounded below by (1 - recall).
- ``doc_cer`` compares full transcripts with BOTH sides in reading order
  (y-band grouping then x); GT ordering uses the upright geometry because
  rotated axis-aligned hulls merge adjacent y-bands and would charge pure
  ordering noise.
- Condition RNGs are crc32-seeded (str ``hash()`` is salted per process,
  which made A/B runs incomparable until round 3).
"""
from __future__ import annotations

import random
import time
import zlib

import numpy as np

__all__ = ["levenshtein", "reading_order", "eval_condition"]


def levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def reading_order(items):
    """Sort (box, text) pairs into reading order: group boxes into y-bands
    by median line height (like detect/__init__._sort_reading_order), then
    left-to-right within a band."""
    items = list(items)
    if not items:
        return items
    items.sort(key=lambda it: it[0][1] + it[0][3] / 2)
    med_h = float(np.median([b[3] for b, _ in items]))
    bands, cur = [], [items[0]]
    for it in items[1:]:
        cy = it[0][1] + it[0][3] / 2
        avg = float(np.mean([b[1] + b[3] / 2 for b, _ in cur]))
        if abs(cy - avg) < med_h * 0.7:
            cur.append(it)
        else:
            bands.append(cur)
            cur = [it]
    bands.append(cur)
    out = []
    for band in bands:
        out.extend(sorted(band, key=lambda it: it[0][0]))
    return out


def eval_condition(ocr, cond: str, n: int, seed: int = 7000,
                   khmer_ratio: float = 0.4, page: int = 640,
                   deadline: float | None = None) -> dict:
    """Run ``ocr.process_document`` over ``n`` synthetic pages under one
    robustness condition and score against ground truth.

    ``cond`` is a docsynth condition name, or ``"a+b"`` to chain conditions
    (e.g. ``rotated+noisy``: a skewed AND noisy capture — GT boxes compose
    through each stage's transform). ``deadline`` (``time.monotonic()``
    value) stops adding pages once passed; the row reports how many pages
    actually ran so partial rows are honest.
    """
    from kiri_tpu.data.docsynth import DocumentGenerator, apply_condition

    rng = random.Random(seed + zlib.crc32(cond.encode()) % 1000)
    matched_err = matched_len = missed_len = 0
    doc_err = doc_len = 0
    n_gt = n_matched = n_docs = 0
    for i in range(n):
        if deadline is not None and time.monotonic() > deadline and n_docs:
            break
        gen = DocumentGenerator(page, page, seed=seed + 13 * i,
                                khmer_ratio=khmer_ratio)
        doc = gen.generate()
        upright_lines = doc["lines"]
        if cond != "clean":
            for c in cond.split("+"):
                doc = apply_condition(doc, c, rng)
        img = np.asarray(doc["image"], np.uint8)
        results = ocr.process_document(img)
        n_docs += 1
        gt_doc = "\n".join(t for _, t in reading_order(
            zip(upright_lines, doc["texts"])))
        hyp_doc = "\n".join(r["text"] for r in results)
        doc_err += levenshtein(hyp_doc, gt_doc)
        doc_len += len(gt_doc)
        for (gx, gy, gw, gh), gt_text in zip(doc["lines"], doc["texts"]):
            n_gt += 1
            cx, cy = gx + gw / 2, gy + gh / 2
            hyp = None
            for r in results:
                x, y, w, h = r["box"]
                if x <= cx <= x + w and y <= cy <= y + h:
                    d = abs((y + h / 2) - cy) + abs((x + w / 2) - cx)
                    if hyp is None or d < hyp[1]:
                        hyp = (r["text"], d)
            if hyp is None:
                missed_len += len(gt_text)
                continue
            n_matched += 1
            matched_err += levenshtein(hyp[0], gt_text)
            matched_len += len(gt_text)
    return {
        "condition": cond, "docs": n_docs, "gt_lines": n_gt,
        "line_recall": round(n_matched / max(1, n_gt), 4),
        "doc_cer": round(doc_err / max(1, doc_len), 4),
        "matched_cer": round(matched_err / max(1, matched_len), 4),
        "end2end_cer": round((matched_err + missed_len)
                             / max(1, matched_len + missed_len), 4),
    }
