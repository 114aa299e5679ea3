"""End-to-end pipeline accuracy: synthetic pages -> OCR.process_document ->
line-matched CER against the generator's ground-truth texts.

This is the product metric the component evals (eval_recognizer: crops only,
eval_detector: boxes only) don't cover: detection, cropping, preprocessing,
recognition, and reading-order assembly all in one measurement, per
robustness condition. A GT line is matched to the detected result whose box
covers its center; unmatched GT lines count their full length as errors, so
end2end_cer is bounded below by (1 - recall).

Usage:
  python scripts/eval_pipeline.py [--n 6] [--conditions clean,rotated]
      [--decode fast|accurate|beam|auto] [--deskew] [--model ...]
Prints one JSON line per condition plus a summary line.
"""
from __future__ import annotations

import argparse
import json
import random
import sys
import zlib
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _lev(a: str, b: str) -> int:
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


def _reading_order(items):
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6, help="docs per condition")
    ap.add_argument("--conditions", default="clean,rotated",
                    help="comma list from docsynth CONDITIONS")
    ap.add_argument("--decode", default="fast",
                    choices=("fast", "accurate", "beam", "auto"))
    ap.add_argument("--deskew", action="store_true")
    ap.add_argument("--enhance", action="store_true",
                    help="adaptive crop cleanup (denoise/contrast) before "
                         "recognition")
    ap.add_argument("--model", default="models/model.safetensors")
    ap.add_argument("--det-model", default=None)
    ap.add_argument("--detector", default="db", choices=("db", "craft", "legacy"))
    ap.add_argument("--khmer-ratio", type=float, default=0.4)
    ap.add_argument("--seed", type=int, default=7000)
    ap.add_argument("--upload-bits", type=int, choices=(4, 8), default=8,
                    help="4: packed recognition uploads (wire saver)")
    ap.add_argument("--map-downsample", type=int, default=1,
                    help="DB det_map_downsample serving knob")
    ap.add_argument("--two-step-deskew", action="store_true",
                    help="disable the single-resample deskew crop path "
                         "(A/B the double-interpolation cost)")
    args = ap.parse_args()

    from kiri_tpu import OCR
    from kiri_tpu.data.docsynth import DocumentGenerator, apply_condition

    ocr = OCR(model_path=args.model, det_model_path=args.det_model,
              det_method=args.detector, decode_method=args.decode,
              deskew=args.deskew, enhance=args.enhance,
              upload_bits=args.upload_bits,
              deskew_single_resample=not args.two_step_deskew,
              det_kwargs=({"det_map_downsample": args.map_downsample}
                          if args.map_downsample > 1 else None))

    summary = {}
    for cond in args.conditions.split(","):
        cond = cond.strip()
        # zlib.crc32, not hash(): str hashes are salted per process, which
        # made condition draws differ run-to-run and A/Bs incomparable.
        rng = random.Random(args.seed + zlib.crc32(cond.encode()) % 1000)
        matched_err = matched_len = missed_len = 0
        doc_err = doc_len = 0
        n_gt = n_matched = 0
        for i in range(args.n):
            gen = DocumentGenerator(640, 640, seed=args.seed + 13 * i,
                                    khmer_ratio=args.khmer_ratio)
            doc = gen.generate()
            upright_lines = doc["lines"]
            if cond != "clean":
                # "a+b" applies conditions in sequence (e.g. rotated+noisy:
                # a skewed AND noisy capture) — GT boxes compose through
                # each stage's transform.
                for c in cond.split("+"):
                    doc = apply_condition(doc, c, rng)
            img = np.asarray(doc["image"], np.uint8)
            results = ocr.process_document(img)
            # Document-level CER: full transcript vs GT, both in READING
            # order (y-band grouping then x — the facade's sort; the
            # generator emits two-column GT per-column, which would charge
            # the pipeline ~0.3 CER of pure ordering noise otherwise).
            # Reading order is rotation-invariant, so GT is ordered by its
            # UPRIGHT geometry: the rotated condition's axis-aligned hulls
            # grow by ~w*sin(a) and merge adjacent y-bands, scrambling the
            # GT line order itself (another ~0.25 of pure ordering noise).
            # Robust to line fragmentation/merging.
            gt_doc = "\n".join(t for _, t in _reading_order(
                zip(upright_lines, doc["texts"])))
            hyp_doc = "\n".join(r["text"] for r in results)
            doc_err += _lev(hyp_doc, gt_doc)
            doc_len += len(gt_doc)
            for (gx, gy, gw, gh), gt_text in zip(doc["lines"], doc["texts"]):
                n_gt += 1
                cx, cy = gx + gw / 2, gy + gh / 2
                hyp = None
                for r in results:
                    x, y, w, h = r["box"]
                    if x <= cx <= x + w and y <= cy <= y + h:
                        # Several boxes can cover the center (deskew-mapped
                        # hulls of adjacent long lines overlap vertically at
                        # 4-6 deg: hull height grows ~w*sin(a)); keep the
                        # box whose own center is nearest, not the tightest
                        # area (which picks a short NEIGHBOR line).
                        d = abs((y + h / 2) - cy) + abs((x + w / 2) - cx)
                        if hyp is None or d < hyp[1]:
                            hyp = (r["text"], d)
                if hyp is None:
                    missed_len += len(gt_text)
                    continue
                n_matched += 1
                matched_err += _lev(hyp[0], gt_text)
                matched_len += len(gt_text)
        row = {
            "condition": cond, "docs": args.n, "gt_lines": n_gt,
            "line_recall": round(n_matched / max(1, n_gt), 4),
            "doc_cer": round(doc_err / max(1, doc_len), 4),
            "matched_cer": round(matched_err / max(1, matched_len), 4),
            "end2end_cer": round((matched_err + missed_len)
                                 / max(1, matched_len + missed_len), 4),
        }
        summary[cond] = row
        print(json.dumps(row))

    print(json.dumps({"decode": args.decode, "detector": args.detector,
                      "deskew": args.deskew, "enhance": args.enhance,
                      "summary": summary}))


if __name__ == "__main__":
    main()
