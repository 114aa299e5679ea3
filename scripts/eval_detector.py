"""Evaluate a trained detector on held-out synthetic documents: line recall /
precision on English-only and mixed Khmer+English layouts PLUS a robustness
suite (rotation, noise, inversion, textured background, low contrast, forced
multi-column) — 8 rows x n docs each (>=100 docs at the default n).

A ground-truth line counts as recalled if some detected box covers its
center and at least half its area; a detection counts as a true positive if
it hits any GT line. Reports per-condition metrics as one JSON line.

Usage: python scripts/eval_detector.py [--detector db|craft]
           [--model models/detector.safetensors] [--n 16]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _rect_of(points: np.ndarray):
    x0, y0 = points[:, 0].min(), points[:, 1].min()
    x1, y1 = points[:, 0].max(), points[:, 1].max()
    return float(x0), float(y0), float(x1), float(y1)


def _covers(det, gt) -> bool:
    """det covers gt center AND >= 50% of gt area overlaps det."""
    dx0, dy0, dx1, dy1 = det
    gx, gy, gw, gh = gt
    cx, cy = gx + gw / 2, gy + gh / 2
    if not (dx0 <= cx <= dx1 and dy0 <= cy <= dy1):
        return False
    ix = max(0.0, min(dx1, gx + gw) - max(dx0, gx))
    iy = max(0.0, min(dy1, gy + gh) - max(dy0, gy))
    return ix * iy >= 0.5 * gw * gh


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--detector", default="db", choices=("db", "craft"))
    ap.add_argument("--model", default=None)
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--seed", type=int, default=5000)
    ap.add_argument("--deskew", action="store_true",
                    help="enable the facade's projection-profile deskew")
    ap.add_argument("--map-downsample", type=int, default=1,
                    help="DB det_map_downsample serving knob (wire saver)")
    args = ap.parse_args()

    from kiri_tpu.data.docsynth import DocumentGenerator
    from kiri_tpu.detect import TextDetector

    # Evaluate through the facade (the product path): CRAFT emits word-level
    # regions that the facade merges into lines, so raw-box metrics would
    # misstate line recall.
    default_model = ("models/detector.safetensors" if args.detector == "db"
                     else "models/craft.safetensors")
    det = TextDetector(method=args.detector,
                       model_path=args.model or default_model,
                       deskew=args.deskew,
                       det_map_downsample=args.map_downsample)

    def detect(img):
        return [np.asarray([[b.x, b.y], [b.x + b.width, b.y + b.height]])
                for b in det.detect_lines_objects(img)]

    import random as pyrandom

    from kiri_tpu.data.docsynth import CONDITIONS, apply_condition

    def run_suite(docs):
        hits = total = tps = dets = 0
        for doc in docs:
            rects = [_rect_of(np.asarray(p)) for p in detect(doc["image"])]
            gt = doc["lines"]
            total += len(gt)
            dets += len(rects)
            for g in gt:
                hits += any(_covers(r, g) for r in rects)
            for r in rects:
                tps += any(_covers(r, g) for g in gt)
        return {"n_docs": len(docs), "gt_lines": total,
                "recall": round(hits / max(1, total), 4),
                "precision": round(tps / max(1, dets), 4),
                "detections": dets}

    report = {}
    # Baseline rows: english-only and mixed Khmer+English random layouts.
    for ratio, key in ((0.0, "english"), (0.4, "mixed")):
        docs = [DocumentGenerator(640, 640, seed=args.seed + i,
                                  khmer_ratio=ratio).generate()
                for i in range(args.n)]
        report[key] = run_suite(docs)
        print(key, json.dumps(report[key]))

    # Robustness rows: every degradation condition + forced multi-column,
    # mixed-script, args.n docs each (>=100 docs total at the default n).
    for cond in CONDITIONS[1:]:
        rng = pyrandom.Random(args.seed + 991 * (1 + CONDITIONS.index(cond)))
        docs = []
        for i in range(args.n):
            gen = DocumentGenerator(640, 640, seed=args.seed + 373 * i + 7,
                                    khmer_ratio=0.4)
            docs.append(apply_condition(gen.generate(), cond, rng))
        report[cond] = run_suite(docs)
        print(cond, json.dumps(report[cond]))

    docs = [DocumentGenerator(640, 640, seed=args.seed + 119 * i,
                              khmer_ratio=0.4).generate(layout="two_column")
            for i in range(args.n)]
    report["multi_column"] = run_suite(docs)
    print("multi_column", json.dumps(report["multi_column"]))

    total_docs = sum(v["n_docs"] for v in report.values())
    worst = min(report.items(), key=lambda kv: kv[1]["recall"])
    print(json.dumps({"detector": args.detector, "deskew": args.deskew,
                      "total_docs": total_docs,
                      "worst_condition": {worst[0]: worst[1]["recall"]},
                      "report": report}))


if __name__ == "__main__":
    main()
