"""Streaming throughput benchmark: driver config #5 — a multi-document batch
driven through ``extract_text_stream_chars`` at max throughput.

Generates N synthetic documents (DB detection + batched on-device decode,
char chunks replayed from the recorded device history), streams every
document end-to-end, and reports docs/s, lines/s, and chars/s as one JSON
line. Reference equivalent: one eager decode per region (~0.6 lines/s).

Usage: python scripts/bench_streaming.py [--docs 20] [--decode fast]
           [--khmer-ratio 0.3]
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="models/model.safetensors")
    ap.add_argument("--docs", type=int, default=20)
    ap.add_argument("--decode", default="fast",
                    choices=["fast", "accurate", "beam", "auto"])
    ap.add_argument("--khmer-ratio", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=9000)
    args = ap.parse_args()

    from PIL import Image

    from kiri_tpu.data.docsynth import DocumentGenerator
    from kiri_tpu.pipeline import OCR

    tmp = Path(tempfile.mkdtemp(prefix="kiri_stream_"))
    paths = []
    n_gt_lines = 0
    for i in range(args.docs):
        gen = DocumentGenerator(640, 640, seed=args.seed + i,
                                khmer_ratio=args.khmer_ratio)
        doc = gen.generate()
        p = tmp / f"doc_{i:04d}.png"
        Image.fromarray(doc["image"]).save(p)
        paths.append(str(p))
        n_gt_lines += len(doc["lines"])

    ocr = OCR(args.model, det_method="db", decode_method=args.decode)
    # Warmup: one full untimed pass over every document so each program the
    # stream hits (batch buckets vary with per-doc line counts) is compiled
    # before timing.
    for p in paths:
        list(ocr.extract_text_stream_chars(p))

    chars = lines = 0
    t0 = time.perf_counter()
    for p in paths:
        for chunk in ocr.extract_text_stream_chars(p):
            if chunk.get("token"):
                chars += len(chunk["token"])
            if chunk.get("region_finished"):
                lines += 1
    dt = time.perf_counter() - t0

    print(json.dumps({
        "decode_method": args.decode,
        "docs": args.docs,
        "gt_lines": n_gt_lines,
        "docs_per_sec": round(args.docs / dt, 2),
        "lines_per_sec": round(lines / dt, 2),
        "chars_per_sec": round(chars / dt, 1),
        "streamed_lines": lines,
        "streamed_chars": chars,
        "khmer_ratio": args.khmer_ratio,
    }))


if __name__ == "__main__":
    main()
