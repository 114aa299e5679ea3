"""Streaming throughput benchmark: driver config #5 — a multi-document batch
driven through ``extract_text_stream_chars`` at max throughput.

Generates N synthetic documents (DB detection + batched on-device decode,
char chunks replayed from the recorded device history), streams every
document end-to-end, and reports docs/s, lines/s, and chars/s as one JSON
line. Reference equivalent: one eager decode per region (~0.6 lines/s).

Also measures TIME-TO-FIRST-CHAR (VERDICT r3 #1): on a dense page, the
latency from calling extract_text_stream_chars to the first non-empty token
chunk, for the incremental windowed decode (default) vs the one-shot
decode+replay (--window 0). Done-criterion: windowed TTFC on a 20-region
page <= one window's decode, i.e. far below the one-shot TTFC.

Usage: python scripts/bench_streaming.py [--docs 20] [--decode fast]
           [--khmer-ratio 0.3] [--window 16] [--ttfc-doc-lines 20]
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
    ap.add_argument("--window", type=int, default=None,
                    help="stream window (None=cfg default, 0=one-shot)")
    ap.add_argument("--ttfc-runs", type=int, default=5)
    ap.add_argument("--out", default=None, metavar="FILE",
                    help="also merge the row into FILE (JSON dict keyed by "
                         "--label) — used to commit "
                         "benchmark/results_streaming.json")
    ap.add_argument("--label", default=None,
                    help="row key for --out (default: "
                         "'<decode>_windowed'/'<decode>_oneshot')")
    args = ap.parse_args()

    from PIL import Image

    from kiri_tpu.data.docsynth import DocumentGenerator
    from kiri_tpu.pipeline import OCR

    tmp = Path(tempfile.mkdtemp(prefix="kiri_stream_"))
    paths = []
    doc_lines = []
    n_gt_lines = 0
    for i in range(args.docs):
        gen = DocumentGenerator(640, 640, seed=args.seed + i,
                                khmer_ratio=args.khmer_ratio)
        doc = gen.generate()
        p = tmp / f"doc_{i:04d}.png"
        Image.fromarray(doc["image"]).save(p)
        paths.append(str(p))
        doc_lines.append(len(doc["lines"]))
        n_gt_lines += len(doc["lines"])

    ocr = OCR(args.model, det_method="db", decode_method=args.decode,
              stream_window=args.window)
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

    # Time-to-first-char on the densest document (median of N runs, already
    # warm). Measured from the generator call to the first chunk with a
    # non-empty token — detection + crop + encode + decode-until-first-char.
    dense = paths[int(np.argmax(doc_lines))]
    ttfc = []
    for _ in range(args.ttfc_runs):
        t0 = time.perf_counter()
        for chunk in ocr.extract_text_stream_chars(dense):
            if chunk.get("token"):
                ttfc.append(time.perf_counter() - t0)
                break
    ttfc_ms = round(float(np.median(ttfc)) * 1000, 1) if ttfc else None

    row = {
        "decode_method": args.decode,
        "stream_window": ocr.stream_window,
        "docs": args.docs,
        "gt_lines": n_gt_lines,
        "docs_per_sec": round(args.docs / dt, 2),
        "lines_per_sec": round(lines / dt, 2),
        "chars_per_sec": round(chars / dt, 1),
        "ttfc_ms": ttfc_ms,
        "ttfc_doc_lines": int(max(doc_lines)),
        "streamed_lines": lines,
        "streamed_chars": chars,
        "khmer_ratio": args.khmer_ratio,
    }
    print(json.dumps(row))
    if args.out:
        label = args.label or (
            f"{args.decode}_{'oneshot' if ocr.stream_window == 0 else 'windowed'}")
        out_p = Path(args.out)
        data = (json.loads(out_p.read_text()) if out_p.exists() else {})
        data[label] = row
        out_p.write_text(json.dumps(data, indent=2) + "\n")


if __name__ == "__main__":
    main()
