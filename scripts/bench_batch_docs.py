"""Pooled multi-document throughput: extract_text_batch vs per-document.

Generates N synthetic documents and measures wall-clock for (a) the classic
per-document ``extract_text`` loop and (b) the pooled
``extract_text_batch`` pass that recognizes every page's regions in one
width-bucketed device dispatch cycle. Asserts both produce identical text so
the speedup is an apples-to-apples dispatch/transfer win.

Usage: python scripts/bench_batch_docs.py [--docs 20] [--decode fast]
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="models/model.safetensors")
    ap.add_argument("--docs", type=int, default=20)
    ap.add_argument("--decode", default="fast",
                    choices=["fast", "accurate", "beam", "auto"])
    ap.add_argument("--khmer-ratio", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=12000)
    ap.add_argument("--out", default="",
                    help="also write the result JSON to this path")
    ap.add_argument("--map-downsample", type=int, default=1,
                    help="DB det_map_downsample serving knob")
    args = ap.parse_args()

    from PIL import Image

    from kiri_tpu.data.docsynth import DocumentGenerator
    from kiri_tpu.pipeline import OCR

    tmp = Path(tempfile.mkdtemp(prefix="kiri_batchdocs_"))
    paths = []
    for i in range(args.docs):
        gen = DocumentGenerator(640, 640, seed=args.seed + i,
                                khmer_ratio=args.khmer_ratio)
        doc = gen.generate()
        p = tmp / f"doc_{i:04d}.png"
        Image.fromarray(doc["image"]).save(p)
        paths.append(str(p))

    det_kwargs = ({"det_map_downsample": args.map_downsample}
                  if args.map_downsample > 1 else None)
    ocr = OCR(args.model, det_method="db", decode_method=args.decode,
              det_kwargs=det_kwargs)
    # Warmup both paths so every bucket program is compiled before timing.
    ocr.extract_text_batch(paths)
    for p in paths:
        ocr.extract_text(p)

    t0 = time.perf_counter()
    pooled = ocr.extract_text_batch(paths)
    t_pooled = time.perf_counter() - t0

    t0 = time.perf_counter()
    sequential = [ocr.extract_text(p) for p in paths]
    t_seq = time.perf_counter() - t0

    # Pooled batches pad to different bucket shapes than per-doc batches;
    # XLA does not guarantee bit-equal bf16 logits across program shapes,
    # so rare near-tie argmax flips (single confusable glyphs) are expected
    # on TPU. Demand near-identity, not bit-identity.
    def _lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for x, ca in enumerate(a, 1):
            cur = [x]
            for y, cb in enumerate(b, 1):
                cur.append(min(prev[y] + 1, cur[y - 1] + 1,
                               prev[y - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    dist = sum(_lev(tp, ts) for (tp, _), (ts, _) in zip(pooled, sequential))
    total = sum(len(ts) for ts, _ in sequential)
    assert dist <= max(2, 0.002 * total), \
        f"pooled text diverges from per-document text: {dist}/{total} chars"
    n_lines = sum(len(r) for _, r in pooled)

    result = {
        "decode_method": args.decode,
        "docs": args.docs,
        "lines": n_lines,
        "pooled_docs_per_sec": round(args.docs / t_pooled, 2),
        "sequential_docs_per_sec": round(args.docs / t_seq, 2),
        "pooled_lines_per_sec": round(n_lines / t_pooled, 2),
        "sequential_lines_per_sec": round(n_lines / t_seq, 2),
        "speedup": round(t_seq / t_pooled, 2),
        "khmer_ratio": args.khmer_ratio,
        "map_downsample": args.map_downsample,
    }
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
