"""Kiri-TPU benchmark harness: per-font CER / exact-line accuracy / throughput.

Workload parity with the reference harness (reference: benchmark/
run_benchmark.py:15-187): synthetic single-line datasets per font, CER via
Levenshtein distance, exact-match line accuracy, and speed; results written
to results.json / results.txt. TPU-first difference: recognition runs in
batched compiled dispatches (lines/sec is the headline, per the driver
metric), and a batch-1 p50 latency is also reported.

Usage:
    python benchmark/run_benchmark.py --model models/model.safetensors \
        [--lines-per-font 100] [--decode fast|accurate|beam]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
import unicodedata
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from kiri_tpu.utils.khmer import cluster_cer  # noqa: E402


def levenshtein(a: str, b: str) -> int:
    """Edit distance (reference benchmark/run_benchmark.py:15-32)."""
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


def cer(ref: str, hyp: str) -> float:
    ref = unicodedata.normalize("NFC", ref)
    hyp = unicodedata.normalize("NFC", hyp)
    if not ref:
        return 0.0 if not hyp else 1.0
    return levenshtein(ref, hyp) / len(ref)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="models/model.safetensors")
    ap.add_argument("--lines-per-font", type=int, default=100)
    ap.add_argument("--decode", default="fast",
                    choices=["fast", "accurate", "beam", "auto"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--output-dir", default="benchmark")
    ap.add_argument("--data-dir", default=None,
                    help="pre-generated dataset from generate_bench_data.py; "
                         "when set, lines are loaded from disk instead of "
                         "rendered inline")
    ap.add_argument("--latency-samples", type=int, default=30,
                    help="batch-1 dispatches for the p50 latency row")
    args = ap.parse_args()

    from kiri_tpu.data.synth import (FontManager, ImageRenderer,
                                     sample_khmer_text, sample_text)
    from kiri_tpu.ops.preprocess import (content_width,
                                         resize_keep_ratio_pad_np)
    from kiri_tpu.pipeline import OCR

    ocr = OCR(args.model, det_method="legacy", decode_method=args.decode)
    cfg, tok = ocr.cfg, ocr.tokenizer
    charset = "".join(t for t in tok.token_to_id if len(t) == 1)

    fonts = FontManager()
    renderer = ImageRenderer(height=cfg.IMG_H, augment=False)
    import random

    rng = random.Random(42)

    # Font rows: English TTFs plus the Khmer pool (the reference benchmarks
    # 10 Khmer fonts, benchmark/generate_bench_data.py:26-37; on hosts with
    # no Khmer TTF the deterministic pseudo-glyph pool stands in).
    en_pool = (fonts.english_fonts or fonts.font_paths)[:6]
    kh_pool = fonts.khmer_fonts[:4]
    jobs = [(p, "en") for p in en_pool] + [(p, "km") for p in kh_pool]

    def _sample(script: str) -> str:
        if script == "km":
            text = sample_khmer_text(rng, 2, 5)
        else:
            text = sample_text(rng, 2, 8)
        return "".join(c for c in text if c in charset) or "a"

    # Dataset rows: (name, script, raw line images, ground-truth texts) —
    # either loaded from a generate_bench_data.py run (--data-dir) or
    # rendered inline.
    rows = []
    if args.data_dir:
        from PIL import Image
        data_dir = Path(args.data_dir)
        manifest = json.loads((data_dir / "manifest.json").read_text())
        for name, info in manifest.items():
            labels = json.loads(
                (data_dir / info["dir"] / "labels.json").read_text())
            texts, raws = [], []
            for fname, text in sorted(labels.items()):
                raws.append(np.asarray(
                    Image.open(data_dir / info["dir"] / fname).convert("L"),
                    np.uint8))
                texts.append(text)
            rows.append((name, info["script"], raws, texts))
    else:
        for font_path, script in jobs:
            texts, raws = [], []
            for _ in range(args.lines_per_font):
                text = _sample(script)
                try:
                    font = fonts.get(font_path, 32)
                    raws.append(renderer.render(text, font, rng))
                except Exception:
                    continue
                texts.append(text)
            rows.append((Path(font_path).stem, script, raws, texts))

    per_font = {}
    for name, script, raws, texts in rows:
        imgs, widths = [], []
        for img in raws:
            widths.append(content_width(img.shape, cfg.IMG_H, cfg.IMG_W))
            imgs.append(resize_keep_ratio_pad_np(img, cfg.IMG_H, cfg.IMG_W))
        if not imgs:
            continue
        batch = np.stack(imgs)
        widths = np.asarray(widths, np.int32)

        # Warmup: one full untimed pass so every (batch-bucket, width-bucket,
        # step-bucket) program this font row hits is compiled before timing —
        # a single leading call misses bucket combos that only appear in
        # later chunks and the stray compiles land inside the timed region.
        for i in range(0, len(batch), args.batch):
            ocr.engine.recognize_batch(batch[i: i + args.batch],
                                       ocr.decode_method,
                                       widths=widths[i: i + args.batch])
        t0 = time.perf_counter()
        outs = []
        for i in range(0, len(batch), args.batch):
            outs.extend(ocr.engine.recognize_batch(
                batch[i: i + args.batch], ocr.decode_method,
                widths=widths[i: i + args.batch]))
        dt = time.perf_counter() - t0

        cers = [cer(t, o[0]) for t, o in zip(texts, outs)]
        ccers = [cluster_cer(t, o[0]) for t, o in zip(texts, outs)]
        exact = [unicodedata.normalize("NFC", t)
                 == unicodedata.normalize("NFC", o[0])
                 for t, o in zip(texts, outs)]
        per_font[name] = {
            "script": script,
            "cer": float(np.mean(cers)),
            # Grapheme-cluster CER: edit distance over Khmer orthographic
            # clusters (kiri_tpu/utils/khmer.py) — the script-faithful
            # metric; equals codepoint CER on pure-Latin fonts.
            "cluster_cer": float(np.mean(ccers)),
            "accuracy": float(np.mean([1 - c for c in cers])),
            "line_accuracy": float(np.mean(exact)),
            "lines_per_sec": len(batch) / dt,
            "ms_per_line": dt / len(batch) * 1000,
            "n": len(batch),
        }
        print(f"{name:40s} CER={per_font[name]['cer']:.4f} "
              f"line_acc={per_font[name]['line_accuracy'] * 100:5.1f}% "
              f"{per_font[name]['lines_per_sec']:8.1f} lines/s")

    if not per_font:
        print("No fonts available; nothing benchmarked.")
        return

    avg = {k: float(np.mean([v[k] for v in per_font.values()]))
           for k in ("cer", "cluster_cer", "accuracy", "line_accuracy",
                     "lines_per_sec", "ms_per_line")}

    # Batch-1 p50 latency (interactive path): single narrow line, repeated
    # dispatches after warmup.
    lat_font = fonts.get(en_pool[0], 32) if en_pool else None
    p50_ms = None
    if lat_font is not None and args.latency_samples > 0:
        text = _sample("en")
        img = renderer.render(text, lat_font, rng)
        w1 = np.asarray([content_width(img.shape, cfg.IMG_H, cfg.IMG_W)],
                        np.int32)
        b1 = resize_keep_ratio_pad_np(img, cfg.IMG_H, cfg.IMG_W)[None]
        ocr.engine.recognize_batch(b1, ocr.decode_method, widths=w1)
        lat = []
        for _ in range(args.latency_samples):
            t0 = time.perf_counter()
            ocr.engine.recognize_batch(b1, ocr.decode_method, widths=w1)
            lat.append((time.perf_counter() - t0) * 1000)
        p50_ms = float(np.percentile(lat, 50))
        avg["p50_batch1_ms"] = p50_ms
        print(f"batch-1 p50 latency: {p50_ms:.1f} ms")

    results = {"decode_method": args.decode, "per_font": per_font,
               "average": avg}
    out = Path(args.output_dir)
    out.mkdir(exist_ok=True)
    (out / f"results_{args.decode}.json").write_text(
        json.dumps(results, indent=2))
    if args.decode == "fast":
        (out / "results.json").write_text(json.dumps(results, indent=2))
    lines = [f"{'FONT':40s} {'CER':>8s} {'ACC':>7s} {'LINES/S':>9s}"]
    for name, v in per_font.items():
        lines.append(f"{name:40s} {v['cer']:8.4f} "
                     f"{v['accuracy'] * 100:6.1f}% {v['lines_per_sec']:9.1f}")
    lines.append(f"{'AVERAGE':40s} {avg['cer']:8.4f} "
                 f"{avg['accuracy'] * 100:6.1f}% {avg['lines_per_sec']:9.1f}")
    # Per-decode txt so e.g. a beam run can't leave results.txt inconsistent
    # with a stale results.json; the unsuffixed pair tracks the fast run only.
    (out / f"results_{args.decode}.txt").write_text("\n".join(lines))
    if args.decode == "fast":
        (out / "results.txt").write_text("\n".join(lines))
    print("\n".join(lines[-1:]))
    print(f"✓ Results -> {out}/results_{args.decode}.json")


if __name__ == "__main__":
    main()
