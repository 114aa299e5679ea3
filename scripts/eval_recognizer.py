"""Evaluate a recognizer checkpoint: CER per decode method, split by script.

Renders held-out synthetic lines (seed disjoint from training) through the
same bilingual generator used for training data, recognizes them with each
decode method, and reports CER + exact-line accuracy overall and per script
(English / Khmer / mixed). Mirrors the reference harness's metric
definitions (reference: benchmark/run_benchmark.py:15-39, NFC normalize at
:111-112).

Usage: python scripts/eval_recognizer.py [--model models/model.safetensors]
           [--n 300] [--khmer-ratio 0.5] [--methods fast,accurate,beam]
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import unicodedata
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def lev(a: str, b: str) -> int:
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


def script_of(text: str) -> str:
    has_kh = any(0x1780 <= ord(c) <= 0x17FF for c in text)
    has_en = any(c.isascii() and c.isalnum() for c in text)
    if has_kh and has_en:
        return "mixed"
    return "khmer" if has_kh else "english"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="models/model.safetensors")
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--khmer-ratio", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--methods", default="fast,accurate,beam")
    ap.add_argument("--dump-errors", default=None, metavar="DIR",
                    help="write per-method mismatch reports (JSON + line "
                         "images) into DIR for error analysis")
    ap.add_argument("--degrade", action="store_true",
                    help="apply document-style degradations to the line "
                         "crops before recognition — the robustness-suite "
                         "surface at line granularity (conditions: gaussian "
                         "noise + salt&pepper, contrast compression, "
                         "rotate-resample; per-condition CER is reported)")
    ap.add_argument("--render-height", type=int, default=None,
                    help="render lines at this height instead of the model "
                         "height (e.g. 22 = document-scale glyphs)")
    ap.add_argument("--enhance", action="store_true",
                    help="run the adaptive crop-enhancement stage "
                         "(ops/preprocess.enhance_crop) before recognition "
                         "— pair with --degrade to measure its recovery")
    args = ap.parse_args()

    from kiri_tpu.data.synth import MultilingualDatasetGenerator
    from kiri_tpu.ops.preprocess import content_width, resize_keep_ratio_pad_np
    from kiri_tpu.pipeline import OCR
    from kiri_tpu.utils.khmer import cluster_cer

    ocr = OCR(args.model)
    cfg = ocr.cfg
    tmp = tempfile.mkdtemp(prefix="kiri_eval_")
    render_h = args.render_height or cfg.IMG_H
    max_w = round(cfg.IMG_W * render_h / cfg.IMG_H)
    gen = MultilingualDatasetGenerator(tmp, height=render_h, augment=False,
                                      khmer_ratio=args.khmer_ratio,
                                      seed=args.seed)
    samples = gen.generate_samples(args.n, max_width=max_w)
    conditions = [None] * len(samples)
    if args.degrade:
        # Mirror docsynth's degradation conditions on line crops
        # (data/docsynth.py:48-102), deterministic per line.
        from PIL import Image

        rng = np.random.default_rng(args.seed)
        kinds = ("noisy", "low_contrast", "rot_resample")
        for i, s in enumerate(samples):
            img = s["image"].astype(np.float32)
            kind = kinds[int(rng.integers(0, len(kinds)))]
            conditions[i] = kind
            if kind == "noisy":
                img = img + rng.normal(0, rng.uniform(14, 26), img.shape)
                mask = rng.random(img.shape)
                img[mask < 0.002] = 0
                img[mask > 0.998] = 255
            elif kind == "low_contrast":
                lo = rng.uniform(70, 110)
                hi = rng.uniform(170, 210)
                img = img / 255.0 * (hi - lo) + lo
            else:  # what a deskew-straightened skewed page feeds recognition
                a = float(rng.uniform(2, 6)) * (1 if rng.random() < 0.5
                                                else -1)
                pil = Image.fromarray(s["image"])
                big = pil.rotate(a, resample=Image.BILINEAR, expand=True,
                                 fillcolor=255)
                back = big.rotate(-a, resample=Image.BILINEAR, expand=True,
                                  fillcolor=255)
                arr = np.asarray(back, np.float32)
                h, w = s["image"].shape
                y0, x0 = (arr.shape[0] - h) // 2, (arr.shape[1] - w) // 2
                img = arr[y0:y0 + h, x0:x0 + w]
            s["image"] = np.clip(img, 0, 255).astype(np.uint8)
    if args.enhance:
        from kiri_tpu.ops.preprocess import enhance_crop

        for i, s in enumerate(samples):
            s["image"] = enhance_crop(s["image"],
                                      sharpen=conditions[i] == "rot_resample")
    texts = [unicodedata.normalize("NFC", s["text"]) for s in samples]
    widths = np.asarray([content_width(s["image"].shape, cfg.IMG_H, cfg.IMG_W)
                         for s in samples], np.int32)
    imgs = np.stack([resize_keep_ratio_pad_np(s["image"], cfg.IMG_H, cfg.IMG_W)
                     for s in samples])
    scripts = [script_of(t) for t in texts]

    report = {}
    for method in args.methods.split(","):
        method = method.strip()
        outs = []
        B = 64
        for i in range(0, len(imgs), B):
            outs.extend(ocr.engine.recognize_batch(
                imgs[i: i + B], ocr._normalize_decode_method(method),
                widths=widths[i: i + B]))
        per = {}
        groups = [("english", scripts), ("khmer", scripts),
                  ("mixed", scripts), ("all", scripts)]
        if args.degrade:
            groups += [(k, conditions)
                       for k in ("noisy", "low_contrast", "rot_resample")]
        for grp, labels in groups:
            idx = [i for i, s in enumerate(labels) if grp in ("all", s)]
            if not idx:
                continue
            cers = [lev(texts[i], unicodedata.normalize("NFC", outs[i][0]))
                    / max(1, len(texts[i])) for i in idx]
            ccers = [cluster_cer(texts[i], outs[i][0]) for i in idx]
            exact = [unicodedata.normalize("NFC", outs[i][0]) == texts[i]
                     for i in idx]
            per[grp] = {"n": len(idx),
                        "cer": round(float(np.mean(cers)), 4),
                        "cluster_cer": round(float(np.mean(ccers)), 4),
                        "exact": round(float(np.mean(exact)), 4)}
        report[method] = per
        print(method, json.dumps(per))

        if args.dump_errors:
            dump_dir = Path(args.dump_errors)
            dump_dir.mkdir(parents=True, exist_ok=True)
            errs = []
            for i, t in enumerate(texts):
                hyp = unicodedata.normalize("NFC", outs[i][0])
                if hyp == t:
                    continue
                errs.append({"idx": i, "script": scripts[i],
                             "truth": t, "hyp": hyp,
                             "cer": round(lev(t, hyp) / max(1, len(t)), 4),
                             "conf": round(float(outs[i][1]), 4)})
                try:
                    from PIL import Image
                    Image.fromarray(samples[i]["image"]).save(
                        dump_dir / f"err_{method}_{i:04d}.png")
                except Exception:
                    pass
            (dump_dir / f"errors_{method}.json").write_text(
                json.dumps(errs, ensure_ascii=False, indent=1))
            print(f"  {len(errs)} mismatches -> {dump_dir}/errors_{method}.json")

    print(json.dumps({"model": args.model, "n": args.n,
                      "khmer_ratio": args.khmer_ratio, "report": report}))


if __name__ == "__main__":
    main()
