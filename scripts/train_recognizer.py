"""Train the flagship recognizer on synthetic text lines -> models/model.safetensors.

Produces the checkpoint that bench.py and the benchmark harness use for
CER-at-throughput measurements. Bilingual: Khmer lines render through real
Khmer TTFs when present, else the deterministic procedural glyph pool
(data/pseudofont.py), so the Khmer paths are always exercised.

Usage: python scripts/train_recognizer.py [--samples 20000] [--epochs 12]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def doc_crop_samples(n: int, khmer_ratio: float, seed: int = 7000,
                     aug_conditions: float = 0.0,
                     resample_weight: float = 0.25):
    """Training lines cropped out of synthetic DOCUMENTS, with padding
    jitter approximating the DB detector's smart padding + the pipeline's
    +5px crop margin. Closes the distribution gap between cleanly-rendered
    synth lines and what the recognizer actually sees behind the detector
    (neighbor-line bleed at crop edges, document noise, region trims).

    With `aug_conditions` > 0, that fraction of source documents is passed
    through a docsynth degradation (noise / low-contrast / texture — the
    robustness-suite surface) BEFORE cropping, so the recognizer trains on
    the degraded crops the pipeline actually feeds it on hard pages
    (measured gap: matched CER 0.011 clean vs 0.135 noisy / 0.092
    low-contrast with a clean-crops-only flagship)."""
    import random

    import numpy as np

    from kiri_tpu.data.docsynth import DocumentGenerator, apply_condition

    # 'rotated' appears as 'resample': the pipeline deskews pages, so what
    # the recognizer actually sees on a rotated scan is the DOUBLE bilinear
    # resample (condition rotate + deskew rotate-back) of near-upright
    # text — modeled exactly here with the ground-truth angle (boxes are
    # unchanged because the rotations cancel). 'inverted' is normalized
    # away upstream by invert_if_dark.
    crop_conds = ("noisy", "low_contrast", "textured", "resample")
    r = random.Random(seed)
    out = []
    doc_seed = seed
    while len(out) < n:
        gen = DocumentGenerator(640, 640, seed=doc_seed,
                                khmer_ratio=khmer_ratio)
        doc = gen.generate()
        if aug_conditions and r.random() < aug_conditions:
            # 'resample' can be weighted up: the deskewed-rotated-page path
            # (double bilinear resample) is the hardest surviving condition
            # end-to-end, so continuations targeting it oversample here.
            if r.random() < resample_weight:
                cond = "resample"
            else:
                cond = r.choice([c for c in crop_conds if c != "resample"])
            if cond == "resample":
                from kiri_tpu.detect.deskew import rotate_image

                a = r.uniform(2.0, 6.0) * (1 if r.random() < 0.5 else -1)
                doc = dict(doc)
                doc["image"] = rotate_image(
                    rotate_image(np.asarray(doc["image"], np.uint8), a), -a)
            else:
                doc = apply_condition(doc, cond, r)
        img = doc["image"]
        for (x, y, w, h), text in zip(doc["lines"], doc["texts"]):
            if not text.strip() or w < 4 or h < 4:
                continue
            px, py = r.randint(2, 12), r.randint(2, 10)
            x0, y0 = max(0, x - px), max(0, y - py)
            x1 = min(img.shape[1], x + w + px)
            y1 = min(img.shape[0], y + h + py)
            crop = img[y0:y1, x0:x1]
            if crop.size == 0:
                continue
            out.append({"image": np.ascontiguousarray(crop), "text": text})
            if len(out) >= n:
                break
        doc_seed += 1
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=20000)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out-dir", default="models")
    ap.add_argument("--img-w", type=int, default=640)
    ap.add_argument("--enc-dim", type=int, default=256)
    ap.add_argument("--khmer-ratio", type=float, default=0.3)
    ap.add_argument("--max-words", type=int, default=14,
                    help="word budget per sampled line; raise toward ~20 so "
                         "small-font renders reach document-line density "
                         "(docsynth trims to region width, up to ~25 words)")
    ap.add_argument("--small-render-ratio", type=float, default=0.0,
                    help="fraction of lines rendered at 16-30 px heights "
                         "(kept native; the model-input upscale happens in "
                         "preprocess) — trains the encoder on document-"
                         "scale glyphs, where dense Khmer clusters lose "
                         "the most detail")
    ap.add_argument("--doc-crop-ratio", type=float, default=0.0,
                    help="fraction of samples drawn as detector-style crops "
                         "out of synthetic documents")
    ap.add_argument("--resample-weight", type=float, default=0.25,
                    help="within --aug-conditions, probability mass on the "
                         "double-resample (deskewed rotated page) condition")
    ap.add_argument("--small-resample", type=float, default=0.0,
                    help="fraction of small renders passed through the "
                         "double bilinear resample (rotated small text is "
                         "where the two hardest conditions meet)")
    ap.add_argument("--aug-conditions", type=float, default=0.0,
                    help="fraction of doc-crop source documents degraded "
                         "(noise/low-contrast/texture) before cropping")
    ap.add_argument("--enhance-ratio", type=float, default=0.0,
                    help="P(pass a sample through the serving enhance_crop "
                         "after generation/degradation) — aligns training "
                         "with OCR(enhance=True) serving, whose despike/"
                         "upscale-blur repairs reshape noisy small glyphs "
                         "in ways raw-degradation training never shows the "
                         "model (a no-op on clean renders)")
    ap.add_argument("--sign-boost", type=float, default=0.0,
                    help="fraction of Khmer lines sampled diacritic-dense "
                         "(targets the residual above-base-mark confusions)")
    ap.add_argument("--ctc-weight", type=float, default=0.5)
    ap.add_argument("--dec-weight", type=float, default=0.5,
                    help="raise above 0.5 to push AR-head (accurate-mode) "
                         "quality when it lags the CTC head")
    ap.add_argument("--from-model", default=None,
                    help="warm-start weights (ignored when out-dir has a "
                         "latest.safetensors to resume)")
    ap.add_argument("--select-metric", default="ctc",
                    choices=("ctc", "ar", "mean"),
                    help="best-checkpoint criterion; use ar/mean for "
                         "accurate-mode-focused continuation runs")
    ap.add_argument("--train-only", default=None, choices=("decoder",),
                    help="'decoder' freezes encoder+CTC (fast path stays "
                         "bit-identical) and trains only the AR decode path")
    ap.add_argument("--visual-order", action="store_true",
                    help="train on visual-order Khmer labels (pre-base "
                         "vowels at cluster front, monotonic with the ink; "
                         "CFG.KHMER_VISUAL_ORDER) — hypotheses map back to "
                         "logical order at the tokenizer boundary")
    ap.add_argument("--dec-input-noise", type=float, default=0.0,
                    help="P(corrupt a decoder-input token) — exposure-bias "
                         "regularization for the AR head")
    args = ap.parse_args()

    from kiri_tpu.config import CFG
    from kiri_tpu.data.synth import MultilingualDatasetGenerator, sample_text
    from kiri_tpu.tokenizer import CharTokenizer, build_full_vocab
    from kiri_tpu.train.trainer import TrainConfig, train_loop

    cfg = CFG(IMG_W=args.img_w, ENC_DIM=args.enc_dim,
              KHMER_VISUAL_ORDER=args.visual_order)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    print(f"Generating {args.samples} synthetic lines...")
    t0 = time.time()
    gen = MultilingualDatasetGenerator(str(out / "_gen_cache"),
                                       height=cfg.IMG_H, augment=True,
                                       khmer_ratio=args.khmer_ratio,
                                       sign_boost=args.sign_boost)
    n_doc = int(args.samples * args.doc_crop_ratio)
    n_small = int(args.samples * args.small_render_ratio)
    samples = gen.generate_samples(args.samples - n_doc - n_small,
                                   max_width=cfg.IMG_W,
                                   max_words=args.max_words)
    if n_small:
        heights = (16, 19, 22, 26, 30)
        print(f"  + {n_small} small renders at heights {heights}")
        for hi, h in enumerate(heights):
            g2 = MultilingualDatasetGenerator(
                str(out / "_gen_cache"), height=h, augment=True,
                khmer_ratio=args.khmer_ratio, sign_boost=args.sign_boost,
                seed=1000 + hi)
            batch_small = g2.generate_samples(
                n_small // len(heights),
                max_width=round(cfg.IMG_W * h / cfg.IMG_H),
                max_words=args.max_words)
            if args.small_resample:
                import random as _rr

                import numpy as _np

                from kiri_tpu.detect.deskew import rotate_image

                rr = _rr.Random(500 + hi)
                for s in batch_small:
                    if rr.random() < args.small_resample:
                        a = rr.uniform(2.0, 6.0) * (
                            1 if rr.random() < 0.5 else -1)
                        img = _np.asarray(s["image"], _np.uint8)
                        # Pad vertically first: rotating a wide thin strip
                        # in-place (expand=False) sweeps the line's ends
                        # out of frame — (w/2)*sin(6 deg) exceeds the crop
                        # height — which would erase end characters while
                        # keeping the label.
                        pad = int(img.shape[1] * 0.06) + 2
                        bg = int(_np.median(img))
                        img = _np.pad(img, ((pad, pad), (0, 0)),
                                      constant_values=bg)
                        img = rotate_image(rotate_image(img, a), -a)
                        s["image"] = img[pad:-pad]
            samples += batch_small
    if n_doc:
        print(f"  + {n_doc} detector-style document crops"
              + (f" ({args.aug_conditions:.0%} degraded)"
                 if args.aug_conditions else ""))
        doc = doc_crop_samples(n_doc, args.khmer_ratio,
                               aug_conditions=args.aug_conditions,
                               resample_weight=args.resample_weight)
        # Interleave so train/val splits and batches see both sources.
        import random as _random

        samples = samples + doc
        _random.Random(13).shuffle(samples)
    if args.enhance_ratio:
        import random as _er

        import numpy as _np

        from kiri_tpu.ops.preprocess import enhance_crop, invert_if_dark

        er = _er.Random(77)
        n_enh = 0
        for s in samples:
            if er.random() < args.enhance_ratio:
                s["image"] = enhance_crop(
                    invert_if_dark(_np.asarray(s["image"], _np.uint8)))
                n_enh += 1
        print(f"  + {n_enh} samples passed through the serving enhance_crop")
    n_val = max(64, len(samples) // 50)
    val = samples[:n_val]
    train = samples[n_val:]
    print(f"  {len(train)} train / {len(val)} val in {time.time() - t0:.0f}s")

    # Full-charset vocab (printable ASCII + Khmer block) unioned with any
    # observed characters — never observed-text-only (round 1's vocab was
    # missing 9 uppercase letters the sampler happened not to produce).
    vocab_path = str(out / "vocab.json")
    build_full_vocab(vocab_path, include_khmer=True,
                     extra_texts=(s["text"] for s in samples))
    tok = CharTokenizer(vocab_path, cfg)
    print(f"  vocab: {tok.vocab_size} chars")

    tc = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                     lr=args.lr, out_dir=str(out), log_every=100,
                     save_steps=0, ctc_weight=args.ctc_weight,
                     dec_weight=args.dec_weight,
                     select_metric=args.select_metric,
                     train_only=args.train_only,
                     dec_input_noise=args.dec_input_noise)
    trainer = train_loop(cfg, tok, tc, train, val, vocab_path=vocab_path,
                         from_model=args.from_model)
    print(f"Best val CTC exact-match: {trainer.best_val_acc * 100:.2f}%")
    # train_loop writes best model to models/model.safetensors.


if __name__ == "__main__":
    main()
