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
    args = ap.parse_args()

    from kiri_tpu.config import CFG
    from kiri_tpu.data.synth import MultilingualDatasetGenerator, sample_text
    from kiri_tpu.tokenizer import CharTokenizer, build_full_vocab
    from kiri_tpu.train.trainer import TrainConfig, train_loop

    cfg = CFG(IMG_W=args.img_w, ENC_DIM=args.enc_dim)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    print(f"Generating {args.samples} synthetic lines...")
    t0 = time.time()
    gen = MultilingualDatasetGenerator(str(out / "_gen_cache"),
                                       height=cfg.IMG_H, augment=True,
                                       khmer_ratio=args.khmer_ratio)
    samples = gen.generate_samples(args.samples, max_width=cfg.IMG_W,
                                   max_words=args.max_words)
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
                     save_steps=0)
    trainer = train_loop(cfg, tok, tc, train, val, vocab_path=vocab_path)
    print(f"Best val CTC exact-match: {trainer.best_val_acc * 100:.2f}%")
    # train_loop writes best model to models/model.safetensors.


if __name__ == "__main__":
    main()
