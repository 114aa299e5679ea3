"""Standalone benchmark-dataset generator.

Role parity with the reference's benchmark/generate_bench_data.py:12-142,
which (1) collects a font pool, (2) samples benchmark text lines, and
(3) renders a per-font line-image dataset to disk for the benchmark runner.
Here the font pool comes from FontManager discovery (English TTFs plus the
Khmer pool — real Khmer TTFs when present on the host, else the deterministic
pseudo-glyph fallback), and the dataset is written as

    <out>/<font-stem>/NNNN.png  +  <out>/<font-stem>/labels.json
    <out>/manifest.json         (font -> script/count/dir)

`run_benchmark.py --data-dir <out>` consumes this layout instead of
generating inline, so the dataset can be produced once, inspected, and
reused across decode modes for strictly comparable CER rows.

Usage:
    python benchmark/generate_bench_data.py [--out benchmark/data]
        [--lines-per-font 100] [--en-fonts 6] [--km-fonts 4] [--seed 42]
"""
from __future__ import annotations

import argparse
import json
import random
import sys
from pathlib import Path

import numpy as np
from PIL import Image

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# This tool never needs an accelerator; pin JAX to CPU before any kiri_tpu
# import so a data-generation run can't steal the device grant from a
# concurrent training job (setting JAX_PLATFORMS alone can be overridden
# by platform plugins).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmark/data")
    ap.add_argument("--lines-per-font", type=int, default=100)
    ap.add_argument("--en-fonts", type=int, default=6)
    ap.add_argument("--km-fonts", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--height", type=int, default=None,
                    help="render height (default: CFG.IMG_H)")
    ap.add_argument("--charset-model", default="models/model.safetensors",
                    help="restrict sampled text to this model's charset "
                         "(pass '' to disable)")
    args = ap.parse_args()

    from kiri_tpu.config import CFG
    from kiri_tpu.data.synth import (FontManager, ImageRenderer,
                                     sample_khmer_text, sample_text)

    height = args.height or CFG.IMG_H
    charset = None
    if args.charset_model:
        model_path = Path(args.charset_model)
        if model_path.exists():
            from kiri_tpu.tokenizer import CharTokenizer
            from kiri_tpu.train.checkpoints import find_vocab_file
            vocab = find_vocab_file("", str(model_path))
            if vocab:
                tok = CharTokenizer(vocab)
                charset = set(t for t in tok.token_to_id if len(t) == 1)

    fonts = FontManager()
    renderer = ImageRenderer(height=height, augment=False)
    rng = random.Random(args.seed)

    en_pool = (fonts.english_fonts or fonts.font_paths)[: args.en_fonts]
    kh_pool = fonts.khmer_fonts[: args.km_fonts]
    jobs = [(p, "en") for p in en_pool] + [(p, "km") for p in kh_pool]
    if not jobs:
        print("No fonts discovered; nothing to generate.")
        sys.exit(1)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    manifest = {}
    for font_path, script in jobs:
        name = Path(font_path).stem
        font_dir = out / name
        font_dir.mkdir(exist_ok=True)
        labels = {}
        n_written = 0
        attempts = 0
        while n_written < args.lines_per_font and attempts < args.lines_per_font * 3:
            attempts += 1
            text = (sample_khmer_text(rng, 2, 5) if script == "km"
                    else sample_text(rng, 2, 8))
            if charset is not None:
                text = "".join(c for c in text if c in charset)
            if not text.strip():
                continue
            try:
                font = fonts.get(font_path, 32)
                img = renderer.render(text, font, rng)
            except Exception:
                continue
            fname = f"{n_written:04d}.png"
            Image.fromarray(np.asarray(img, np.uint8)).save(font_dir / fname)
            labels[fname] = text
            n_written += 1
        (font_dir / "labels.json").write_text(
            json.dumps(labels, ensure_ascii=False, indent=1))
        manifest[name] = {"script": script, "count": n_written,
                          "dir": str(font_dir.relative_to(out))}
        print(f"  {name:40s} {script}  {n_written} lines")

    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    total = sum(v["count"] for v in manifest.values())
    print(f"✓ {total} lines across {len(manifest)} fonts -> {out}/")


if __name__ == "__main__":
    main()
