"""Standalone benchmark-dataset generator (reference parity tool).

Mirrors the reference's benchmark/generate_bench_data.py:12-142 surface:
pick a benchmark font set, select/sample a line-text corpus, and render one
line-image dataset PER FONT under benchmark/data/<font>/ with labels.txt —
so the benchmark harness (run_benchmark.py) and third parties can consume
the data without regenerating it inline.

TPU-repo differences: fonts are discovered from the system font pool (plus
the deterministic Khmer pseudo-font when no Khmer TTF exists) instead of a
hardcoded 10-font list, and text is synthesized by data/synth.py samplers
when no --text-file corpus is given.

Usage:
  python benchmark/generate_bench_data.py [--lines 100] [--text-file f.txt]
      [--output-dir benchmark/data] [--height 48] [--seed 0]
"""
from __future__ import annotations

import argparse
import random
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from kiri_tpu.data.synth import (FontManager, ImageRenderer, _is_khmer,
                                 sample_khmer_text, sample_text)


def create_benchmark_text(input_file: str, output_file: Path, count: int,
                          seed: int) -> list:
    """Reservoir-sample ``count`` lines from a corpus file
    (reference: generate_bench_data.py:52-79)."""
    rng = random.Random(seed)
    selected: list = []
    with open(input_file, "r", encoding="utf-8") as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            if len(selected) < count:
                selected.append(line)
            else:
                j = rng.randint(0, i)
                if j < count:
                    selected[j] = line
    output_file.write_text("\n".join(selected), encoding="utf-8")
    return selected


def synthesize_text(count: int, seed: int, output_file: Path) -> list:
    """No corpus available: sample English and Khmer lines 50/50."""
    rng = random.Random(seed)
    lines = []
    for i in range(count):
        if i % 2 == 0:
            lines.append(sample_text(rng, 2, 8))
        else:
            lines.append(sample_khmer_text(rng, 1, 5))
    output_file.write_text("\n".join(lines), encoding="utf-8")
    return lines


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=100,
                    help="text lines rendered per font")
    ap.add_argument("--text-file", default=None,
                    help="corpus to reservoir-sample from (default: "
                         "synthesize with data/synth.py samplers)")
    ap.add_argument("--output-dir", default=str(REPO / "benchmark" / "data"))
    ap.add_argument("--height", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-fonts", type=int, default=10)
    args = ap.parse_args()

    out_base = Path(args.output_dir)
    if out_base.exists():
        shutil.rmtree(out_base)
    out_base.mkdir(parents=True)

    fonts = FontManager()
    pool = list(dict.fromkeys(
        (fonts.english_fonts or []) + (fonts.khmer_fonts or [])))[: args.max_fonts]
    if not pool:
        print("Error: no usable fonts discovered")
        sys.exit(1)
    print(f"Benchmark font set ({len(pool)}):")
    for p in pool:
        print(f"  {Path(p).name}")

    text_path = out_base / "bench_text.txt"
    if args.text_file:
        lines = create_benchmark_text(args.text_file, text_path,
                                      args.lines, args.seed)
    else:
        lines = synthesize_text(args.lines, args.seed, text_path)
    print(f"{len(lines)} benchmark lines -> {text_path}")

    renderer = ImageRenderer(height=args.height, augment=False)
    rng = random.Random(args.seed)
    from PIL import Image

    for font_path in pool:
        name = Path(font_path).stem.replace(" ", "_").replace(".", "_")
        font_dir = out_base / name
        (font_dir / "images").mkdir(parents=True)
        font = fonts.get(font_path, 32)
        khmer_ok = font_path in fonts.khmer_fonts
        n = 0
        with (font_dir / "labels.txt").open("w", encoding="utf-8") as f:
            for text in lines:
                if _is_khmer(text) and not khmer_ok:
                    continue  # font cannot shape this line
                try:
                    img = renderer.render(text, font, rng)
                except Exception:
                    continue
                fname = f"img_{n:06d}.png"
                Image.fromarray(img).save(font_dir / "images" / fname)
                f.write(f"{fname}\t{text}\n")
                n += 1
        print(f"  {name}: {n} lines")

    print(f"Benchmark data generation complete -> {out_base}")


if __name__ == "__main__":
    main()
