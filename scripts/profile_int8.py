"""Measure the int8 fast path (ops/quant8.Q8Encoder) against bf16 on chip.

The round-4 roofline measured the bf16 fast path at 23.7% MFU; int8 MXU
compute is 2x the bf16 peak on v5e-class chips, so if the path is
MXU-bound the quantized encode should close toward 2x. This script times
device-resident encode+CTC for bf16 vs int8 (full and stem-only) at the
serving batch, and reports text agreement on the same rendered lines.

Run on the TPU host: python scripts/profile_int8.py [--batch 128] [--reps 24]
Writes benchmark/results_int8.json.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=24)
    ap.add_argument("--model", default="models/model.safetensors")
    args = ap.parse_args()

    import random

    import jax

    from kiri_tpu.data.synth import (DatasetGenerator, sample_khmer_text,
                                     sample_text)
    from kiri_tpu.ops.preprocess import resize_keep_ratio_pad_np
    from kiri_tpu.ops.quant8 import Q8Encoder
    from kiri_tpu.pipeline import OCR

    ocr = OCR(args.model)
    cfg, tok = ocr.cfg, ocr.tokenizer
    rng = random.Random(2718)
    charset = "".join(t for t in tok.token_to_id
                      if len(t) == 1 and t.isascii() and t.isprintable())
    texts = [sample_khmer_text(rng, 2, 5) if i % 5 < 2
             else sample_text(rng, 2, 7, charset)
             for i in range(args.batch)]
    import tempfile

    gen = DatasetGenerator(tempfile.mkdtemp(prefix="int8_"),
                           height=cfg.IMG_H, augment=False, seed=2718)
    samples = gen.generate_samples(args.batch, texts=texts)
    imgs = np.stack([resize_keep_ratio_pad_np(s["image"], cfg.IMG_H,
                                              cfg.IMG_W) for s in samples])
    dev_imgs = jax.device_put(imgs)

    def lev(a, b):
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

    def bench(fn, label):
        """Steady-state enqueue-all-fetch-once timing (same shape as
        bench.py's device-resident row; block_until_ready is a no-op on
        this backend, so real bytes are fetched)."""
        jit_fn = jax.jit(lambda im: fn(im)[1])
        ids = np.argmax(jax.device_get(jit_fn(dev_imgs)), -1)  # warm + text
        t0 = time.perf_counter()
        pend = [jit_fn(dev_imgs) for _ in range(args.reps)]
        for ctc in jax.device_get(pend):
            np.argmax(ctc, -1)
        dt = time.perf_counter() - t0
        lps = args.batch * args.reps / dt
        print(f"{label:16s} {dt / args.reps * 1000:7.2f} ms/batch "
              f"{lps:9.1f} lines/s")
        return lps, tok.decode_ctc_batch(ids)

    rows = {}
    lps_b, texts_b = bench(lambda im: Q8Encoder(ocr.engine.variables,
                                                cfg).bf16(im), "bf16")
    rows["bf16_lines_per_sec"] = round(lps_b, 1)
    for parts, label in [(("stem",), "int8_stem"),
                         (("stem", "attn", "ffn"), "int8_full"),
                         (("attn", "ffn"), "int8_encoder")]:
        q = Q8Encoder(ocr.engine.variables, cfg, parts=parts)
        q.calibrate(imgs[: min(32, args.batch)])
        lps, texts_q = bench(q, label)
        total = sum(max(1, len(b)) for b in texts_b)
        cer = sum(lev(a, b) for a, b in zip(texts_q, texts_b)) / total
        rows[f"{label}_lines_per_sec"] = round(lps, 1)
        rows[f"{label}_cer_vs_bf16"] = round(cer, 5)
        print(f"{label:16s} cer_vs_bf16={cer:.5f}")

    rows["batch"] = args.batch
    rows["reps"] = args.reps
    rows["note"] = ("device-resident encode+CTC timing; lines/s excludes "
                    "host text decode")
    out = REPO / "benchmark" / "results_int8.json"
    out.write_text(json.dumps(rows, indent=1))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
