"""Sweep the device-beam dispatch knobs (row-chunk cap x step unroll) on
the real TPU and print lines/s per combo, plus text-identity vs the
baseline config.

Both knobs are text-identical variants by construction (chunking splits
independent rows, tests/test_beam_unroll.py::test_beam_device_bucketed_parity;
opt_unroll freezes overshoot sub-steps, test_unroll_bit_identical), so the
sweep is a pure throughput frontier. Serialize with other TPU jobs — run
nothing else on the chip.

Usage: python scripts/profile_beam_dispatch.py [--n 128] [--reps 3]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kiri_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--model", default=str(REPO / "models/model.safetensors"))
    args = ap.parse_args()

    from kiri_tpu.engine import RecognizerEngine
    from kiri_tpu.tokenizer import CharTokenizer
    from kiri_tpu.train.checkpoints import load_checkpoint

    variables, cfg, _ = load_checkpoint(args.model)
    tok = CharTokenizer(str(Path(args.model).parent / "vocab.json"), cfg)
    engine = RecognizerEngine(variables, cfg, tok)

    # Rendered bilingual lines (not noise): realistic step budgets.
    import tempfile

    from kiri_tpu.data.synth import MultilingualDatasetGenerator
    from kiri_tpu.ops.preprocess import resize_keep_ratio_pad_np
    gen = MultilingualDatasetGenerator(tempfile.mkdtemp(), height=cfg.IMG_H,
                                       augment=False, khmer_ratio=0.4,
                                       seed=5)
    samples = gen.generate_samples(args.n, max_width=cfg.IMG_W)
    imgs = np.stack([resize_keep_ratio_pad_np(s["image"], cfg.IMG_H,
                                              cfg.IMG_W)
                     for s in samples])
    memp, ctc, ids, conf, est, n = engine.encode_batch(imgs)
    memp, ctc, conf = jax.device_put((memp, ctc, conf))
    est_np = np.asarray(est)

    def run(chunk, unroll):
        object.__setattr__(engine.cfg, "BEAM_UNROLL", unroll)
        launched = engine.beam_device_bucketed(memp, ctc, est_np, conf,
                                               chunk=chunk)
        toks = jax.device_get([(d.tokens, d.lengths) for _, d in launched])
        texts = [""] * args.n
        for (sel, _), (tk, ln) in zip(launched, toks):
            for r, i in enumerate(sel):
                texts[int(i)] = tok.decode_dec(tk[r, 1:ln[r]])
        return texts

    def timeit(chunk, unroll):
        run(chunk, unroll)  # compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            texts = run(chunk, unroll)
        dt = time.perf_counter() - t0
        return args.n * args.reps / dt, texts

    base_lps, base_texts = timeit(64, 1)
    print(f"chunk= 64 unroll=1 (baseline): {base_lps:7.0f} lines/s",
          flush=True)
    for chunk, unroll in [(128, 1), (64, 2), (128, 2), (64, 4), (128, 4),
                          (32, 1)]:
        lps, texts = timeit(chunk, unroll)
        ident = texts == base_texts
        print(f"chunk={chunk:3d} unroll={unroll}: {lps:7.0f} lines/s  "
              f"identical_text={ident}", flush=True)
    object.__setattr__(engine.cfg, "BEAM_UNROLL", 1)


if __name__ == "__main__":
    main()
