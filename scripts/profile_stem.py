"""Per-layer stem timing: XLA native conv vs im2col matmul on the real TPU.

Measures each stem conv both ways at flagship shapes (batch 128, 48x640
input), plus the full encode, fetching real bytes per rep (block_until_ready
is a no-op on the axon backend). Documents the round-3 stem rewrite
(models/recognizer.py:_conv3x3_matmul); reference stem spec:
/root/reference/kiri_ocr/model.py:211-231.

Usage: python scripts/profile_stem.py  (serialize with other TPU jobs!)
"""
from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from kiri_tpu.models.recognizer import _conv3x3_matmul
from kiri_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

B, H, W = 128, 48, 640
LAYERS = [  # (cin, cout, stride) — flagship stem
    (1, 48, (1, 1)),
    (48, 96, (2, 2)),
    (96, 160, (2, 2)),
    (160, 256, (2, 1)),
]


def timed(fn, *args, reps=5):
    """fn must return a SCALAR (block_until_ready is a no-op on axon, and
    fetching a full activation would time the ~27MB/s tunnel, not the chip;
    a scalar fetch costs only the RTT, subtracted via the rep division)."""
    out = fn(*args)
    np.asarray(out)  # real fetch = real sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps * 1000  # ms


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    h, w = H, W
    x = jnp.asarray(rng.standard_normal((B, h, w, 1)), jnp.bfloat16)
    total_lax = total_mm = 0.0
    for i, (cin, cout, stride) in enumerate(LAYERS):
        wgt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                          jnp.bfloat16)

        @jax.jit
        def f_lax(x, wgt, stride=stride):
            return jnp.sum(jax.lax.conv_general_dilated(
                x, wgt, window_strides=stride, padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")
            ).astype(jnp.float32))

        @jax.jit
        def f_mm(x, wgt, stride=stride):
            return jnp.sum(_conv3x3_matmul(x, wgt, stride).astype(jnp.float32))

        @jax.jit
        def f_next(x, wgt, stride=stride):
            return _conv3x3_matmul(x, wgt, stride)

        t_lax = timed(f_lax, x, wgt)
        t_mm = timed(f_mm, x, wgt)
        total_lax += t_lax
        total_mm += t_mm
        print(f"conv{i} [{B},{h},{w},{cin}]->{cout} s{stride}: "
              f"lax={t_lax:7.2f}ms  im2col={t_mm:7.2f}ms  "
              f"speedup={t_lax / max(t_mm, 1e-9):5.1f}x")
        x = f_next(x, wgt)
        h, w = x.shape[1], x.shape[2]

    print(f"stem total: lax={total_lax:.2f}ms  im2col={total_mm:.2f}ms")

    # Full flagship encode (trained ckpt if present).
    ckpt = REPO / "models" / "model.safetensors"
    if ckpt.exists():
        from kiri_tpu.config import CFG
        from kiri_tpu.models import recognizer as R
        from kiri_tpu.train.checkpoints import load_checkpoint

        variables, cfg, _ = load_checkpoint(str(ckpt))
        imgs = jnp.asarray(rng.integers(0, 255, (B, H, W), np.uint8))

        @jax.jit
        def enc(v, im):
            mem, _ = R.encode(v, im, cfg, train=False)
            return jnp.sum(mem.astype(jnp.float32))

        @jax.jit
        def stem_only(v, im):
            from kiri_tpu.ops.preprocess import normalize_u8

            x = normalize_u8(im, jnp.bfloat16)
            x = jnp.transpose(x, (0, 2, 3, 1))
            feat, _ = R.stem_forward(v["params"]["stem"],
                                     v["batch_stats"]["stem"], x, cfg)
            return jnp.sum(feat.astype(jnp.float32))

        t_enc = timed(enc, variables, imgs)
        t_stem = timed(stem_only, variables, imgs)
        print(f"flagship encode [B={B}]: {t_enc:.2f}ms "
              f"({B / t_enc * 1000:.0f} lines/s encode-only); "
              f"stem-only {t_stem:.2f}ms")


if __name__ == "__main__":
    main()
