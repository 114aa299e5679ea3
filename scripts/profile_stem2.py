"""Stem profiling round 2: dispatch-floor-free timings via in-jit repetition.

Each variant runs REPS times inside one compiled program (lax.fori_loop with
a data dependency), so per-dispatch overhead and the tunnel RTT are
amortized away; only a scalar crosses the link.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from kiri_tpu.models.recognizer import (_STEM_STRIDES, _conv3x3_matmul,
                                        _bn, compute_dtype)
from kiri_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

B, H, W = 128, 48, 640
REPS = 10


def timed_once(fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) * 1000


def loop_time(body, x0, label):
    """body: x -> scalar contribution; repeated REPS times inside one jit."""

    @jax.jit
    def run(x):
        def step(i, acc):
            return acc + body(x + acc * 0)  # data dep blocks CSE
        return jax.lax.fori_loop(0, REPS, step, jnp.float32(0))

    t = timed_once(run, x0)
    print(f"{label:52s} {t / REPS:7.2f} ms/iter  ({t:.1f} total)")
    return t / REPS


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # Dispatch floor: trivial scalar op, one dispatch.
    @jax.jit
    def nop(x):
        return jnp.sum(x[:2, :2])

    x_small = jnp.ones((4, 4))
    nop(x_small)
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(nop(x_small))
    print(f"sync dispatch+fetch floor: {(time.perf_counter()-t0)/10*1000:.2f} ms")

    imgs = jnp.asarray(rng.integers(0, 255, (B, H, W), np.uint8))

    from kiri_tpu.train.checkpoints import load_checkpoint

    variables, cfg, _ = load_checkpoint(str(REPO / "models/model.safetensors"))
    params = variables["params"]["stem"]
    stats = variables["batch_stats"]["stem"]
    dtype = compute_dtype(cfg)

    def norm_in(im):
        x = (im.astype(dtype) / 255.0 - 0.5) / 0.5
        return x[..., None]  # NHWC [B,48,640,1]

    # --- full current stem (im2col + live BN) ---
    def stem_im2col(im):
        x = norm_in(im)
        for i, stride in enumerate(_STEM_STRIDES):
            w = params[f"conv{i}"]["w"].astype(x.dtype)
            x = _conv3x3_matmul(x, w, stride)
            x, _ = _bn(params[f"bn{i}"], stats[f"bn{i}"], x, False)
            x = jax.nn.silu(x)
        return jnp.sum(x.astype(jnp.float32))

    # --- lax conv + live BN ---
    def stem_lax(im):
        x = norm_in(im)
        for i, stride in enumerate(_STEM_STRIDES):
            w = params[f"conv{i}"]["w"].astype(x.dtype)
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=stride, padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x, _ = _bn(params[f"bn{i}"], stats[f"bn{i}"], x, False)
            x = jax.nn.silu(x)
        return jnp.sum(x.astype(jnp.float32))

    # --- BN folded into conv weights (inference identity) ---
    def folded(i):
        w = params[f"conv{i}"]["w"]
        p, s = params[f"bn{i}"], stats[f"bn{i}"]
        inv = p["scale"] / jnp.sqrt(s["var"] + 1e-5)
        return (w * inv[None, None, None, :],
                p["bias"] - s["mean"] * inv)

    fw = [folded(i) for i in range(4)]

    def stem_folded_im2col(im):
        x = norm_in(im)
        for i, stride in enumerate(_STEM_STRIDES):
            w, b = fw[i]
            x = _conv3x3_matmul(x, w.astype(x.dtype), stride)
            x = jax.nn.silu(x + b.astype(x.dtype))
        return jnp.sum(x.astype(jnp.float32))

    def stem_folded_lax(im):
        x = norm_in(im)
        for i, stride in enumerate(_STEM_STRIDES):
            w, b = fw[i]
            x = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), window_strides=stride,
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.silu(x + b.astype(x.dtype))
        return jnp.sum(x.astype(jnp.float32))

    # --- folded, mixed: lax for multi-channel convs, im2col conv0 ---
    def stem_folded_mixed(im):
        x = norm_in(im)
        for i, stride in enumerate(_STEM_STRIDES):
            w, b = fw[i]
            if i == 0:
                x = _conv3x3_matmul(x, w.astype(x.dtype), stride)
            else:
                x = jax.lax.conv_general_dilated(
                    x, w.astype(x.dtype), window_strides=stride,
                    padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.silu(x + b.astype(x.dtype))
        return jnp.sum(x.astype(jnp.float32))

    loop_time(stem_im2col, imgs, "stem im2col + live BN (current)")
    loop_time(stem_lax, imgs, "stem lax conv + live BN")
    loop_time(stem_folded_im2col, imgs, "stem im2col, BN folded")
    loop_time(stem_folded_lax, imgs, "stem lax conv, BN folded")
    loop_time(stem_folded_mixed, imgs, "stem mixed (im2col c0 + lax c123), BN folded")

    # encoder remainder for context
    from kiri_tpu.models import recognizer as R

    def enc_full(im):
        mem, _ = R.encode(variables, im, cfg, train=False)
        return jnp.sum(mem.astype(jnp.float32))

    loop_time(enc_full, imgs, "full encode (current code)")


if __name__ == "__main__":
    main()
