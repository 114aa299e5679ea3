"""Roofline measurement of the fast (encode+CTC) path on the real TPU.

VERDICT r3 asked for evidence, not analytics: is the fast path actually
HBM-bandwidth-bound? This measures
  1. the chip's *achievable* HBM bandwidth with copy/triad microbenchmarks,
  2. the encode program's XLA cost analysis (bytes accessed, flops), and
  3. steady-state wall time of the same program (pipelined dispatches),
then reports achieved GB/s and TFLOP/s as fractions of the measured peaks.

Usage: python scripts/profile_roofline.py  (serialize with other TPU jobs!)
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

from kiri_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

BATCH = 128


def _time_steady(fn, *args, reps=20, fetch=None):
    """Steady-state seconds/call: enqueue reps dispatches back-to-back and
    fetch the last result. On this axon backend block_until_ready does NOT
    force execution — timings must device_get (same caveat as bench.py).
    fetch: optional fn(out) -> small array to pull instead of the full out.
    """
    out = fn(*args)
    jax.device_get(out if fetch is None else fetch(out))
    t0 = time.perf_counter()
    pend = None
    for _ in range(reps):
        pend = fn(*args)
    jax.device_get(pend if fetch is None else fetch(pend))
    return (time.perf_counter() - t0) / reps


def measure_hbm_peak():
    """Achievable HBM GB/s: big-array copy and triad, best of each."""
    n = 256 * 1024 * 1024 // 4  # 256 MB per array, f32
    x = jnp.arange(n, dtype=jnp.float32)
    y = jnp.ones((n,), jnp.float32)

    copy = jax.jit(lambda a: a * 1.000001)          # read n + write n
    triad = jax.jit(lambda a, b: a + 1.5 * b)       # read 2n + write n

    # Fetch only a tiny slice: the slice depends on the full output buffer,
    # so the kernel still executes, but the tunnel moves ~1 KB instead of
    # 256 MB (a full device_get here is transfer-dominated and reads
    # ~0.2 GB/s — the first run of this probe made exactly that mistake).
    tiny = lambda out: out[:256]
    t_copy = _time_steady(copy, x, reps=10, fetch=tiny)
    t_triad = _time_steady(triad, x, y, reps=10, fetch=tiny)
    bw_copy = 2 * n * 4 / t_copy / 1e9
    bw_triad = 3 * n * 4 / t_triad / 1e9
    print(f"HBM copy  : {bw_copy:7.1f} GB/s  ({t_copy*1e3:.2f} ms / 512 MB moved)")
    print(f"HBM triad : {bw_triad:7.1f} GB/s  ({t_triad*1e3:.2f} ms / 768 MB moved)")
    return max(bw_copy, bw_triad)


def main():
    print(f"devices: {jax.devices()}")
    bw_peak = measure_hbm_peak()

    from kiri_tpu.engine import RecognizerEngine
    from kiri_tpu.tokenizer import CharTokenizer
    from kiri_tpu.train.checkpoints import load_checkpoint

    variables, cfg, _ = load_checkpoint(str(REPO / "models/model.safetensors"))
    tok = CharTokenizer(str(REPO / "models/vocab.json"), cfg)
    engine = RecognizerEngine(variables, cfg, tok)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (BATCH, cfg.IMG_H, cfg.IMG_W), np.uint8)
    imgs_d = jax.device_put(imgs)

    # Cost analysis of the exact fast-path program.
    lowered = engine._encode_jit.lower(engine.variables, imgs_d)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))
    print(f"\nencode+CTC program (batch {BATCH}, {cfg.IMG_H}x{cfg.IMG_W}):")
    print(f"  XLA cost analysis: {flops/1e9:.2f} GFLOP, "
          f"{bytes_acc/1e6:.1f} MB accessed")
    for k in sorted(ca):
        if k.startswith("bytes accessed") and k != "bytes accessed":
            print(f"    {k}: {ca[k]/1e6:.1f} MB")

    # Fetch only the [N] conf vector — forces the whole program (conf
    # depends on the CTC logits) without pulling the [N,T,D] memory over
    # the tunnel.
    dt = _time_steady(lambda v, im: engine._encode_jit(v, im),
                      engine.variables, imgs_d, reps=30,
                      fetch=lambda out: out[4])
    lps = BATCH / dt
    print(f"\n  steady-state: {dt*1e3:.2f} ms/batch = {lps:,.0f} lines/s")
    print(f"  achieved HBM : {bytes_acc/dt/1e9:7.1f} GB/s "
          f"= {bytes_acc/dt/1e9/bw_peak*100:.0f}% of measured peak "
          f"({bw_peak:.0f} GB/s)")
    print(f"  achieved MXU : {flops/dt/1e12:7.2f} TFLOP/s "
          f"(v5e bf16 peak ~197 TF -> {flops/dt/1e12/197*100:.1f}% MFU)")


if __name__ == "__main__":
    main()
