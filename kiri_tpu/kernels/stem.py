"""Pallas TPU kernel: the recognizer's 4-conv stem as ONE fused kernel.

The stem (reference spec: kiri_ocr/model.py:211-231 — 3x3 convs, channels
1->48->96->160->ENC_DIM, strides (1,1),(2,2),(2,2),(2,1), BN+SiLU) is the
hot half of the encoder: run as four XLA convs it round-trips every
intermediate activation through HBM (conv0's output alone is ~3 MB/image;
measured encode = ~11.6 ms at batch 128 with ~4.4 GB touched, ~6.4 ms of
it stem). This kernel keeps ALL intermediates in VMEM: per grid step it
reads one normalized image strip and writes final [6, W/4, D] features.

Mosaic constraints shaped the formulation (probed on the v5e):

* no strided slicing and no sublane-splitting reshapes -> all W-stride-2
  downsampling is POLYPHASE: the input arrives pre-split (by XLA) into the
  four mod-4 column phases, conv0 produces per-phase outputs, conv1
  produces mod-2 phases, conv2/conv3 consume them — every in-kernel tap is
  a unit-stride slice of a phase array. H-stride-2 uses leading-dim
  reshape splits (supported).
* no lane-dim concat/stack of offset slices -> im2col K-packing is done by
  WRITING taps into lane ranges of a VMEM scratch ref (realigns layout),
  then one [.., 3*Cin] @ [3*Cin, Cout] dot per dy tap row.
* conv0 (Cin=1) runs in f32: minor-dim inserts are 32-bit-only, and its
  taps pass through a 2D realign scratch before an aligned [..., None].

True-boundary semantics: conv SAME padding means zeros at the image edge.
Interior tile margins use real recomputed values, and per-stage column
masks zero everything outside the image so tile edges match the XLA convs
exactly. BatchNorm is folded into the weights outside (exact).

The pure-JAX twin is ``models.recognizer.stem_forward`` (same math via XLA
convs); tests compare the kernel against it in interpret mode and on
hardware.

MEASURED DEAD END (v5e, 2026-08-18, batch 128 x 48x640 bf16) — kept as
validated experimental code, NOT wired into the encode path:

    XLA conv stem (BN-folded)      6.2-9.9 ms
    this kernel  w_tiles=1        25.7 ms   (correct: max bf16 dev 0.03 @ scale 7.9)
    this kernel  w_tiles=2        37.5 ms
    this kernel  w_tiles=4        39.4 ms

Why the wall: Mosaic (this backend's version) rejects strided slicing,
sublane-splitting reshapes, lane concats of offset slices, and 16-bit
minor-dim inserts — every im2col tap therefore needs a layout-realign copy
through a scratch ref (36 copies/conv0-tile, 9 lane-range writes per conv
per tile), and those serialized VPU relayouts cost far more than the HBM
round-trips the fusion saves (~4.4 GB -> ~70 MB). The dots themselves are
also latency-bound at one-image-per-grid-step M sizes (2-8k rows). The
scoped-vmem default (16 MB) also had to be raised to 100 MB for the
unrolled tile bodies. A future Mosaic with native strided relayouts (or a
conv primitive) could revisit; until then the XLA conv lowering (with BN
folding + width bucketing, models/recognizer.stem_forward) is the measured
winner and remains the default.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def fold_stem_weights(stem_params, stem_stats, dtype=jnp.bfloat16):
    """BN-fold the stem's conv weights/biases for the fused kernel.

    Returns (w0 [9, C0] f32, b0 [C0] f32, then per conv i in 1..3:
    wi [3, 3*Cin, Cout] dtype, bi [Cout] f32). w0 taps are dy-major,
    dx-minor; wi rows are (dx, cin) to match lane-range packing order.
    """
    out = []
    for i in range(4):
        w = stem_params[f"conv{i}"]["w"]
        p, s = stem_params[f"bn{i}"], stem_stats[f"bn{i}"]
        inv = p["scale"] * jax.lax.rsqrt(s["var"] + 1e-5)
        w = w * inv[None, None, None, :]
        b = (p["bias"] - s["mean"] * inv).astype(jnp.float32)
        if i == 0:
            out += [w.reshape(9, -1).astype(jnp.float32), b]
        else:
            out += [w.reshape(3, 3 * w.shape[2], w.shape[3]).astype(dtype), b]
    return tuple(out)


def _row_phases(x):
    """[H, W, C] (H even) -> (even rows, odd rows), each [H/2, W, C]."""
    h = x.shape[0]
    r = x.reshape(h // 2, 2, *x.shape[1:])
    return r[:, 0], r[:, 1]


def _hpad_rows(x):
    """Zero-pad H by 1 top/bottom and return the row phases of the result."""
    xp = jnp.pad(x, ((1, 1),) + ((0, 0),) * (x.ndim - 1))
    return _row_phases(xp)


def _dy_rows(even, odd, dy: int, ho: int):
    """Rows 2i+dy (i < ho) of the H-padded input, from its row phases."""
    if dy == 0:
        return even[0:ho]
    if dy == 1:
        return odd[0:ho]
    return even[1: ho + 1]


def _mask_cols(x, g0: int, valid: int):
    """Zero columns whose GLOBAL index (g0 + local) falls outside
    [0, valid) — the true-image-boundary zeros of conv SAME padding."""
    gj = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + g0
    return jnp.where((gj >= 0) & (gj < valid), x, jnp.zeros_like(x))


def _stem_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 w3_ref, b3_ref, out_ref, s2d, s0, s1, s2, s3,
                 *, h: int, w: int, t: int, w_tiles: int, dtype):
    """One grid step = one image. W is tiled by a PYTHON loop (static
    offsets — Mosaic forbids dynamic lane indexing), each tile computing
    output columns [t0, t0+t) at W/4 scale with recomputed halo margins.

    x_ref: [1, 4, H, Wp4] — mod-4 column phases of the zero-padded
           normalized image; phase array index j = global phase col j-4
           (4 phase cols of left padding), so tile slices start at t0.
    """
    wq = w // 4                       # final feature width (W/4)
    c0 = w0_ref.shape[1]
    c1 = w1_ref.shape[2]
    c2 = w2_ref.shape[2]
    w0 = w0_ref[...]
    b0 = b0_ref[...]
    w0h = t + 4                       # h0 cols [t0-3, t1+1)
    # scratch widths are tile-rounded (dot's [A, B, K]->[A*B, K] reshape
    # needs B to be a sublane multiple); extra columns are sliced away.
    w0r = s0.shape[1]
    w1r = s1.shape[1]
    w2r = s2.shape[1]
    w3r = s3.shape[1]

    for u in range(w_tiles):
        t0 = u * t

        # ---- conv0 (f32): per-phase [Hw, 9] @ [9, C0] ----------------------
        h0p = []
        for k in range(4):
            for dy in range(3):
                for dx in range(3):
                    p = (k + dx - 1) % 4
                    off = (k + dx - 1) // 4
                    # local col start into the padded phases = t0+1+off
                    tap = x_ref[0, p, :, t0 + 1 + off: t0 + 1 + off + w0h]
                    s2d[:, :w0h] = tap.astype(jnp.float32)  # realign layout
                    # H tap: rows r+dy-1 of the zero-H-padded image ==
                    # shift rows by (dy-1) with zero fill.
                    v = s2d[...]  # padded width; s0 write is full-width too
                    if dy == 0:
                        v = jnp.pad(v[: h - 1], ((1, 0), (0, 0)))
                    elif dy == 2:
                        v = jnp.pad(v[1:], ((0, 1), (0, 0)))
                    s0[:, :, 3 * dy + dx: 3 * dy + dx + 1] = v[..., None]
            acc = jnp.dot(s0[...], w0,
                          preferred_element_type=jnp.float32)[:, :w0h]
            acc = jax.nn.silu(acc + b0)
            # valid h0 cols of phase k: 4j+k in [0, w)
            gj = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1) + (t0 - 3)
            acc = jnp.where((gj * 4 + k >= 0) & (gj * 4 + k < w), acc, 0.0)
            h0p.append(acc.astype(dtype))               # [H, t+4, C0]

        # ---- conv1: mod-4 phases -> mod-2 output phases --------------------
        h2_, w1h = h // 2, t + 3      # h1 phase cols [t0-2, t1+1)
        h0r = [_hpad_rows(a) for a in h0p]              # row phases of each
        h1p = []
        for q in range(2):
            acc = None
            for dy in range(3):
                for dx in range(3):
                    p = (2 * q + dx - 1) % 4
                    off = (2 * q + dx - 1) // 4         # -1 or 0
                    rows = _dy_rows(*h0r[p], dy, h2_)   # [H/2, t+4, C0]
                    s1[:, : w1h, c0 * dx: c0 * dx + c0] = \
                        rows[:, 1 + off: 1 + off + w1h]
                part = jnp.dot(s1[...], w1_ref[dy],
                               preferred_element_type=jnp.float32)[:, :w1h]
                acc = part if acc is None else acc + part
            acc = jax.nn.silu(acc + b1_ref[...])
            # valid h1 col 2j+q in [0, W/2) -> phase col j in [0, W/4)
            acc = _mask_cols(acc, t0 - 2, wq)
            h1p.append(acc.astype(dtype))               # [H/2, t+3, C1]

        # ---- conv2: mod-2 phases -> single-phase [H/4, t+2, C2] ------------
        h4, w2h = h // 4, t + 2       # h2 cols [t0-1, t1+1)
        h1r = [_hpad_rows(a) for a in h1p]
        acc = None
        for dy in range(3):
            for dx in range(3):
                p = (dx - 1) % 2                        # O2, E2, O2
                off = (dx - 1) // 2                     # -1, 0, 0
                rows = _dy_rows(*h1r[p], dy, h4)
                s2[:, : w2h, c1 * dx: c1 * dx + c1] = \
                    rows[:, 1 + off: 1 + off + w2h]
            part = jnp.dot(s2[...], w2_ref[dy],
                           preferred_element_type=jnp.float32)[:, :w2h]
            acc = part if acc is None else acc + part
        acc = jax.nn.silu(acc + b2_ref[...])
        h2v = _mask_cols(acc, t0 - 1, wq).astype(dtype)  # [H/4, t+2, C2]

        # ---- conv3: stride (2, 1) -> [H/8, t, D] ---------------------------
        h8 = h // 8
        h2r = _hpad_rows(h2v)
        acc = None
        for dy in range(3):
            rows = _dy_rows(*h2r, dy, h8)               # [H/8, t+2, C2]
            for dx in range(3):
                # h2v local col l = global - (t0-1); out col t0+i needs
                # global t0+i+dx-1 -> l = i+dx
                s3[:, : t, c2 * dx: c2 * dx + c2] = rows[:, dx: dx + t]
            part = jnp.dot(s3[...], w3_ref[dy],
                           preferred_element_type=jnp.float32)[:, :t]
            acc = part if acc is None else acc + part
        out_ref[0, :, t0: t0 + t, :] = \
            jax.nn.silu(acc + b3_ref[...]).astype(dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "w_tiles"))
def stem_fused_tpu(x_norm: jnp.ndarray, folded: Tuple,
                   interpret: bool = False, w_tiles: int = 2) -> jnp.ndarray:
    """x_norm: [B, H, W] normalized compute-dtype. Returns [B, H/8, W/4, D].

    folded: tuple from ``fold_stem_weights``. Grid = (B, w_tiles); per step
    everything (conv0..conv3) stays in VMEM (~10 MB at 48x640, w_tiles=2).
    """
    b, h, w = x_norm.shape
    d = folded[-2].shape[-1]
    r8 = lambda v: -(-v // 8) * 8
    r16 = lambda v: -(-v // 16) * 16
    wq = w // 4
    t = wq // w_tiles
    assert wq % w_tiles == 0 and w % 4 == 0 and h % 8 == 0
    # mod-4 column phases of the zero-padded image: 4 phase cols of pad on
    # the left, 2+ on the right (tile halo reach is [t0-4, t1+2)).
    xp = jnp.pad(x_norm, ((0, 0), (0, 0), (16, 8)))
    phases = jnp.transpose(
        xp.reshape(b, h, (w + 24) // 4, 4), (0, 3, 1, 2))  # [B, 4, H, Wp4]

    kernel = functools.partial(_stem_kernel, h=h, w=w, t=t,
                               w_tiles=w_tiles, dtype=x_norm.dtype)
    wspecs = [pl.BlockSpec(f.shape, functools.partial(
        lambda nd, *_: (0,) * nd, f.ndim)) for f in folded]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 4, h, phases.shape[-1]),
                               lambda i: (i, 0, 0, 0))] + wspecs,
        out_specs=pl.BlockSpec((1, h // 8, wq, d), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h // 8, wq, d), x_norm.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, r8(t + 4)), jnp.float32),         # s2d realign
            pltpu.VMEM((h, r8(t + 4), 9), jnp.float32),      # s0 conv0 K
            pltpu.VMEM((h // 2, r16(t + 3), folded[2].shape[1]),
                       x_norm.dtype),                        # s1
            pltpu.VMEM((h // 4, r16(t + 2), folded[4].shape[1]),
                       x_norm.dtype),                        # s2
            pltpu.VMEM((h // 8, r16(t), folded[6].shape[1]),
                       x_norm.dtype),                        # s3
        ],
        # The default scoped-vmem budget is 16 MB; the v5e has 128 MB of
        # physical VMEM and this kernel's unrolled tile bodies want more
        # stack than the default (Mosaic's stack allocator is conservative
        # across the unrolled taps).
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)),
        interpret=interpret,
    )(phases, *folded)


def stem_available() -> bool:
    return _HAS_PALLAS
