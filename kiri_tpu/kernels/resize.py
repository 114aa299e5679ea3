"""Pallas TPU kernel: fused line-crop preprocessing.

Replaces the reference's per-line host preprocessing (PIL resize + pad +
normalize, kiri_ocr/model.py:311-339 + core.py:489-528) with one device
kernel over the whole batch of detected lines:

    invert-if-dark  ->  aspect-preserving bilinear resize to height H
                    ->  left-aligned pad/crop to width W (gray 128)
                    ->  normalize to [-1, 1]

TPU-first formulation: bilinear resize is expressed as TWO MATMULS
(out = R_y @ img @ C_x) where R_y [H, Hmax] and C_x [Wmax, W] are per-line
interpolation matrices built on the fly from iota arithmetic — no gathers,
both contractions run on the MXU. Per-line (h, w) sizes arrive via scalar
prefetch so the grid program can size its matrices before the body runs.

A pure-JAX reference implementation (same math, vmap over lines) backs the
kernel for CPU tests and serves as the interpret-mode oracle.
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


def _resample_weights(src, pos, src_len, out_len, dtype=jnp.float32,
                      allow_cubic=True):
    """Per-element resampling weights for the interpolation matrices.

    Triangle (bilinear) weights when downscaling-or-equal; Keys cubic
    (a = -0.5, cv2's INTER_CUBIC kernel) when upscaling — small crops
    scaled UP to model height keep crisper strokes under cubic (measured:
    mixed-script 22 px line CER 0.0168 -> 0.0089 on the host path; this
    keeps the device resize in step). Both are plain weight matrices, so
    the resize stays two MXU matmuls either way.
    """
    d = jnp.abs(src - pos)
    tri = jnp.maximum(0.0, 1.0 - d)
    a = -0.5
    cub1 = ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0
    cub2 = a * (((d - 5.0) * d + 8.0) * d - 4.0)
    cubic = jnp.where(d <= 1.0, cub1, jnp.where(d < 2.0, cub2, 0.0))
    upscale = (src_len.astype(dtype) < out_len) & allow_cubic
    return jnp.where(upscale, cubic, tri)


def _interp_matrix(out_len: int, src_len, max_src: int, dtype=jnp.float32,
                   allow_cubic=True):
    """Interpolation matrix M [out_len, max_src]:
    out[i] = sum_s M[i, s] * src[s], resampling src_len -> out_len with
    the (i + 0.5) * scale - 0.5 convention (cv2/PIL)."""
    scale = src_len.astype(dtype) / out_len
    dst = jax.lax.broadcasted_iota(dtype, (out_len, max_src), 0)
    src = jax.lax.broadcasted_iota(dtype, (out_len, max_src), 1)
    pos = (dst + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, src_len.astype(dtype) - 1.0)
    w = _resample_weights(src, pos, src_len, out_len, dtype, allow_cubic)
    # Valid source columns only (beyond src_len contribute nothing).
    w = jnp.where(src < src_len.astype(dtype), w, 0.0)
    # Rows re-normalized so edge clamping keeps unit mass (the guard keys
    # off |sum| — cubic rows can legitimately sum below 1 near edges but
    # never near 0).
    s = jnp.sum(w, axis=1, keepdims=True)
    return w / jnp.where(jnp.abs(s) < 1e-6, 1.0, s)


# ---------------------------------------------------------------------------
# Pure-JAX reference (vmap over lines) — also the CPU fallback.
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def preprocess_lines_ref(crops_u8: jnp.ndarray, sizes: jnp.ndarray,
                         out_h: int, out_w: int,
                         linear_mask=None) -> jnp.ndarray:
    """crops_u8 [N, Hmax, Wmax] u8 (top-left valid region per sizes [N, 2]
    = (h, w)); returns normalized f32 [N, out_h, out_w]. ``linear_mask``
    [N] bool forces triangle (linear) upscale weights per line — used for
    noisy crops whose noise a cubic upscale would crisp back."""
    if linear_mask is None:
        linear_mask = jnp.zeros((crops_u8.shape[0],), bool)

    def one(crop, size, lin):
        h, w = size[0], size[1]
        img = crop.astype(jnp.float32)
        # Mean over the valid region; invert when dark (core.py:524-526).
        hmax, wmax = img.shape
        ys = jax.lax.broadcasted_iota(jnp.int32, (hmax, wmax), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (hmax, wmax), 1)
        valid = (ys < h) & (xs < w)
        mean = jnp.sum(jnp.where(valid, img, 0.0)) / jnp.maximum(1, h * w)
        img = jnp.where(mean < 127.0, 255.0 - img, img)

        # Output content width nw = round(w * out_h / h), clipped to out_w.
        nw = jnp.clip(jnp.round(w * out_h / jnp.maximum(1, h)), 1,
                      out_w).astype(jnp.int32)
        ry = _interp_matrix(out_h, h, hmax, allow_cubic=~lin)  # [H, Hmax]
        resized_rows = jnp.dot(ry, img,
                               preferred_element_type=jnp.float32)
        # Column matrix maps w -> out_w but only the first nw columns are
        # content; build with per-column target width nw.
        scale = w.astype(jnp.float32) / nw
        dst = jax.lax.broadcasted_iota(jnp.float32, (out_w, wmax), 0)
        src = jax.lax.broadcasted_iota(jnp.float32, (out_w, wmax), 1)
        pos = (dst + 0.5) * scale - 0.5
        pos = jnp.clip(pos, 0.0, w.astype(jnp.float32) - 1.0)
        cw = _resample_weights(src, pos, w, nw, allow_cubic=~lin)
        cw = jnp.where(src < w.astype(jnp.float32), cw, 0.0)
        s = jnp.sum(cw, axis=1, keepdims=True)
        cw = cw / jnp.where(jnp.abs(s) < 1e-6, 1.0, s)
        out = jnp.dot(resized_rows, cw.T,
                      preferred_element_type=jnp.float32)   # [H, out_w]
        # Cubic lobes can overshoot the u8 range; clamp like the host path.
        out = jnp.clip(out, 0.0, 255.0)
        # Pad region (x >= nw) takes gray 128.
        xs_out = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1)
        out = jnp.where(xs_out < nw, out, 128.0)
        return (out / 255.0 - 0.5) / 0.5

    return jax.vmap(one)(crops_u8, sizes, linear_mask)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------
def _preprocess_kernel(sizes_ref, crop_ref, out_ref, *, out_h: int,
                       out_w: int, hmax: int, wmax: int):
    i = pl.program_id(0)
    h = sizes_ref[i, 0]
    w = sizes_ref[i, 1]
    allow_cubic = sizes_ref[i, 2] == 0

    # Mosaic has no direct u8 -> f32 cast; hop through int32.
    img = crop_ref[...].astype(jnp.int32).astype(jnp.float32)  # [Hmax, Wmax]

    ys = jax.lax.broadcasted_iota(jnp.int32, (hmax, wmax), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (hmax, wmax), 1)
    valid = (ys < h) & (xs < w)
    mean = jnp.sum(jnp.where(valid, img, 0.0)) / jnp.maximum(1, h * w).astype(jnp.float32)
    img = jnp.where(mean < 127.0, 255.0 - img, img)

    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    nw = jnp.clip(jnp.round(wf * out_h / jnp.maximum(1.0, hf)), 1.0,
                  float(out_w))

    # Row interpolation matrix [out_h, Hmax].
    scale_y = hf / out_h
    dsty = jax.lax.broadcasted_iota(jnp.int32, (out_h, hmax), 0).astype(jnp.float32)
    srcy = jax.lax.broadcasted_iota(jnp.int32, (out_h, hmax), 1).astype(jnp.float32)
    posy = jnp.clip((dsty + 0.5) * scale_y - 0.5, 0.0, hf - 1.0)
    ry = _resample_weights(srcy, posy, h, out_h, allow_cubic=allow_cubic)
    ry = jnp.where(srcy < hf, ry, 0.0)
    sy = jnp.sum(ry, axis=1, keepdims=True)
    ry = ry / jnp.where(jnp.abs(sy) < 1e-6, 1.0, sy)

    rows = jnp.dot(ry, img, preferred_element_type=jnp.float32)  # [H, Wmax]

    # Column matrix [Wmax, out_w] transposed-build to keep lanes on out_w.
    scale_x = wf / nw
    dstx = jax.lax.broadcasted_iota(jnp.int32, (wmax, out_w), 1).astype(jnp.float32)
    srcx = jax.lax.broadcasted_iota(jnp.int32, (wmax, out_w), 0).astype(jnp.float32)
    posx = jnp.clip((dstx + 0.5) * scale_x - 0.5, 0.0, wf - 1.0)
    cx = _resample_weights(srcx, posx, w, nw, allow_cubic=allow_cubic)
    cx = jnp.where(srcx < wf, cx, 0.0)
    sx = jnp.sum(cx, axis=0, keepdims=True)
    cx = cx / jnp.where(jnp.abs(sx) < 1e-6, 1.0, sx)

    out = jnp.dot(rows, cx, preferred_element_type=jnp.float32)  # [H, out_w]
    # Cubic lobes can overshoot the u8 range; clamp like the host path.
    out = jnp.clip(out, 0.0, 255.0)
    xs_out = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1).astype(jnp.float32)
    out = jnp.where(xs_out < nw, out, 128.0)
    out_ref[...] = (out / 255.0 - 0.5) / 0.5


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "interpret"))
def preprocess_lines_tpu(crops_u8: jnp.ndarray, sizes: jnp.ndarray,
                         out_h: int, out_w: int,
                         interpret: bool = False,
                         linear_mask=None) -> jnp.ndarray:
    """Pallas version of ``preprocess_lines_ref`` (grid over lines).
    ``linear_mask`` rides along as a third scalar-prefetch column."""
    if not _HAS_PALLAS:
        return preprocess_lines_ref(crops_u8, sizes, out_h, out_w,
                                    linear_mask)
    n, hmax, wmax = crops_u8.shape
    kernel = functools.partial(_preprocess_kernel, out_h=out_h, out_w=out_w,
                               hmax=hmax, wmax=wmax)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, hmax, wmax), lambda i, s: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, out_h, out_w), lambda i, s: (i, 0, 0)),
    )

    def body(sizes_ref, crop_ref, out_ref):
        kernel(sizes_ref, crop_ref.at[0], out_ref.at[0])

    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w), jnp.float32),
        interpret=interpret,
    )(_sizes_with_mask(sizes, linear_mask, n), crops_u8)


def _sizes_with_mask(sizes, linear_mask, n):
    """[N,2] (h,w) + per-line linear flag -> [N,3] scalar-prefetch array."""
    lin = (jnp.zeros((n, 1), jnp.int32) if linear_mask is None
           else jnp.asarray(linear_mask).astype(jnp.int32)[:, None])
    return jnp.concatenate([sizes.astype(jnp.int32), lin], axis=1)


def preprocess_lines(crops_u8, sizes, out_h: int, out_w: int,
                     linear_mask=None):
    """Backend dispatcher: Pallas kernel on TPU, pure-JAX twin elsewhere
    (Pallas only supports interpret mode on the CPU backend)."""
    backend = jax.default_backend()
    if _HAS_PALLAS and backend not in ("cpu",):
        return preprocess_lines_tpu(crops_u8, sizes, out_h, out_w,
                                    linear_mask=linear_mask)
    return preprocess_lines_ref(crops_u8, sizes, out_h, out_w, linear_mask)


@jax.jit
def post_blur_masked(norm, mask):
    """Sigma-0.8 separable gaussian on masked rows of a normalized
    [N, H, W] batch — the device half of the small-noisy-crop policy:
    LINEAR-upscale (via linear_mask) then denoise at model scale."""
    x = jnp.arange(-2, 3, dtype=norm.dtype)
    k = jnp.exp(-x * x / (2 * 0.8 ** 2))
    k = k / k.sum()
    p = jnp.pad(norm, ((0, 0), (2, 2), (0, 0)), mode="edge")
    g = sum(k[i] * p[:, i: i + norm.shape[1]] for i in range(5))
    p = jnp.pad(g, ((0, 0), (0, 0), (2, 2)), mode="edge")
    g = sum(k[i] * p[:, :, i: i + norm.shape[2]] for i in range(5))
    return jnp.where(mask[:, None, None], g, norm)


def enhance_lines(crops_u8: jnp.ndarray, sizes: jnp.ndarray,
                  sharpen=False) -> jnp.ndarray:
    """Device-side twin of ``ops/preprocess.enhance_crop`` (pure XLA).

    ``sharpen`` is a bool or a per-line bool array [N] — pooled multi-page
    batches pass per-crop deskew provenance so only resampled pages'
    crops get the unsharp repair.

    Same adaptive policy — strict salt-and-pepper despike, noise-gated
    gaussian blur (height >= 36), provenance-driven unsharp, percentile
    contrast stretch — expressed batch-wide so `preprocess='device'`
    pipelines keep enhancement on-chip instead of a host detour. Numerical
    deltas vs the host version: spikes are replaced by the 8-neighbor MEAN
    (median of 8 needs a per-pixel sort the TPU doesn't want; over an
    all-opposite neighborhood both land on background), the noise sigma is
    estimated from mean-filter residuals (scale 1.398 calibrates it to the
    host's median-filter 1.4826 estimate), and percentiles are
    nearest-order-statistic. Runs before ``preprocess_lines``; u8 in/out.

    Returns ``(crops, small_noisy)``: small noisy crops cannot be blurred at
    native scale (glyph destruction) — the caller resizes them to model
    height with LINEAR weights (``preprocess_lines(..., linear_mask=...)``,
    cubic would crisp the noise back) and blurs after the resize
    (``post_blur``), mirroring the host enhance_crop's upscale-then-denoise.
    """
    n = crops_u8.shape[0]
    mask = jnp.broadcast_to(jnp.asarray(sharpen, bool), (n,))
    return _enhance_lines_jit(crops_u8, sizes, mask)


@jax.jit
def _enhance_lines_jit(crops_u8, sizes, sharpen_mask):
    def one(crop, size, do_sharpen):
        h, w = size[0], size[1]
        hmax, wmax = crop.shape
        ys = jax.lax.broadcasted_iota(jnp.int32, (hmax, wmax), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (hmax, wmax), 1)
        valid = (ys < h) & (xs < w)
        hw = jnp.maximum(1, h * w)
        # Edge-replicate the valid region over the whole padded buffer so
        # every neighborhood op sees 'edge' padding semantics.
        f = crop.astype(jnp.float32)[jnp.clip(ys, 0, h - 1),
                                     jnp.clip(xs, 0, w - 1)]

        pad = jnp.pad(f, 1, mode="edge")
        nbrs = jnp.stack([pad[dy: dy + hmax, dx: dx + wmax]
                          for dy in (0, 1, 2) for dx in (0, 1, 2)
                          if not (dy == 1 and dx == 1)])
        nmin, nmax = nbrs.min(0), nbrs.max(0)
        nmean = nbrs.mean(0)
        spikes = (((f <= 10.0) & (nmin >= 160.0))
                  | ((f >= 245.0) & (nmax <= 95.0)))
        f = jnp.where(spikes, nmean, f)

        # Robust noise sigma from mean-filter residuals over the valid
        # region (order statistic at 50%; invalid pixels sort to the top).
        resid = jnp.abs(f - (nmean * 8.0 + f) / 9.0)
        resid = jnp.where(valid, resid, jnp.inf).ravel()
        resid = jnp.sort(resid)
        sigma = resid[(hw - 1) // 2] * 1.398

        # 5-tap separable gaussian, sigma 0.8 (same taps as _gauss08).
        x = jnp.arange(-2, 3, dtype=jnp.float32)
        k = jnp.exp(-x * x / (2 * 0.8 ** 2))
        k = k / k.sum()
        pv = jnp.pad(f, ((2, 2), (0, 0)), mode="edge")
        g = sum(k[i] * pv[i: i + hmax] for i in range(5))
        ph = jnp.pad(g, ((0, 0), (2, 2)), mode="edge")
        g = sum(k[i] * ph[:, i: i + wmax] for i in range(5))

        noisy = sigma > 2.5
        small_noisy = noisy & (h < 36)
        f = jnp.where(noisy & (h >= 36), g, f)
        f = jnp.where(do_sharpen & ~noisy,
                      jnp.clip(f + 1.4 * (f - g), 0.0, 255.0), f)

        # Percentile stretch (p1/p99 as nearest order statistics).
        vals = jnp.sort(jnp.where(valid, f, jnp.inf).ravel())
        lo = vals[((hw - 1) * 1 + 50) // 100]
        hi = vals[((hw - 1) * 99 + 50) // 100]
        rng = hi - lo
        # hi < 240 restricts the stretch to genuinely compressed captures
        # (see ops/preprocess.enhance_crop).
        do = (hi < 240.0) & (rng > 1.0) & (rng < 200.0)
        f = jnp.where(do, (f - lo) / jnp.where(do, rng, 1.0) * 255.0, f)
        out = jnp.clip(jnp.round(f), 0.0, 255.0).astype(jnp.uint8)
        return jnp.where(valid, out, crop), small_noisy

    return jax.vmap(one)(crops_u8, sizes.astype(jnp.int32), sharpen_mask)


def pack_crops(crops, pad_multiple: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side packing: list of variable [h, w] u8 arrays -> padded
    [N, Hmax, Wmax] buffer + sizes [N, 2]. Hmax/Wmax round up to
    ``pad_multiple`` to bound the number of compiled kernel shapes."""
    n = len(crops)
    hmax = max(c.shape[0] for c in crops)
    wmax = max(c.shape[1] for c in crops)
    rnd = lambda v: int(np.ceil(v / pad_multiple) * pad_multiple)
    hmax, wmax = rnd(hmax), rnd(wmax)
    buf = np.zeros((n, hmax, wmax), np.uint8)
    sizes = np.zeros((n, 2), np.int32)
    for i, c in enumerate(crops):
        buf[i, : c.shape[0], : c.shape[1]] = c
        sizes[i] = c.shape[:2]
    return buf, sizes
