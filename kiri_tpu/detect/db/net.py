"""DB (Differentiable Binarization) text-detection network in pure JAX.

Equivalent capability to the reference's ONNX PP-OCR DB model
(reference: kiri_ocr/detector/db/model.py:113-116,451 — inference-only via
ONNX Runtime). Here the network is first-party and trainable:

* compact residual backbone, features at strides 4/8/16/32 (NHWC, bf16-ready)
* FPN top-down fusion to stride 4 with concat of all pyramid levels
* DB head: probability map + threshold map at full resolution via two
  stride-2 transposed convs; binary map b = sigmoid(k*(p - t)) at train time

All ops map onto MXU-friendly convs; the whole forward jits to one XLA
program per input-shape bucket.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# (channels, blocks, stride) per stage; stem downsamples 2x first.
_STAGES = ((32, 2, 2), (64, 2, 2), (128, 2, 2), (256, 2, 2))
_FPN_CH = 64


def _conv_init(rng, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(rng, (kh, kw, cin, cout), jnp.float32) * std


def _gn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def init_db_net(rng) -> Dict[str, Any]:
    rngs = iter(jax.random.split(rng, 128))
    params: Params = {}

    def conv_bn(name, kh, kw, cin, cout):
        params[name] = {"w": _conv_init(next(rngs), kh, kw, cin, cout),
                        "gn": _gn_init(cout)}

    conv_bn("stem", 3, 3, 1, 16)
    cin = 16
    for si, (c, blocks, stride) in enumerate(_STAGES):
        for bi in range(blocks):
            pre = f"s{si}b{bi}"
            conv_bn(f"{pre}_c1", 3, 3, cin, c)
            conv_bn(f"{pre}_c2", 3, 3, c, c)
            if cin != c:
                conv_bn(f"{pre}_sc", 1, 1, cin, c)
            cin = c
    # FPN laterals + smooth
    for si, (c, _, _) in enumerate(_STAGES):
        params[f"lat{si}"] = {"w": _conv_init(next(rngs), 1, 1, c, _FPN_CH)}
        params[f"smooth{si}"] = {"w": _conv_init(next(rngs), 3, 3, _FPN_CH, _FPN_CH)}
    # Heads: prob and thresh, each conv3x3 -> deconv2 -> deconv2 -> 1ch
    for head in ("prob", "thresh"):
        conv_bn(f"{head}_c1", 3, 3, 4 * _FPN_CH, _FPN_CH)
        params[f"{head}_d1"] = {"w": _conv_init(next(rngs), 2, 2, _FPN_CH, _FPN_CH),
                                "b": jnp.zeros((_FPN_CH,), jnp.float32),
                                "gn": _gn_init(_FPN_CH)}
        params[f"{head}_d2"] = {"w": _conv_init(next(rngs), 2, 2, _FPN_CH, 1),
                                "b": jnp.zeros((1,), jnp.float32)}
    return {"params": params, "batch_stats": {}}


def _gn_apply(p, x, groups: int = 8, eps: float = 1e-5):
    """GroupNorm over NHWC: batch-independent, so train == eval numerics
    (BatchNorm here learned to exploit per-batch statistics — running-stat
    EMAs never matched any individual batch and eval collapsed)."""
    b, h, w, c = x.shape
    g = min(groups, c)
    while c % g != 0:
        g -= 1
    xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _conv(x, w, stride=1, dilation=1):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding="SAME", rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _deconv2(x, w, b):
    y = jax.lax.conv_transpose(
        x, w.astype(x.dtype), strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(x.dtype)


def db_forward(variables: Dict[str, Any], images: jnp.ndarray,
               train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, Any]:
    """images: [B, H, W, 1] normalized float (H, W divisible by 32).

    Returns (prob_map [B, H, W], thresh_map [B, H, W], None) — GroupNorm
    carries no running state, so train and eval are numerically identical.
    """
    params = variables["params"]

    def conv_bn_relu(name, x, stride=1):
        y = _conv(x, params[name]["w"], stride)
        return jax.nn.relu(_gn_apply(params[name]["gn"], y))

    x = conv_bn_relu("stem", images, stride=2)
    feats: List[jnp.ndarray] = []
    for si, (c, blocks, stride) in enumerate(_STAGES):
        for bi in range(blocks):
            pre = f"s{si}b{bi}"
            st = stride if bi == 0 else 1
            y = conv_bn_relu(f"{pre}_c1", x, stride=st)
            y2 = _conv(y, params[f"{pre}_c2"]["w"])
            y2 = _gn_apply(params[f"{pre}_c2"]["gn"], y2)
            if f"{pre}_sc" in params:
                sc = _conv(x, params[f"{pre}_sc"]["w"], stride=st)
                sc = _gn_apply(params[f"{pre}_sc"]["gn"], sc)
            else:
                sc = x if st == 1 else _avgpool(x, st)
            x = jax.nn.relu(y2 + sc)
        feats.append(x)

    # FPN top-down
    lats = [_conv(f, params[f"lat{si}"]["w"]) for si, f in enumerate(feats)]
    for si in range(len(lats) - 2, -1, -1):
        up = _upsample2(lats[si + 1])
        lats[si] = lats[si] + up
    smooth = [_conv(l, params[f"smooth{si}"]["w"])
              for si, l in enumerate(lats)]
    # Upsample all to stride-4 and concat.
    base = smooth[0]
    cat = [base]
    for si in range(1, len(smooth)):
        u = smooth[si]
        for _ in range(si):
            u = _upsample2(u)
        cat.append(u)
    fused = jnp.concatenate(cat, axis=-1)  # [B, H/4, W/4, 4*FPN]

    outs = {}
    for head in ("prob", "thresh"):
        h = conv_bn_relu(f"{head}_c1", fused)
        h = _deconv2(h, params[f"{head}_d1"]["w"], params[f"{head}_d1"]["b"])
        h = jax.nn.relu(_gn_apply(params[f"{head}_d1"]["gn"], h))
        h = _deconv2(h, params[f"{head}_d2"]["w"], params[f"{head}_d2"]["b"])
        outs[head] = jax.nn.sigmoid(h[..., 0].astype(jnp.float32))

    return outs["prob"], outs["thresh"], None


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


def _avgpool(x, stride):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, stride, stride, 1), (1, stride, stride, 1),
        "SAME") / (stride * stride)


def num_params(variables) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
