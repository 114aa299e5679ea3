"""CRAFT text-detection network in pure JAX.

Capability parity with the reference CRAFT (kiri_ocr/detector/craft/
model.py:29-188: torchvision VGG16-BN backbone sliced into 5 stages with
dilated fc6/7, U-Net upconv decoder, 2-channel head -> region + affinity
score maps at half input resolution).

This implementation is first-party and trained from scratch (the reference
depends on torchvision pretrained weights, unavailable offline): a VGG-style
conv backbone at strides 2/4/8/16 with a dilated context block, U-Net
skip-fusion decoder, and the same 2-map half-resolution output contract.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_ENC = ((32, 2), (64, 2), (128, 3), (256, 3))  # (channels, convs) per stage
_CTX_CH = 256
_DEC_CH = (128, 64, 32)


def _conv_init(rng, kh, kw, cin, cout):
    std = math.sqrt(2.0 / (kh * kw * cin))
    return jax.random.normal(rng, (kh, kw, cin, cout), jnp.float32) * std


def _gn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def init_craft_net(rng) -> Dict[str, Any]:
    rngs = iter(jax.random.split(rng, 128))
    params: Params = {}

    def conv_bn(name, kh, kw, cin, cout):
        params[name] = {"w": _conv_init(next(rngs), kh, kw, cin, cout),
                        "gn": _gn_init(cout)}

    cin = 1
    for si, (c, convs) in enumerate(_ENC):
        for ci in range(convs):
            conv_bn(f"e{si}c{ci}", 3, 3, cin, c)
            cin = c
    # Dilated context (fc6/7 analogue).
    conv_bn("ctx1", 3, 3, cin, _CTX_CH)   # dilation 2 applied in forward
    conv_bn("ctx2", 1, 1, _CTX_CH, _CTX_CH)
    # Decoder: upsample + concat skip + double conv. Skips consumed from the
    # deepest stage down: stage3 (256 @ s8), stage2 (128 @ s4), stage1 (64 @ s2).
    skip_ch = [c for c, _ in _ENC[1:]][::-1]  # 256, 128, 64
    dcin = _CTX_CH
    for di, (dc, sc) in enumerate(zip(_DEC_CH, skip_ch)):
        conv_bn(f"d{di}c1", 3, 3, dcin + sc, dc)
        conv_bn(f"d{di}c2", 3, 3, dc, dc)
        dcin = dc
    # Head: 2 maps (region, affinity) at the final decoder scale (stride 2).
    params["head"] = {"w": _conv_init(next(rngs), 1, 1, dcin, 2),
                      "b": jnp.zeros((2,), jnp.float32)}
    return {"params": params, "batch_stats": {}}


def _gn_apply(p, x, groups: int = 8, eps: float = 1e-5):
    """GroupNorm (batch-independent; see detect/db/net.py rationale)."""
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
        x, w.astype(x.dtype), (stride, stride), "SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _maxpool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "SAME")


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


def craft_forward(variables: Dict[str, Any], images: jnp.ndarray,
                  train: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, Any]:
    """images [B, H, W, 1] normalized float, H/W divisible by 16.

    Returns (region [B, H/2, W/2], affinity [B, H/2, W/2], None) —
    raw logits; apply sigmoid for scores (reference craft/model.py:276-278).
    """
    params = variables["params"]

    def cbr(name, x, dilation=1):
        y = _conv(x, params[name]["w"], dilation=dilation)
        return jax.nn.relu(_gn_apply(params[name]["gn"], y))

    x = images
    skips = []
    for si, (c, convs) in enumerate(_ENC):
        for ci in range(convs):
            x = cbr(f"e{si}c{ci}", x)
        skips.append(x)
        x = _maxpool2(x)

    x = cbr("ctx1", x, dilation=2)
    x = cbr("ctx2", x)

    for di in range(len(_DEC_CH)):
        x = _upsample2(x)
        skip = skips[-(di + 1)]
        # Crop/pad to matching spatial dims (SAME pooling may mismatch by 1).
        sh = min(x.shape[1], skip.shape[1])
        sw = min(x.shape[2], skip.shape[2])
        x = jnp.concatenate([x[:, :sh, :sw], skip[:, :sh, :sw]], axis=-1)
        x = cbr(f"d{di}c1", x)
        x = cbr(f"d{di}c2", x)

    head = _conv(x, params["head"]["w"]) + params["head"]["b"].astype(x.dtype)
    head = head.astype(jnp.float32)
    return head[..., 0], head[..., 1], None


def num_params(variables) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
