"""Transformer building blocks as pure JAX functions over explicit param pytrees.

Design notes (TPU-first):

* Pure functions + explicit parameter dicts instead of stateful modules: the
  autoregressive decode loop runs inside ``lax.while_loop`` carrying the KV
  cache as a plain pytree — no mutable-collection machinery.
* All matmuls run in the configured compute dtype (bfloat16 by default, the
  MXU-native type) with float32 accumulation via ``preferred_element_type``.
* Attention uses one fused QKV projection per source, shaped so XLA tiles the
  [T, D] x [D, 3D] matmuls onto the MXU.

Semantics mirror torch ``nn.TransformerEncoderLayer`` /
``nn.TransformerDecoderLayer`` with ``norm_first=True, activation='gelu'``
(reference: kiri_ocr/model.py:247-292) so the numerics line up layer-for-layer.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# Initializers (torch-like fan-in uniform, adequate for from-scratch training)
# --------------------------------------------------------------------------
def _linear_init(rng, d_in: int, d_out: int, bias: bool = True) -> Params:
    kr, br = jax.random.split(rng)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": jax.random.uniform(kr, (d_in, d_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(br, (d_out,), jnp.float32, -bound, bound)
    return p


def _ln_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def _mha_init(rng, dim: int) -> Params:
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    # Fused qkv matches torch's in_proj_weight layout split into thirds.
    return {
        "wq": _linear_init(r1, dim, dim),
        "wk": _linear_init(r2, dim, dim),
        "wv": _linear_init(r3, dim, dim),
        "wo": _linear_init(r4, dim, dim),
    }


def _ffn_init(rng, dim: int, ff: int) -> Params:
    r1, r2 = jax.random.split(rng)
    return {"lin1": _linear_init(r1, dim, ff), "lin2": _linear_init(r2, ff, dim)}


def enc_layer_init(rng, dim: int, ff: int) -> Params:
    r1, r2 = jax.random.split(rng)
    return {
        "ln1": _ln_init(dim),
        "attn": _mha_init(r1, dim),
        "ln2": _ln_init(dim),
        "ffn": _ffn_init(r2, dim, ff),
    }


def dec_layer_init(rng, dim: int, ff: int) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "ln1": _ln_init(dim),
        "self_attn": _mha_init(r1, dim),
        "ln2": _ln_init(dim),
        "cross_attn": _mha_init(r2, dim),
        "ln3": _ln_init(dim),
        "ffn": _ffn_init(r3, dim, ff),
    }


# --------------------------------------------------------------------------
# Primitive ops
# --------------------------------------------------------------------------
def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # LN runs in f32 for numerical stability, output back in compute dtype.
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, t, h, hd = x.shape
    return x.reshape(b, t, h * hd)


def mha(p: Params, q_in: jnp.ndarray, kv_in: jnp.ndarray, n_heads: int,
        mask: Optional[jnp.ndarray] = None,
        dropout_rate: float = 0.0, rng=None) -> jnp.ndarray:
    """Full (non-cached) multi-head attention.

    mask: broadcastable to [B, heads, Tq, Tk]; True = *masked out* (torch
    convention for bool masks).
    """
    d = q_in.shape[-1]
    hd = d // n_heads
    q = _split_heads(dense(p["wq"], q_in), n_heads)
    k = _split_heads(dense(p["wk"], kv_in), n_heads)
    v = _split_heads(dense(p["wv"], kv_in), n_heads)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if mask is not None:
        scores = jnp.where(mask, -jnp.inf, scores)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, attn.shape)
        attn = attn * keep / (1.0 - dropout_rate)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
    return dense(p["wo"], _merge_heads(out.astype(q.dtype)))


def ffn(p: Params, x: jnp.ndarray, dropout_rate: float = 0.0, rng=None) -> jnp.ndarray:
    h = jax.nn.gelu(dense(p["lin1"], x), approximate=False)
    if dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, h.shape)
        h = h * keep / (1.0 - dropout_rate)
    return dense(p["lin2"], h)


def _maybe_dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    if rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        x = x * keep / (1.0 - rate)
    return x


# --------------------------------------------------------------------------
# Encoder / decoder layers (full-sequence)
# --------------------------------------------------------------------------
def encoder_layer(p: Params, x: jnp.ndarray, n_heads: int,
                  dropout_rate: float = 0.0, rng=None) -> jnp.ndarray:
    """Pre-norm GELU encoder layer (torch TransformerEncoderLayer parity)."""
    rngs = jax.random.split(rng, 4) if rng is not None else (None,) * 4
    h = mha(p["attn"], layer_norm(p["ln1"], x), layer_norm(p["ln1"], x), n_heads,
            dropout_rate=dropout_rate, rng=rngs[0])
    x = x + _maybe_dropout(h, dropout_rate, rngs[1])
    h = ffn(p["ffn"], layer_norm(p["ln2"], x), dropout_rate, rngs[2])
    x = x + _maybe_dropout(h, dropout_rate, rngs[3])
    return x


def decoder_layer(p: Params, x: jnp.ndarray, mem: jnp.ndarray, n_heads: int,
                  causal_mask: jnp.ndarray, dropout_rate: float = 0.0,
                  rng=None) -> jnp.ndarray:
    """Pre-norm decoder layer: self-attn -> cross-attn -> FFN."""
    rngs = jax.random.split(rng, 6) if rng is not None else (None,) * 6
    h = layer_norm(p["ln1"], x)
    h = mha(p["self_attn"], h, h, n_heads, mask=causal_mask,
            dropout_rate=dropout_rate, rng=rngs[0])
    x = x + _maybe_dropout(h, dropout_rate, rngs[1])
    h = mha(p["cross_attn"], layer_norm(p["ln2"], x), mem, n_heads,
            dropout_rate=dropout_rate, rng=rngs[2])
    x = x + _maybe_dropout(h, dropout_rate, rngs[3])
    h = ffn(p["ffn"], layer_norm(p["ln3"], x), dropout_rate, rngs[4])
    x = x + _maybe_dropout(h, dropout_rate, rngs[5])
    return x


# --------------------------------------------------------------------------
# KV-cached decoder step
# --------------------------------------------------------------------------
def precompute_cross_kv(p: Params, mem: jnp.ndarray, n_heads: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project encoder memory to cross-attention K/V once per sequence.

    The reference re-runs the full decoder (recomputing these) at every beam
    step (reference: kiri_ocr/model.py:459-479); caching them is one of the
    two big algorithmic wins of the TPU rebuild.
    """
    k = _split_heads(dense(p["cross_attn"]["wk"], mem), n_heads)
    v = _split_heads(dense(p["cross_attn"]["wv"], mem), n_heads)
    return k, v


def init_self_cache(n_layers: int, batch: int, max_len: int, n_heads: int,
                    head_dim: int, dtype) -> jnp.ndarray:
    """Self-attention KV cache as ONE array [L, B, Tmax, 2, H, hd]
    (slot 0 = K, slot 1 = V).

    A single tensor instead of a {k, v} dict halves the number of
    whole-cache-sized ops in the beam loop — the measured dominant cost of
    beam search on the v5e (trace r4: ~7 cache-sized ops x ~0.5 ms per
    step; the per-step DUS writes and the beam parent-permute gather each
    become one op instead of two)."""
    return jnp.zeros((n_layers, batch, max_len, 2, n_heads, head_dim), dtype)


def fuse_qkv(p_attn: Params) -> Params:
    """Concatenate an MHA block's q/k/v projections into one [D, 3D] linear.

    Per-column dot products are independent, so one fused matmul is
    numerically identical to the three separate ones while costing a single
    MXU dispatch per decode step instead of three — the step loop is
    op-count-bound, not FLOPs-bound, at these sizes.
    """
    fused = {"w": jnp.concatenate(
        [p_attn["wq"]["w"], p_attn["wk"]["w"], p_attn["wv"]["w"]], axis=1)}
    if "b" in p_attn["wq"]:
        fused["b"] = jnp.concatenate(
            [p_attn["wq"]["b"], p_attn["wk"]["b"], p_attn["wv"]["b"]])
    return fused


def decoder_step_layer(p: Params, x: jnp.ndarray, layer_idx: int,
                       cache: jnp.ndarray, pos: jnp.ndarray,
                       cross_k: jnp.ndarray, cross_v: jnp.ndarray,
                       n_heads: int, beams: int = 1,
                       fused_qkv: Optional[Params] = None,
                       anc: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One decoder layer for a single new position with KV cache.

    x:      [B, 1, D] current-token activations
    pos:    scalar int — write index into the cache (same for all rows)
    cache:  stacked per-layer K/V [L, B, Tmax, 2, H, hd] (init_self_cache)
    beams:  static beam count K. When >1, ``cross_k``/``cross_v`` are
            [B//K, T, H, hd] — shared across the K beams of each line
            instead of repeated K times, so each decode step reads the
            encoder memory K/V once per line rather than once per beam
            (the dominant HBM traffic of the beam loop).
    fused_qkv: optional precomputed [D, 3D] self-attention projection from
            ``fuse_qkv`` (pass from outside the decode loop).
    anc:    optional ancestry table [N, K, T_anc] (T_anc >= Tmax) for
            permute-free beam search: the KV cache rows are NEVER reordered
            by beam parent; instead anc[n, k, t] names the line-local row
            (0..K-1) whose slot t holds beam k's step-t K/V. Self-attention
            then computes scores/outputs against ALL K rows of the line
            (K x the attention FLOPs — negligible at these sizes) and
            selects per position with a one-hot ancestor mask, turning the
            per-step whole-cache permute (read+write) into a dense read.
            K is taken from anc.shape[1] (independent of ``beams``).
    """
    d = x.shape[-1]
    hd = d // n_heads
    b = x.shape[0]

    h = layer_norm(p["ln1"], x)
    if fused_qkv is not None:
        qkv = dense(fused_qkv, h)                                  # [B,1,3D]
        q, k_new, v_new = (_split_heads(t, n_heads)
                           for t in jnp.split(qkv, 3, axis=-1))
    else:
        q = _split_heads(dense(p["self_attn"]["wq"], h), n_heads)  # [B,1,H,hd]
        k_new = _split_heads(dense(p["self_attn"]["wk"], h), n_heads)
        v_new = _split_heads(dense(p["self_attn"]["wv"], h), n_heads)

    kv_new = jnp.stack([k_new, v_new], axis=2)       # [B, 1, 2, H, hd]
    cache = jax.lax.dynamic_update_slice(
        cache, kv_new[None].astype(cache.dtype), (layer_idx, 0, pos, 0, 0, 0))

    keys = cache[layer_idx, :, :, 0]   # [B, Tmax, H, hd]
    vals = cache[layer_idx, :, :, 1]
    t_max = keys.shape[1]

    if anc is not None:
        K = anc.shape[1]        # true beam count (independent of the
        nl = b // K             # cross-attn sharing switch ``beams``)
        qk = q.reshape(nl, K, n_heads, hd)
        kk = keys.reshape(nl, K, t_max, n_heads, hd).astype(q.dtype)
        vv = vals.reshape(nl, K, t_max, n_heads, hd).astype(q.dtype)
        # One-hot ancestor mask over the line's K physical rows. Slots
        # beyond ``pos`` are masked below regardless of their anc value.
        a = anc[:, :, :t_max]                                # [N, K, T]
        onehot = (a[:, :, None, :] ==
                  jnp.arange(K, dtype=a.dtype)[None, None, :, None])
        s_all = jnp.einsum("nkhd,njthd->nkjht", qk, kk,
                           preferred_element_type=jnp.float32) / math.sqrt(hd)
        # Selecting by summing (K-1) exact zeros keeps the true dot product
        # bit-for-bit (x + 0.0 == x in IEEE754).
        s = jnp.einsum("nkjht,nkjt->nkht", s_all,
                       onehot.astype(jnp.float32))
        key_pos = jnp.arange(t_max)[None, None, None, :]
        s = jnp.where(key_pos > pos, -jnp.inf, s)
        attn = jax.nn.softmax(s, axis=-1)                    # [N, K, H, T] f32
        pm = attn[:, :, None] * onehot[:, :, :, None].astype(jnp.float32)
        sa = jnp.einsum("nkjht,njthd->nkhd", pm.astype(q.dtype), vv,
                        preferred_element_type=jnp.float32).astype(q.dtype)
        sa = sa.reshape(b, 1, n_heads, hd)
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, keys.astype(q.dtype),
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        # Mask positions beyond the current one (cache slots not yet written).
        key_pos = jnp.arange(t_max)[None, None, None, :]
        scores = jnp.where(key_pos > pos, -jnp.inf, scores)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        sa = jnp.einsum("bhqk,bkhd->bqhd", attn, vals.astype(q.dtype),
                        preferred_element_type=jnp.float32).astype(q.dtype)
    x = x + dense(p["self_attn"]["wo"], _merge_heads(sa))

    # Cross attention against precomputed memory K/V.
    h = layer_norm(p["ln2"], x)
    q = _split_heads(dense(p["cross_attn"]["wq"], h), n_heads)
    if beams > 1:
        nl = b // beams
        qk = q.reshape(nl, beams, n_heads, hd)        # [N, K, H, hd]
        scores = jnp.einsum("nkhd,nthd->nkht", qk, cross_k.astype(q.dtype),
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        ca = jnp.einsum("nkht,nthd->nkhd", attn, cross_v.astype(q.dtype),
                        preferred_element_type=jnp.float32).astype(q.dtype)
        ca = ca.reshape(b, 1, n_heads, hd)
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, cross_k.astype(q.dtype),
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        ca = jnp.einsum("bhqk,bkhd->bqhd", attn, cross_v.astype(q.dtype),
                        preferred_element_type=jnp.float32).astype(q.dtype)
    x = x + dense(p["cross_attn"]["wo"], _merge_heads(ca))

    x = x + ffn(p["ffn"], layer_norm(p["ln3"], x))
    return x, cache


# --------------------------------------------------------------------------
# Sinusoidal positional encodings (reference parity)
# --------------------------------------------------------------------------
def sinusoid_table(length: int, dim: int) -> np.ndarray:
    """pe[pos, 0::2] = sin(pos*div), pe[pos, 1::2] = cos(pos*div)
    (reference: kiri_ocr/model.py:148-173)."""
    pos = np.arange(length, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * (-math.log(10000.0) / dim))
    pe = np.zeros((length, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def pos_enc_2d(h: int, w: int, c: int) -> np.ndarray:
    """2D sinusoidal table [h, w, c]: first half of channels encodes y, the
    second half encodes x (reference: kiri_ocr/model.py:176-208)."""
    num = c // 2
    if num == 0:
        return np.zeros((h, w, c), dtype=np.float32)
    pe_y = sinusoid_table(h, num)          # [h, num]
    pe_x = sinusoid_table(w, num)          # [w, num]
    out = np.zeros((h, w, c), dtype=np.float32)
    out[:, :, :num] = pe_y[:, None, :]
    out[:, :, num:2 * num] = pe_x[None, :, :]
    return out
