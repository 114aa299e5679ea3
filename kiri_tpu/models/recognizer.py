"""Kiri-TPU recognizer: CNN stem + Transformer encoder + CTC head +
autoregressive Transformer decoder with LM head.

Architecture parity with the reference ``KiriOCR`` module
(reference: kiri_ocr/model.py:211-307):

* ConvStem: 4x (3x3 conv, BatchNorm, SiLU) with strides (1,1),(2,2),(2,2),(2,1)
  and channels 1->48->96->160->ENC_DIM; net downsample H/8 x W/4, so a 48x640
  input yields a 6x160 feature map and a 160-frame memory sequence.
* 2D sinusoidal positional encoding (y-half ‖ x-half of channels), mean-pool
  over height, LayerNorm, pre-norm GELU Transformer encoder, LayerNorm.
* Heads: CTC (LN -> Dropout -> Linear), mem_proj (no bias), decoder embedding
  + 1D sinusoidal pos-enc + pre-norm Transformer decoder + LN + dec_head, and
  a parallel lm_head used only for log-prob fusion at decode time.

TPU-first differences from the reference implementation:

* NHWC conv layout (TPU-native), bfloat16 compute with f32 master weights.
* The decoder exposes a KV-cached single-step path (``decoder_step``) used by
  the ``lax.while_loop`` beam/greedy decoders — the reference re-runs the full
  prefix per step with no cache (kiri_ocr/model.py:459-479).
* Inputs are uint8; normalization happens on device (fused by XLA).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.preprocess import normalize_u8
from . import layers as L

Params = Dict[str, Any]


@jax.tree_util.register_static
class ModelMeta:
    """Static (non-traced) model metadata carried inside the variable tree."""

    def __init__(self, use_dec_pos_enc: bool = True):
        self.use_dec_pos_enc = bool(use_dec_pos_enc)

    def __hash__(self):
        return hash(self.use_dec_pos_enc)

    def __eq__(self, other):
        return (isinstance(other, ModelMeta)
                and self.use_dec_pos_enc == other.use_dec_pos_enc)


_STEM_CHANNELS = (48, 96, 160)  # final block goes to ENC_DIM
_STEM_STRIDES = ((1, 1), (2, 2), (2, 2), (2, 1))


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------
def _conv_init(rng, kh, kw, cin, cout) -> jnp.ndarray:
    fan_in = kh * kw * cin
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(rng, (kh, kw, cin, cout), jnp.float32, -bound, bound)


def _bn_init(c) -> Tuple[Params, Params]:
    return ({"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)},
            {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)})


def init_recognizer(rng, cfg, tok, use_dec_pos_enc: bool = True) -> Dict[str, Any]:
    """Create {"params", "batch_stats"} variable tree."""
    rngs = jax.random.split(rng, 24)
    it = iter(rngs)
    chans = list(_STEM_CHANNELS) + [cfg.ENC_DIM]
    params: Params = {"stem": {}}
    batch_stats: Params = {"stem": {}}
    cin = 1
    for i, cout in enumerate(chans):
        params["stem"][f"conv{i}"] = {"w": _conv_init(next(it), 3, 3, cin, cout)}
        bn_p, bn_s = _bn_init(cout)
        params["stem"][f"bn{i}"] = bn_p
        batch_stats["stem"][f"bn{i}"] = bn_s
        cin = cout

    params["enc_ln_in"] = L._ln_init(cfg.ENC_DIM)
    params["enc_layers"] = [
        L.enc_layer_init(next(it), cfg.ENC_DIM, cfg.ENC_FF) for _ in range(cfg.ENC_LAYERS)
    ]
    params["enc_ln"] = L._ln_init(cfg.ENC_DIM)

    if cfg.USE_CTC:
        params["ctc_head"] = {
            "ln": L._ln_init(cfg.ENC_DIM),
            "proj": L._linear_init(next(it), cfg.ENC_DIM, tok.ctc_classes),
        }

    params["mem_proj"] = L._linear_init(next(it), cfg.ENC_DIM, cfg.DEC_DIM, bias=False)
    emb_r = next(it)
    params["dec_emb"] = {
        "emb": jax.random.normal(emb_r, (tok.dec_vocab, cfg.DEC_DIM), jnp.float32)
    }
    params["dec_layers"] = [
        L.dec_layer_init(next(it), cfg.DEC_DIM, cfg.DEC_FF) for _ in range(cfg.DEC_LAYERS)
    ]
    params["dec_ln"] = L._ln_init(cfg.DEC_DIM)
    params["dec_head"] = L._linear_init(next(it), cfg.DEC_DIM, tok.dec_vocab)
    if cfg.USE_LM:
        params["lm_head"] = L._linear_init(next(it), cfg.DEC_DIM, tok.dec_vocab)

    return {"params": params, "batch_stats": batch_stats,
            "meta": ModelMeta(use_dec_pos_enc)}


def compute_dtype(cfg) -> jnp.dtype:
    return jnp.bfloat16 if cfg.COMPUTE_DTYPE == "bfloat16" else jnp.float32


# --------------------------------------------------------------------------
# Stem / encoder
# --------------------------------------------------------------------------
def _bn(p: Params, s: Params, x: jnp.ndarray, train: bool,
        momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm over NHWC. Returns (y, new_stats_or_None)."""
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = None
    inv = jax.lax.rsqrt(var + eps) * p["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + p["bias"]
    return y.astype(x.dtype), new_s


def _conv3x3_matmul(x: jnp.ndarray, w: jnp.ndarray,
                    stride: Tuple[int, int]) -> jnp.ndarray:
    """Exact 3x3 SAME conv (pad 1, any stride) as an im2col matmul.

    XLA's conv lowering runs off the MXU on this backend for the stem's
    small channel counts (measured round 2: conv0 at batch 128 took ~32 ms,
    0.03% of peak; convs 1-3 together ~35 ms of the 45 ms encode).
    Gathering the 9 taps into a [B,Ho,Wo,9*Cin] tensor and contracting
    against the [9*Cin, C_out] filter runs as one well-tiled matmul with an
    MXU-friendly K dimension (432/864/1440 for convs 1-3).

    x: [B, H, W, Cin]; w: [3, 3, Cin, Cout]. Tap order (dy, dx, cin) matches
    ``w.reshape(9*Cin, Cout)`` row order exactly.
    """
    b, h, wd, cin = x.shape
    sh, sw = stride
    ho = (h - 1) // sh + 1
    wo = (wd - 1) // sw + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        jax.lax.slice(
            xp, (0, dy, dx, 0),
            (b, dy + sh * (ho - 1) + 1, dx + sw * (wo - 1) + 1, cin),
            (1, sh, sw, 1))
        for dy in range(3) for dx in range(3)
    ]
    patches = (jnp.stack([t[..., 0] for t in taps], axis=-1) if cin == 1
               else jnp.concatenate(taps, axis=-1))    # [B, Ho, Wo, 9*Cin]
    # No preferred_element_type: the VJP would see mixed bf16/f32 operands;
    # XLA already accumulates bf16 matmuls in f32 on the MXU.
    return patches @ w.reshape(9 * cin, w.shape[-1]).astype(x.dtype)


def stem_forward(params: Params, stats: Params, x: jnp.ndarray, cfg,
                 train: bool = False, rng=None):
    """x: [B, H, W, 1] compute-dtype. Returns ([B, H/8, W/4, D], new_stats).

    Inference folds BatchNorm into the conv weights (exact: BN is affine
    per channel and conv is linear in w), so each layer is one fused
    conv+bias+SiLU with no f32 normalization pass between convs. Measured
    on the v5e (scripts/profile_stem2.py, batch 128): lax conv + folded BN
    6.4 ms for the whole stem vs 6.7 ms live-BN and 64-116 ms for im2col
    variants — XLA's native conv lowering wins in-context even for the
    C_in=1 first layer, contrary to the round-2 isolated-op measurements
    (those were dominated by per-dispatch floors and full-activation
    fetches over the tunnel). ``_conv3x3_matmul`` is kept as a tested,
    numerically-exact fallback formulation.
    """
    new_stats = {}
    for i, stride in enumerate(_STEM_STRIDES):
        w = params[f"conv{i}"]["w"]
        if not train:
            p, s = params[f"bn{i}"], stats[f"bn{i}"]
            inv = p["scale"] * jax.lax.rsqrt(s["var"] + 1e-5)
            w = w * inv[None, None, None, :]
            bias = (p["bias"] - s["mean"] * inv).astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=stride,
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if train:
            x, ns = _bn(params[f"bn{i}"], stats[f"bn{i}"], x, True)
            new_stats[f"bn{i}"] = ns
        else:
            x = x + bias
        x = jax.nn.silu(x)
    if train and rng is not None and cfg.DROPOUT > 0:
        # Dropout2d: drop whole channels (reference: kiri_ocr/model.py:227).
        keep = jax.random.bernoulli(rng, 1.0 - cfg.DROPOUT, (x.shape[0], 1, 1, x.shape[3]))
        x = x * keep / (1.0 - cfg.DROPOUT)
    return x, (new_stats if train else None)


def encode(variables: Dict[str, Any], images_u8: jnp.ndarray, cfg,
           train: bool = False, rng=None):
    """uint8 [B, H, W] (or [B,1,H,W]) -> memory [B, T, D].

    Mirrors reference ``KiriOCR.encode`` (kiri_ocr/model.py:299-307):
    stem -> 2D pos-enc -> height mean-pool -> LN -> encoder -> LN.
    Returns (mem, new_batch_stats_or_None).
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    dtype = compute_dtype(cfg)
    if images_u8.ndim == 4:  # [B,1,H,W] reference layout
        images_u8 = images_u8[:, 0]
    if images_u8.dtype == jnp.uint8:
        x = normalize_u8(images_u8, dtype)      # [B,1,H,W]
    else:  # already normalized to [-1, 1] (e.g. by the Pallas preprocess
        # kernel, kernels/resize.py)
        x = images_u8.astype(dtype)[:, None]
    x = jnp.transpose(x, (0, 2, 3, 1))          # NHWC

    rngs = jax.random.split(rng, 2 + cfg.ENC_LAYERS) if rng is not None else None
    feat, new_stats = stem_forward(params["stem"], stats["stem"], x, cfg, train,
                                   rngs[0] if rngs is not None else None)
    h, w = feat.shape[1], feat.shape[2]
    pe = jnp.asarray(L.pos_enc_2d(h, w, feat.shape[3]), dtype)
    feat = feat + pe[None]
    seq = jnp.mean(feat, axis=1)                # height pool -> [B, W', D]
    seq = L.layer_norm(params["enc_ln_in"], seq)
    drop = cfg.DROPOUT if train else 0.0
    for i, lp in enumerate(params["enc_layers"]):
        seq = L.encoder_layer(lp, seq, cfg.ENC_HEADS, drop,
                              rngs[2 + i] if rngs is not None else None)
    seq = L.layer_norm(params["enc_ln"], seq)
    return seq, ({"stem": new_stats} if train else None)


def ctc_logits(params: Params, mem: jnp.ndarray, cfg, train: bool = False,
               rng=None) -> jnp.ndarray:
    """CTC head: LN -> Dropout -> Linear, in f32 (logits feed log_softmax)."""
    h = L.layer_norm(params["ctc_head"]["ln"], mem)
    if train and rng is not None and cfg.DROPOUT > 0:
        keep = jax.random.bernoulli(rng, 1.0 - cfg.DROPOUT, h.shape)
        h = h * keep / (1.0 - cfg.DROPOUT)
    return L.dense(params["ctc_head"]["proj"], h).astype(jnp.float32)


def mem_project(params: Params, mem: jnp.ndarray) -> jnp.ndarray:
    return L.dense(params["mem_proj"], mem)


# --------------------------------------------------------------------------
# Decoder — teacher-forcing (training) path
# --------------------------------------------------------------------------
def decoder_train_logits(variables: Dict[str, Any], mem_proj: jnp.ndarray,
                         tgt_ids: jnp.ndarray, cfg, train: bool = False,
                         rng=None) -> jnp.ndarray:
    """Full-sequence decoder logits for teacher forcing.

    tgt_ids: [B, Ltgt] decoder-space ids (bos-prefixed, shifted input).
    Returns dec_head logits [B, Ltgt, V] in f32.
    """
    params = variables["params"]
    use_pe = variables["meta"].use_dec_pos_enc
    dtype = compute_dtype(cfg)
    b, lt = tgt_ids.shape
    x = params["dec_emb"]["emb"].astype(dtype)[tgt_ids]
    if use_pe:
        pe = jnp.asarray(L.sinusoid_table(lt, x.shape[-1]), dtype)
        x = x + pe[None]
    rngs = jax.random.split(rng, cfg.DEC_LAYERS + 1) if rng is not None else None
    if rngs is not None and cfg.DROPOUT > 0:
        keep = jax.random.bernoulli(rngs[-1], 1.0 - cfg.DROPOUT, x.shape)
        x = x * keep / (1.0 - cfg.DROPOUT)
    causal = jnp.triu(jnp.ones((lt, lt), bool), k=1)[None, None]
    drop = cfg.DROPOUT if train else 0.0
    mem = mem_proj.astype(dtype)
    for i, lp in enumerate(params["dec_layers"]):
        x = L.decoder_layer(lp, x, mem, cfg.DEC_HEADS, causal, drop,
                            rngs[i] if rngs is not None else None)
    x = L.layer_norm(params["dec_ln"], x)
    return L.dense(params["dec_head"], x).astype(jnp.float32)


def decoder_forward_heads(variables: Dict[str, Any], mem_proj: jnp.ndarray,
                          tgt_ids: jnp.ndarray, cfg
                          ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Eval-mode full-sequence decoder pass returning BOTH output heads.

    Used by the speculative (CTC-draft) decoder: one teacher-forced pass
    over a proposed sequence yields next-token logits at every position,
    verifying a whole suffix per dispatch instead of one KV-cached step per
    token. This is also the computation pattern of the reference, which
    re-runs the full prefix every step (kiri_ocr/model.py:459-479).

    tgt_ids: [B, L] decoder-space ids (bos-prefixed).
    Returns (dec_logits [B, L, V], lm_logits [B, L, V] or None), f32.
    """
    params = variables["params"]
    use_pe = variables["meta"].use_dec_pos_enc
    dtype = compute_dtype(cfg)
    b, lt = tgt_ids.shape
    x = params["dec_emb"]["emb"].astype(dtype)[tgt_ids]
    if use_pe:
        pe = jnp.asarray(L.sinusoid_table(lt, x.shape[-1]), dtype)
        x = x + pe[None]
    causal = jnp.triu(jnp.ones((lt, lt), bool), k=1)[None, None]
    mem = mem_proj.astype(dtype)
    for lp in params["dec_layers"]:
        x = L.decoder_layer(lp, x, mem, cfg.DEC_HEADS, causal)
    x = L.layer_norm(params["dec_ln"], x)
    use_lm = cfg.USE_LM and "lm_head" in params
    fused = fuse_output_heads(params) if use_lm else None
    if fused is not None:
        v = params["dec_head"]["w"].shape[1]
        both = L.dense(fused, x).astype(jnp.float32)
        return both[..., :v], both[..., v:]
    return L.dense(params["dec_head"], x).astype(jnp.float32), None


# --------------------------------------------------------------------------
# Decoder — KV-cached incremental path (inference)
# --------------------------------------------------------------------------
def decode_prepare(variables: Dict[str, Any], mem_proj: jnp.ndarray, cfg):
    """Precompute per-layer cross-attention K/V from encoder memory."""
    params = variables["params"]
    dtype = compute_dtype(cfg)
    mem = mem_proj.astype(dtype)
    cross = []
    for lp in params["dec_layers"]:
        ln_mem = mem  # cross-attn K/V projections act on raw memory (torch
        # TransformerDecoderLayer applies LN to the *query* side only).
        cross.append(L.precompute_cross_kv(lp, ln_mem, cfg.DEC_HEADS))
    return cross


def init_decode_cache(cfg, batch: int, max_len: int):
    dtype = compute_dtype(cfg)
    return L.init_self_cache(cfg.DEC_LAYERS, batch, max_len,
                             cfg.DEC_HEADS, cfg.DEC_DIM // cfg.DEC_HEADS, dtype)


def fuse_output_heads(params: Params) -> Optional[Params]:
    """Concatenate dec_head and lm_head into one [D, 2V] linear.

    The decode loop needs both logit sets every step; two separate [B,1,D] x
    [D,V] matmuls waste an MXU pass each on a tiny N — one fused matmul
    halves the per-step head cost. Returns None when there is no lm_head.
    """
    if "lm_head" not in params:
        return None
    dh, lh = params["dec_head"], params["lm_head"]
    fused = {"w": jnp.concatenate([dh["w"], lh["w"]], axis=1)}
    if "b" in dh:
        fused["b"] = jnp.concatenate([dh["b"], lh["b"]])
    return fused


def fuse_self_qkv(params: Params) -> List[Params]:
    """Per-layer fused self-attention q/k/v projections for the step loop
    (numerically identical; one matmul dispatch instead of three —
    layers.fuse_qkv). Build once outside the decode loop."""
    return [L.fuse_qkv(lp["self_attn"]) for lp in params["dec_layers"]]


def decoder_step(variables: Dict[str, Any], tok_ids: jnp.ndarray, pos,
                 cache, cross_kvs, cfg, beams: int = 1, fused_head=None,
                 fused_qkv=None, anc=None):
    """One AR step. tok_ids: [B] int32, pos: scalar int32 position index.

    beams: static K; when >1 the cross_kvs entries are per-line (B//K rows)
    and shared across beams (see layers.decoder_step_layer). fused_head: the
    precomputed [D, 2V] head from ``fuse_output_heads``; fused_qkv: the
    per-layer list from ``fuse_self_qkv`` — pass both from outside the
    decode loop so the concatenations aren't re-traced per step. anc: the
    optional [N, K, T] beam-ancestry table for permute-free beam search
    (layers.decoder_step_layer docstring).

    Returns (dec_logits [B, V] f32, lm_logits [B, V] f32 or None, cache).
    """
    params = variables["params"]
    use_pe = variables["meta"].use_dec_pos_enc
    dtype = compute_dtype(cfg)
    x = params["dec_emb"]["emb"].astype(dtype)[tok_ids][:, None]  # [B,1,D]
    if use_pe:
        table = jnp.asarray(L.sinusoid_table(cfg.MAX_DEC_LEN + 10, x.shape[-1]), dtype)
        x = x + jax.lax.dynamic_slice_in_dim(table, pos, 1, axis=0)[None]
    for i, lp in enumerate(params["dec_layers"]):
        ck, cv = cross_kvs[i]
        x, cache = L.decoder_step_layer(
            lp, x, i, cache, pos, ck, cv, cfg.DEC_HEADS, beams,
            fused_qkv=None if fused_qkv is None else fused_qkv[i], anc=anc)
    x = L.layer_norm(params["dec_ln"], x)
    use_lm = cfg.USE_LM and "lm_head" in params
    if use_lm and fused_head is not None:
        v = params["dec_head"]["w"].shape[1]
        both = L.dense(fused_head, x)[:, 0].astype(jnp.float32)
        dec_logits, lm_logits = both[:, :v], both[:, v:]
    else:
        dec_logits = L.dense(params["dec_head"], x)[:, 0].astype(jnp.float32)
        lm_logits = (L.dense(params["lm_head"], x)[:, 0].astype(jnp.float32)
                     if use_lm else None)
    return dec_logits, lm_logits, cache


def num_params(variables: Dict[str, Any]) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


class KiriOCR:
    """Object-style facade over the functional recognizer, for users of the
    reference's model class (kiri_ocr/model.py:235-307: ``KiriOCR(cfg, tok)``
    with ``.encode(images)``). The TPU-native compute lives in the pure
    functions above; this wrapper just carries (variables, cfg, tok) and
    jit-compiles the encoder on first use.
    """

    def __init__(self, cfg, tok, use_dec_pos_enc: bool = True,
                 variables: Optional[Dict[str, Any]] = None, seed: int = 0):
        self.cfg = cfg
        self.tok = tok
        self.use_dec_pos_enc = use_dec_pos_enc
        self.variables = variables if variables is not None else init_recognizer(
            jax.random.PRNGKey(seed), cfg, tok, use_dec_pos_enc)
        self._encode_jit = None

    @classmethod
    def from_checkpoint(cls, path: str, cfg=None, vocab_path: Optional[str] = None):
        """Load weights (torch-named safetensors / legacy .pt) + config."""
        from ..tokenizer import CharTokenizer
        from ..train.checkpoints import find_vocab_file, load_checkpoint

        variables, cfg, meta = load_checkpoint(path, cfg)
        vp = vocab_path or find_vocab_file(meta.get("vocab_path", ""), path)
        if not vp:
            raise FileNotFoundError(f"No vocab file found near {path}")
        tok = CharTokenizer(vp, cfg)
        return cls(cfg, tok, variables=variables)

    def encode(self, images_u8) -> jnp.ndarray:
        """uint8 [B, H, W] -> encoder memory [B, T, D]."""
        if self._encode_jit is None:
            from functools import partial

            self._encode_jit = jax.jit(partial(
                lambda v, x, cfg: encode(v, x, cfg, train=False)[0], cfg=self.cfg))
        return self._encode_jit(self.variables, images_u8)

    def ctc_logits(self, mem: jnp.ndarray) -> jnp.ndarray:
        return ctc_logits(self.variables["params"], mem, self.cfg)

    def mem_project(self, mem: jnp.ndarray) -> jnp.ndarray:
        return mem_project(self.variables["params"], mem)

    def num_params(self) -> int:
        return num_params(self.variables)
