"""Bidirectional weight conversion: reference torch state-dict <-> Kiri-TPU
parameter pytree.

The reference persists checkpoints as safetensors with torch module names
(kiri_ocr/training.py:1003-1062); this module maps those keys onto our
functional param tree so

* checkpoints trained with the reference PyTorch code load directly, and
* checkpoints trained here can be exported for the reference loader
  (kiri_ocr/core.py:296-403), including legacy metadata-less files whose
  architecture is inferred from tensor shapes.

Layout notes: torch convs are OIHW -> ours HWIO; torch Linear stores
[out, in] -> ours [in, out]; torch MultiheadAttention fuses q/k/v into
``in_proj_weight`` [3D, D] -> split into thirds.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

_STEM_TORCH_IDX = {0: 0, 1: 3, 2: 6, 3: 9}  # conv i -> stem.net.<idx>


def _lin_from_torch(sd, prefix):
    p = {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"]
    return p


def _ln_from_torch(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _mha_from_torch(sd, prefix):
    w = sd[f"{prefix}.in_proj_weight"]  # [3D, D]
    b = sd.get(f"{prefix}.in_proj_bias")
    d = w.shape[1]
    wq, wk, wv = w[:d], w[d:2 * d], w[2 * d:]
    out = {
        "wq": {"w": np.ascontiguousarray(wq.T)},
        "wk": {"w": np.ascontiguousarray(wk.T)},
        "wv": {"w": np.ascontiguousarray(wv.T)},
        "wo": _lin_from_torch(sd, f"{prefix}.out_proj"),
    }
    if b is not None:
        out["wq"]["b"], out["wk"]["b"], out["wv"]["b"] = b[:d], b[d:2 * d], b[2 * d:]
    return out


def from_torch_state_dict(sd: Dict[str, np.ndarray], cfg) -> Tuple[Dict[str, Any], bool]:
    """Torch-named numpy state dict -> (params_and_stats, use_dec_pos_enc)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {"stem": {}}
    stats: Dict[str, Any] = {"stem": {}}

    for i, ti in _STEM_TORCH_IDX.items():
        w = sd[f"stem.net.{ti}.weight"]  # [O, I, kh, kw]
        params["stem"][f"conv{i}"] = {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
        bn = f"stem.net.{ti + 1}"
        params["stem"][f"bn{i}"] = {"scale": sd[f"{bn}.weight"], "bias": sd[f"{bn}.bias"]}
        stats["stem"][f"bn{i}"] = {"mean": sd[f"{bn}.running_mean"],
                                   "var": sd[f"{bn}.running_var"]}

    params["enc_ln_in"] = _ln_from_torch(sd, "enc_ln_in")
    params["enc_layers"] = []
    i = 0
    while f"enc.layers.{i}.norm1.weight" in sd:
        pre = f"enc.layers.{i}"
        params["enc_layers"].append({
            "ln1": _ln_from_torch(sd, f"{pre}.norm1"),
            "attn": _mha_from_torch(sd, f"{pre}.self_attn"),
            "ln2": _ln_from_torch(sd, f"{pre}.norm2"),
            "ffn": {"lin1": _lin_from_torch(sd, f"{pre}.linear1"),
                    "lin2": _lin_from_torch(sd, f"{pre}.linear2")},
        })
        i += 1
    params["enc_ln"] = _ln_from_torch(sd, "enc_ln")

    if "ctc_head.0.weight" in sd:
        params["ctc_head"] = {"ln": _ln_from_torch(sd, "ctc_head.0"),
                              "proj": _lin_from_torch(sd, "ctc_head.2")}

    params["mem_proj"] = _lin_from_torch(sd, "mem_proj")
    params["dec_emb"] = {"emb": sd["dec_emb.weight"]}
    params["dec_layers"] = []
    i = 0
    while f"dec.layers.{i}.norm1.weight" in sd:
        pre = f"dec.layers.{i}"
        params["dec_layers"].append({
            "ln1": _ln_from_torch(sd, f"{pre}.norm1"),
            "self_attn": _mha_from_torch(sd, f"{pre}.self_attn"),
            "ln2": _ln_from_torch(sd, f"{pre}.norm2"),
            "cross_attn": _mha_from_torch(sd, f"{pre}.multihead_attn"),
            "ln3": _ln_from_torch(sd, f"{pre}.norm3"),
            "ffn": {"lin1": _lin_from_torch(sd, f"{pre}.linear1"),
                    "lin2": _lin_from_torch(sd, f"{pre}.linear2")},
        })
        i += 1
    params["dec_ln"] = _ln_from_torch(sd, "dec_ln")
    params["dec_head"] = _lin_from_torch(sd, "dec_head")
    if "lm_head.weight" in sd:
        params["lm_head"] = _lin_from_torch(sd, "lm_head")

    use_dec_pos_enc = any("dec_pos_enc" in k for k in sd)
    return {"params": params, "batch_stats": stats}, use_dec_pos_enc


def _lin_to_torch(out, prefix, p):
    out[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
    if "b" in p:
        out[f"{prefix}.bias"] = np.asarray(p["b"])


def _ln_to_torch(out, prefix, p):
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _mha_to_torch(out, prefix, p):
    wq, wk, wv = (np.asarray(p[k]["w"]).T for k in ("wq", "wk", "wv"))
    out[f"{prefix}.in_proj_weight"] = np.ascontiguousarray(
        np.concatenate([wq, wk, wv], axis=0))
    if "b" in p["wq"]:
        out[f"{prefix}.in_proj_bias"] = np.concatenate(
            [np.asarray(p[k]["b"]) for k in ("wq", "wk", "wv")])
    _lin_to_torch(out, f"{prefix}.out_proj", p["wo"])


def to_torch_state_dict(variables: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    """Kiri-TPU variable tree -> torch-named numpy state dict (f32)."""
    import jax

    params = jax.tree.map(lambda x: np.asarray(x, dtype=np.float32),
                          variables["params"])
    stats = jax.tree.map(lambda x: np.asarray(x, dtype=np.float32),
                         variables["batch_stats"])
    out: Dict[str, np.ndarray] = {}

    for i, ti in _STEM_TORCH_IDX.items():
        w = params["stem"][f"conv{i}"]["w"]  # HWIO
        out[f"stem.net.{ti}.weight"] = np.ascontiguousarray(w.transpose(3, 2, 0, 1))
        bn_p = params["stem"][f"bn{i}"]
        bn_s = stats["stem"][f"bn{i}"]
        pre = f"stem.net.{ti + 1}"
        out[f"{pre}.weight"] = bn_p["scale"]
        out[f"{pre}.bias"] = bn_p["bias"]
        out[f"{pre}.running_mean"] = bn_s["mean"]
        out[f"{pre}.running_var"] = bn_s["var"]
        out[f"{pre}.num_batches_tracked"] = np.asarray(0, np.int64)

    _ln_to_torch(out, "enc_ln_in", params["enc_ln_in"])
    for i, lp in enumerate(params["enc_layers"]):
        pre = f"enc.layers.{i}"
        _ln_to_torch(out, f"{pre}.norm1", lp["ln1"])
        _mha_to_torch(out, f"{pre}.self_attn", lp["attn"])
        _ln_to_torch(out, f"{pre}.norm2", lp["ln2"])
        _lin_to_torch(out, f"{pre}.linear1", lp["ffn"]["lin1"])
        _lin_to_torch(out, f"{pre}.linear2", lp["ffn"]["lin2"])
    _ln_to_torch(out, "enc_ln", params["enc_ln"])

    if "ctc_head" in params:
        _ln_to_torch(out, "ctc_head.0", params["ctc_head"]["ln"])
        _lin_to_torch(out, "ctc_head.2", params["ctc_head"]["proj"])

    _lin_to_torch(out, "mem_proj", params["mem_proj"])
    out["dec_emb.weight"] = params["dec_emb"]["emb"]
    for i, lp in enumerate(params["dec_layers"]):
        pre = f"dec.layers.{i}"
        _ln_to_torch(out, f"{pre}.norm1", lp["ln1"])
        _mha_to_torch(out, f"{pre}.self_attn", lp["self_attn"])
        _ln_to_torch(out, f"{pre}.norm2", lp["ln2"])
        _mha_to_torch(out, f"{pre}.multihead_attn", lp["cross_attn"])
        _ln_to_torch(out, f"{pre}.norm3", lp["ln3"])
        _lin_to_torch(out, f"{pre}.linear1", lp["ffn"]["lin1"])
        _lin_to_torch(out, f"{pre}.linear2", lp["ffn"]["lin2"])
    _ln_to_torch(out, "dec_ln", params["dec_ln"])
    _lin_to_torch(out, "dec_head", params["dec_head"])
    if "lm_head" in params:
        _lin_to_torch(out, "lm_head", params["lm_head"])

    if variables.get("meta") is not None and variables["meta"].use_dec_pos_enc:
        # Persist the sinusoidal buffer so the reference loader detects the
        # new architecture (kiri_ocr/core.py:255-262).
        from ..models.layers import sinusoid_table

        d = params["dec_emb"]["emb"].shape[1]
        out["dec_pos_enc.pe"] = sinusoid_table(cfg.MAX_DEC_LEN + 10, d)[None]
    return out


def infer_cfg_from_state_dict(sd: Dict[str, np.ndarray], cfg):
    """Shape-based architecture inference for metadata-less checkpoints
    (reference: kiri_ocr/core.py:319-403)."""
    kw = {}
    if "stem.net.9.weight" in sd:
        kw["ENC_DIM"] = int(sd["stem.net.9.weight"].shape[0])
    enc_layers = {int(k.split(".")[2]) for k in sd if k.startswith("enc.layers.")}
    if enc_layers:
        kw["ENC_LAYERS"] = max(enc_layers) + 1
    dec_layers = {int(k.split(".")[2]) for k in sd if k.startswith("dec.layers.")}
    if dec_layers:
        kw["DEC_LAYERS"] = max(dec_layers) + 1
    if "enc.layers.0.linear1.weight" in sd:
        kw["ENC_FF"] = int(sd["enc.layers.0.linear1.weight"].shape[0])
    if "dec_emb.weight" in sd:
        kw["DEC_DIM"] = int(sd["dec_emb.weight"].shape[1])
    if "dec.layers.0.linear1.weight" in sd:
        kw["DEC_FF"] = int(sd["dec.layers.0.linear1.weight"].shape[0])

    def _heads(key):
        total = sd[key].shape[0] // 3
        if total % 64 == 0:
            return total // 64
        if total % 32 == 0:
            return total // 32
        return 8

    if "enc.layers.0.self_attn.in_proj_weight" in sd:
        kw["ENC_HEADS"] = _heads("enc.layers.0.self_attn.in_proj_weight")
    if "dec.layers.0.self_attn.in_proj_weight" in sd:
        kw["DEC_HEADS"] = _heads("dec.layers.0.self_attn.in_proj_weight")
    return cfg.replace(**kw)
