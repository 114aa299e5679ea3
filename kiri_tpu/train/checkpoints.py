"""Checkpoint I/O — reference-compatible safetensors + ``_meta.json``.

Format parity (reference: kiri_ocr/training.py:1003-1115):

* ``<name>.safetensors``  torch-named f32 weights (loadable by the reference)
* ``<name>_meta.json``    {"config": {...}, "vocab_path", "epoch", "step",
                           "best_val_acc"}
* optimizer state goes to ``<name>_optim.npz`` (framework-native; the
  reference's ``_optim.pt`` torch pickle is meaningless cross-framework and
  is ignored on load).

Legacy single ``.pt`` torch checkpoints are also importable when torch is
available (reference: kiri_ocr/core.py:405-423).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..config import CFG
from ..models.recognizer import ModelMeta
from ..utils.convert import (from_torch_state_dict, infer_cfg_from_state_dict,
                             to_torch_state_dict)


def save_checkpoint(path, variables, cfg: CFG, vocab_path: str = "",
                    epoch: int = 0, step: int = 0, best_val_acc: float = 0.0,
                    opt_state=None) -> None:
    from safetensors.numpy import save_file

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # Checksum-verified download — the experimental axon TPU backend can
    # return wrong data for arrays produced by donated computations
    # (see utils/transfer.py).
    from ..utils.transfer import faithful_device_get

    variables = {**variables,
                 "params": faithful_device_get(variables["params"]),
                 "batch_stats": faithful_device_get(variables["batch_stats"])}
    if opt_state is not None:
        opt_state = faithful_device_get(opt_state)
    sd = to_torch_state_dict(variables, cfg)
    save_file(sd, str(path))
    meta = {
        "config": cfg.to_dict(),
        "vocab_path": str(vocab_path),
        "epoch": int(epoch),
        "step": int(step),
        "best_val_acc": float(best_val_acc),
        "framework": "kiri_tpu",
    }
    Path(str(path).replace(".safetensors", "_meta.json")).write_text(
        json.dumps(meta, indent=2))
    if opt_state is not None:
        flat, _ = jax.tree_util.tree_flatten(opt_state)
        np.savez(str(path).replace(".safetensors", "_optim.npz"),
                 **{f"t{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_opt_state(path, opt_state_template):
    """Restore optimizer state saved by ``save_checkpoint`` into a template
    pytree (returns None when absent/mismatched)."""
    npz_path = Path(str(path).replace(".safetensors", "_optim.npz"))
    if not npz_path.exists():
        return None
    data = np.load(str(npz_path))
    flat, treedef = jax.tree_util.tree_flatten(opt_state_template)
    if len(data.files) != len(flat):
        return None
    leaves = [data[f"t{i}"] for i in range(len(flat))]
    try:
        leaves = [np.asarray(l, dtype=np.asarray(t).dtype).reshape(np.shape(t))
                  for l, t in zip(leaves, flat)]
    except Exception:
        return None
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_checkpoint(path, cfg: Optional[CFG] = None) -> Tuple[Dict[str, Any], CFG, Dict[str, Any]]:
    """Load a checkpoint (.safetensors preferred, legacy .pt supported).

    Returns (variables, cfg, meta_dict). ``variables`` includes a static
    ``meta`` entry with the detected use_dec_pos_enc flag.
    """
    path = str(path)
    meta: Dict[str, Any] = {}
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
        meta_path = Path(path.replace(".safetensors", "_meta.json"))
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
            cfg = CFG.from_dict(meta.get("config", {})) if cfg is None else cfg
        else:
            cfg = infer_cfg_from_state_dict(sd, cfg or CFG())
    else:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(ckpt, dict) and "config" in ckpt:
            config_data = ckpt["config"]
            if not isinstance(config_data, dict):
                config_data = {k: v for k, v in vars(config_data).items()
                               if not k.startswith("_")}
            cfg = CFG.from_dict(config_data) if cfg is None else cfg
            state = ckpt["model"]
            meta = {"vocab_path": ckpt.get("vocab_path", ""),
                    "epoch": ckpt.get("epoch", 0), "step": ckpt.get("step", 0)}
        else:
            state = ckpt
            cfg = cfg or CFG()
        sd = {k: v.detach().cpu().numpy() for k, v in state.items()}
        cfg = infer_cfg_from_state_dict(sd, cfg)

    variables, use_pe = from_torch_state_dict(sd, cfg)
    variables["meta"] = ModelMeta(use_pe)
    variables = jax.tree.map(
        lambda x: jax.numpy.asarray(np.asarray(x, dtype=np.float32)),
        variables, is_leaf=lambda x: isinstance(x, np.ndarray))
    return variables, cfg, meta


def find_vocab_file(vocab_path: str, model_path: str) -> Optional[str]:
    """Reference vocab lookup order (kiri_ocr/core.py:452-465)."""
    model_dir = Path(model_path).parent
    candidates = [
        vocab_path or None,
        model_dir / Path(vocab_path).name if vocab_path else None,
        model_dir / "vocab.json",
        model_dir / "vocab_auto.json",
        model_dir / "vocab_char.json",
    ]
    for c in candidates:
        if c and Path(c).exists():
            return str(c)
    return None
