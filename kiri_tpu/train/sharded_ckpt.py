"""Sharded checkpoint I/O (orbax/Tensorstore) for multi-host training.

The reference saves torch ``state_dict`` files from a single process
(kiri_ocr/training.py:1003-1115); the safetensors path in ``checkpoints.py``
mirrors that for interop. At scale that pattern breaks: a host-gathered save
materializes the full model on one host and writes it serially. This module
is the TPU-native alternative — every process writes only the shards of the
arrays it owns (orbax -> Tensorstore, OCDBT format), and restore reads each
host's shards directly into device memory with the target sharding applied,
so neither save nor restore ever gathers the model.

Layout on disk:

    <dir>/state/...        orbax OCDBT tree: {"params", "batch_stats",
                           optionally "opt_state"}
    <dir>/kiri_meta.json   cfg dict + vocab_path + epoch/step/best_val_acc
                           + use_dec_pos_enc (process 0 writes it)

Interop: ``to_reference(dir, out.safetensors)`` converts a sharded
checkpoint to the reference-compatible single-file format.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..config import CFG
from ..models.recognizer import ModelMeta


def _split_meta(variables: Dict[str, Any]) -> Tuple[Dict[str, Any], bool]:
    """Pull the static ModelMeta out of the variables tree (orbax trees must
    be arrays only)."""
    tree = {k: v for k, v in variables.items() if k != "meta"}
    meta = variables.get("meta")
    use_pe = bool(getattr(meta, "use_dec_pos_enc", True))
    return tree, use_pe


def save_sharded(ckpt_dir, variables: Dict[str, Any], cfg: CFG,
                 vocab_path: str = "", epoch: int = 0, step: int = 0,
                 best_val_acc: float = 0.0, opt_state=None) -> None:
    """Write a sharded checkpoint. Safe to call from every process of a
    multi-host run (single-process runs work identically)."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    tree, use_pe = _split_meta(variables)
    state = dict(tree)
    if opt_state is not None:
        # opt_state pytrees may contain non-array leaves (e.g. optax counts
        # are arrays; schedules are not part of state) — flatten to leaves.
        flat, _ = jax.tree_util.tree_flatten(opt_state)
        state["opt_state"] = {f"t{i}": x for i, x in enumerate(flat)}

    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        ckptr.save(ckpt_dir / "state", state, force=True)

    if jax.process_index() == 0:
        meta = {
            "config": cfg.to_dict(),
            "vocab_path": str(vocab_path),
            "epoch": int(epoch),
            "step": int(step),
            "best_val_acc": float(best_val_acc),
            "use_dec_pos_enc": use_pe,
            "has_opt_state": opt_state is not None,
            "framework": "kiri_tpu",
        }
        (ckpt_dir / "kiri_meta.json").write_text(json.dumps(meta, indent=2))


def restore_sharded(ckpt_dir, mesh=None, opt_state_template=None
                    ) -> Tuple[Dict[str, Any], CFG, Dict[str, Any], Any]:
    """Restore a sharded checkpoint.

    With ``mesh``, arrays land already laid out by ``parallel._param_spec``
    (each host reads only its shards); without it, arrays restore to the
    default single-device placement.

    Returns (variables, cfg, meta_dict, opt_state_or_None). ``opt_state`` is
    only reconstructed when ``opt_state_template`` is given (orbax stores
    flat leaves; the template provides the treedef).
    """
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    meta = json.loads((ckpt_dir / "kiri_meta.json").read_text())
    cfg = CFG.from_dict(meta.get("config", {}))

    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        state = ckptr.restore(ckpt_dir / "state")

    opt_state = None
    if opt_state_template is not None and "opt_state" in state:
        leaves_map = state["opt_state"]
        flat, treedef = jax.tree_util.tree_flatten(opt_state_template)
        if len(leaves_map) == len(flat):
            leaves = [leaves_map[f"t{i}"] for i in range(len(flat))]
            opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    state.pop("opt_state", None)

    variables: Dict[str, Any] = dict(state)
    if mesh is not None:
        from ..parallel import shard_variables

        variables = shard_variables(variables, mesh)
        if opt_state is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            opt_state = jax.device_put(
                opt_state, NamedSharding(mesh, P()))
    variables["meta"] = ModelMeta(bool(meta.get("use_dec_pos_enc", True)))
    return variables, cfg, meta, opt_state


def to_reference(ckpt_dir, out_path, vocab_path: str = "") -> None:
    """Convert a sharded checkpoint to the reference-compatible single-file
    safetensors format (checkpoints.py / kiri_ocr/training.py:1003-1115)."""
    from .checkpoints import save_checkpoint

    variables, cfg, meta, _ = restore_sharded(ckpt_dir)
    save_checkpoint(out_path, variables, cfg,
                    vocab_path=vocab_path or meta.get("vocab_path", ""),
                    epoch=meta.get("epoch", 0), step=meta.get("step", 0),
                    best_val_acc=meta.get("best_val_acc", 0.0))
