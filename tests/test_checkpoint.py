"""Checkpoint I/O and torch state-dict conversion round trips."""
import json

import jax
import numpy as np
import pytest

from kiri_tpu.config import CFG
from kiri_tpu.models import recognizer as R
from kiri_tpu.tokenizer import CharTokenizer
from kiri_tpu.train.checkpoints import (find_vocab_file, load_checkpoint,
                                        save_checkpoint)
from kiri_tpu.utils.convert import (from_torch_state_dict,
                                    infer_cfg_from_state_dict,
                                    to_torch_state_dict)

CFG_TINY = CFG(ENC_DIM=32, ENC_LAYERS=2, ENC_FF=64, ENC_HEADS=4,
               DEC_DIM=32, DEC_LAYERS=2, DEC_FF=64, DEC_HEADS=4,
               IMG_H=48, IMG_W=160, COMPUTE_DTYPE="float32")


@pytest.fixture()
def tok(tmp_path):
    vocab = {"<unk>": 0}
    for i, ch in enumerate("abc "):
        vocab[ch] = i + 1
    p = tmp_path / "vocab.json"
    p.write_text(json.dumps(vocab))
    return CharTokenizer(str(p))


def _tree_allclose(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_save_load_roundtrip(tmp_path, tok):
    variables = R.init_recognizer(jax.random.PRNGKey(0), CFG_TINY, tok)
    path = tmp_path / "model.safetensors"
    save_checkpoint(path, variables, CFG_TINY, vocab_path="vocab.json",
                    epoch=3, step=77, best_val_acc=0.5)
    loaded, cfg2, meta = load_checkpoint(str(path))
    _tree_allclose(variables["params"], loaded["params"])
    _tree_allclose(variables["batch_stats"], loaded["batch_stats"])
    assert cfg2.ENC_DIM == 32 and cfg2.DEC_LAYERS == 2
    assert meta["epoch"] == 3 and meta["step"] == 77


def test_torch_state_dict_roundtrip(tok):
    variables = R.init_recognizer(jax.random.PRNGKey(1), CFG_TINY, tok)
    sd = to_torch_state_dict(variables, CFG_TINY)
    # Key naming matches the reference module tree.
    assert "stem.net.0.weight" in sd
    assert "enc.layers.1.self_attn.in_proj_weight" in sd
    assert "dec.layers.0.multihead_attn.out_proj.weight" in sd
    assert "dec_pos_enc.pe" in sd
    back, use_pe = from_torch_state_dict(sd, CFG_TINY)
    assert use_pe
    _tree_allclose(variables["params"], back["params"])
    _tree_allclose(variables["batch_stats"], back["batch_stats"])


def test_infer_cfg_from_state_dict(tok):
    variables = R.init_recognizer(jax.random.PRNGKey(2), CFG_TINY, tok)
    sd = to_torch_state_dict(variables, CFG_TINY)
    cfg = infer_cfg_from_state_dict(sd, CFG())
    assert cfg.ENC_DIM == 32
    assert cfg.ENC_LAYERS == 2
    assert cfg.DEC_LAYERS == 2
    assert cfg.ENC_FF == 64
    assert cfg.DEC_FF == 64


def test_metadata_less_checkpoint_loads(tmp_path, tok):
    from safetensors.numpy import save_file

    variables = R.init_recognizer(jax.random.PRNGKey(3), CFG_TINY, tok)
    sd = to_torch_state_dict(variables, CFG_TINY)
    path = tmp_path / "raw.safetensors"
    save_file(sd, str(path))  # no _meta.json
    loaded, cfg, meta = load_checkpoint(str(path))
    assert cfg.ENC_DIM == 32
    _tree_allclose(variables["params"], loaded["params"])


def test_find_vocab_file(tmp_path):
    (tmp_path / "vocab_auto.json").write_text("{}")
    model_path = tmp_path / "model.safetensors"
    assert find_vocab_file("", str(model_path)).endswith("vocab_auto.json")
    assert find_vocab_file("/nonexistent/vocab.json", str(model_path)).endswith(
        "vocab_auto.json")


def test_legacy_pt_checkpoint(tmp_path, tok):
    torch = pytest.importorskip("torch")
    variables = R.init_recognizer(jax.random.PRNGKey(4), CFG_TINY, tok)
    sd = to_torch_state_dict(variables, CFG_TINY)
    tsd = {k: torch.tensor(v) for k, v in sd.items()}
    path = tmp_path / "model.pt"
    torch.save({"model": tsd, "config": CFG_TINY.to_dict(),
                "vocab_path": "vocab.json", "epoch": 1}, str(path))
    loaded, cfg, meta = load_checkpoint(str(path))
    assert cfg.ENC_DIM == 32
    _tree_allclose(variables["params"], loaded["params"])
    assert meta["epoch"] == 1
