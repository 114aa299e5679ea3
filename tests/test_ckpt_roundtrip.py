"""File-level checkpoint round-trips through the REFERENCE's own code paths.

Both directions, driven end-to-end at the file level (not in-memory):

* reference ``training.save_checkpoint`` (kiri_ocr/training.py:1003-1062),
  safetensors AND legacy ``.pt`` fallback, after real optimizer steps
  -> ``kiri_tpu.load_checkpoint`` -> identical encoder/CTC outputs.
* ``kiri_tpu.save_checkpoint`` -> the reference ``OCR`` class loader
  (kiri_ocr/core.py:219-296), both the ``_meta.json`` branch and the
  metadata-less shape-inference branch (core.py:320-403).

Skipped when torch / the reference repo is unavailable.
"""
import json
import shutil
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not Path(REFERENCE).exists(), reason="reference repo not mounted")

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import jax
import jax.numpy as jnp

from kiri_tpu.config import CFG
from kiri_tpu.engine import RecognizerEngine
from kiri_tpu.models import recognizer as R
from kiri_tpu.models.recognizer import init_recognizer
from kiri_tpu.tokenizer import CharTokenizer
from kiri_tpu.train.checkpoints import load_checkpoint, save_checkpoint

TINY = dict(ENC_DIM=128, ENC_LAYERS=2, ENC_FF=256, ENC_HEADS=2,
            DEC_DIM=128, DEC_LAYERS=1, DEC_FF=256, DEC_HEADS=2)
# NOTE: dims chosen so the reference's shape-inference fallback
# (head_dim-64 heuristic, core.py:383-403) reconstructs EXACTLY this
# architecture from the weights alone.


def _write_vocab(path):
    vocab = {"<unk>": 0}
    for i, ch in enumerate("abcdefghij .,"):
        vocab[ch] = i + 1
    path.write_text(json.dumps(vocab))


def _ref_setup(tmp_path, seed=0):
    from kiri_ocr.model import CFG as RefCFG
    from kiri_ocr.model import CharTokenizer as RefTok
    from kiri_ocr.model import KiriOCR as RefModel

    vp = tmp_path / "vocab.json"
    _write_vocab(vp)
    ref_cfg = RefCFG(**TINY)
    ref_tok = RefTok(str(vp), ref_cfg)
    torch.manual_seed(seed)
    ref_model = RefModel(ref_cfg, ref_tok, use_dec_pos_enc=True)
    return ref_model, ref_tok, ref_cfg, vp


def _train_two_steps(ref_model):
    """Two real optimizer steps so saved optimizer/scheduler state is live."""
    opt = torch.optim.AdamW(ref_model.parameters(), lr=1e-3)
    sched = torch.optim.lr_scheduler.OneCycleLR(opt, max_lr=1e-3,
                                                total_steps=4)
    ref_model.train()
    for _ in range(2):
        x = torch.randn(2, 1, 48, 64)
        mem = ref_model.encode(x)
        loss = ref_model.ctc_head(mem).square().mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
    ref_model.eval()
    return opt, sched


def _compare_models(ref_model, variables, cfg, tmp_path, atol=5e-4):
    """Encoder memory + CTC logits parity between torch and kiri_tpu."""
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (2, 48, 64), np.uint8)
    x = torch.tensor(imgs, dtype=torch.float32)[:, None] / 255.0
    x = (x - 0.5) / 0.5
    with torch.inference_mode():
        ref_mem = ref_model.encode(x)
        ref_ctc = ref_model.ctc_head(ref_mem).numpy()
    mem, _ = R.encode(variables, jnp.asarray(imgs), cfg, train=False)
    ctc = R.ctc_logits(variables["params"], mem, cfg)
    np.testing.assert_allclose(np.asarray(mem), ref_mem.numpy(),
                               atol=atol, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ctc), ref_ctc,
                               atol=atol, rtol=1e-3)


def test_reference_save_safetensors_to_kiri_load(tmp_path):
    """reference save_checkpoint -> kiri_tpu.load_checkpoint (+ meta)."""
    from kiri_ocr.training import save_checkpoint as ref_save

    ref_model, ref_tok, ref_cfg, vp = _ref_setup(tmp_path)
    opt, sched = _train_two_steps(ref_model)
    path = tmp_path / "model.safetensors"
    ref_save(ref_model, opt, sched, ref_cfg, str(vp), epoch=3, step=17,
             best_val_acc=0.5, path=str(path))
    assert path.exists()
    assert (tmp_path / "model_meta.json").exists()
    assert (tmp_path / "model_optim.pt").exists()

    variables, cfg, meta = load_checkpoint(str(path))
    assert cfg.ENC_DIM == TINY["ENC_DIM"] and cfg.DEC_FF == TINY["DEC_FF"]
    assert meta["epoch"] == 3 and meta["step"] == 17
    assert variables["meta"].use_dec_pos_enc
    cfg = cfg.replace(COMPUTE_DTYPE="float32")
    _compare_models(ref_model, variables, cfg, tmp_path)


def test_reference_save_pt_fallback_to_kiri_load(tmp_path):
    """reference torch.save fallback (.pt single file) -> kiri_tpu load."""
    from kiri_ocr.training import save_checkpoint as ref_save

    ref_model, ref_tok, ref_cfg, vp = _ref_setup(tmp_path, seed=1)
    opt, sched = _train_two_steps(ref_model)
    path = tmp_path / "model.pt"
    ref_save(ref_model, opt, sched, ref_cfg, str(vp), epoch=1, step=2,
             best_val_acc=0.1, path=str(path))
    assert path.exists()

    variables, cfg, meta = load_checkpoint(str(path))
    assert cfg.ENC_DIM == TINY["ENC_DIM"]
    cfg = cfg.replace(COMPUTE_DTYPE="float32")
    _compare_models(ref_model, variables, cfg, tmp_path)


def _kiri_checkpoint(tmp_path):
    """Random-init kiri_tpu model saved via our save_checkpoint."""
    vp = tmp_path / "vocab.json"
    _write_vocab(vp)
    cfg = CFG(COMPUTE_DTYPE="float32", **TINY)
    tok = CharTokenizer(str(vp), cfg)
    variables = init_recognizer(jax.random.PRNGKey(7), cfg, tok)
    path = tmp_path / "model.safetensors"
    save_checkpoint(str(path), jax.device_get(variables), cfg,
                    vocab_path=str(vp), epoch=5, step=42, best_val_acc=0.9)
    return path, variables, cfg, tok


def test_kiri_save_to_reference_ocr_load_with_meta(tmp_path):
    """kiri_tpu save -> the reference OCR class loads it via its _meta.json
    branch; loaded torch model must match our weights numerically and the
    applied config must match ours."""
    from kiri_ocr.core import OCR as RefOCR

    path, variables, cfg, tok = _kiri_checkpoint(tmp_path)
    ref_ocr = RefOCR(model_path=str(path), det_method="legacy", device="cpu",
                     decode_method="beam")
    assert ref_ocr.cfg.ENC_DIM == cfg.ENC_DIM
    assert ref_ocr.cfg.DEC_LAYERS == cfg.DEC_LAYERS
    assert ref_ocr.tokenizer.vocab_size == tok.vocab_size
    _compare_models(ref_ocr.model, variables, cfg, tmp_path)

    # End-to-end: the reference's own single-line recognizer on our weights
    # vs our engine, same preprocessed image.
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (48, 64), np.uint8)
    x = torch.tensor(img, dtype=torch.float32)[None, None] / 255.0
    x = (x - 0.5) / 0.5
    ref_text, ref_conf = ref_ocr.recognize_region(x)
    engine = RecognizerEngine(variables, cfg, tok)
    our_text, our_conf = engine.recognize_batch(img[None], "beam")[0]
    assert our_text == ref_text
    assert abs(our_conf - ref_conf) < 5e-2


def test_kiri_save_to_reference_shape_inference_branch(tmp_path):
    """Metadata-less load: delete _meta.json; the reference must infer the
    architecture from weight shapes (core.py:320-403) and still match."""
    from kiri_ocr.core import OCR as RefOCR

    path, variables, cfg, tok = _kiri_checkpoint(tmp_path)
    bare = tmp_path / "bare"
    bare.mkdir()
    shutil.copy(path, bare / "model.safetensors")
    shutil.copy(tmp_path / "vocab.json", bare / "vocab.json")
    assert not (bare / "model_meta.json").exists()

    ref_ocr = RefOCR(model_path=str(bare / "model.safetensors"),
                     det_method="legacy", device="cpu")
    for field in ("ENC_DIM", "ENC_LAYERS", "ENC_FF", "ENC_HEADS",
                  "DEC_DIM", "DEC_LAYERS", "DEC_FF", "DEC_HEADS"):
        assert getattr(ref_ocr.cfg, field) == getattr(cfg, field), field
    _compare_models(ref_ocr.model, variables, cfg, tmp_path)
