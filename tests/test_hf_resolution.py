"""HuggingFace-hub resolution paths, driven with a mocked hf_hub_download.

The environment has no egress, so these paths were previously dead code; the
mock proves the resolution ORDER and offline degradation behave like the
reference (kiri_ocr/core.py:123-131, 191-217; detector/__init__.py:82-107).
"""
import json
import sys
import types
from pathlib import Path

import jax
import numpy as np
import pytest

from kiri_tpu.config import CFG
from kiri_tpu.models.recognizer import init_recognizer
from kiri_tpu.tokenizer import CharTokenizer
from kiri_tpu.train.checkpoints import save_checkpoint

TINY = dict(ENC_DIM=32, ENC_LAYERS=1, ENC_FF=64, ENC_HEADS=2,
            DEC_DIM=32, DEC_LAYERS=1, DEC_FF=64, DEC_HEADS=2,
            COMPUTE_DTYPE="float32")


@pytest.fixture()
def hub(monkeypatch, tmp_path):
    """Fake huggingface_hub whose download serves files from tmp_path/repo
    and records every (repo_id, filename) request."""
    calls = []
    repo = tmp_path / "repo"
    repo.mkdir()

    def hf_hub_download(repo_id, filename, **kw):
        calls.append((repo_id, filename))
        p = repo / filename
        if not p.exists():
            raise FileNotFoundError(filename)
        return str(p)

    fake = types.SimpleNamespace(hf_hub_download=hf_hub_download)
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)
    return repo, calls


def _make_ckpt(dirpath, name="model.safetensors"):
    vocab = {"<unk>": 0}
    for i, ch in enumerate("abc"):
        vocab[ch] = i + 1
    vp = dirpath / "vocab.json"
    vp.write_text(json.dumps(vocab))
    cfg = CFG(**TINY)
    tok = CharTokenizer(str(vp), cfg)
    variables = init_recognizer(jax.random.PRNGKey(0), cfg, tok)
    save_checkpoint(str(dirpath / name), jax.device_get(variables), cfg,
                    vocab_path=str(vp))
    return dirpath / name


# ---------------------------------------------------------------- recognizer
def test_repo_id_download_and_load(hub):
    """'org/name' without a file suffix resolves via the hub; side files
    (meta + vocab candidates + config) are requested after the weights."""
    from kiri_tpu.pipeline import OCR

    repo, calls = hub
    _make_ckpt(repo)
    ocr = OCR(model_path="someorg/somemodel", det_method="legacy",
              decode_method="fast")
    assert ocr.cfg.ENC_DIM == 32
    names = [f for _, f in calls]
    assert names[0] == "model.safetensors"
    for extra in ("model_meta.json", "vocab.json", "vocab_auto.json",
                  "vocab_char.json", "config.json"):
        assert extra in names, names
    assert all(r == "someorg/somemodel" for r, _ in calls)


def test_repo_id_pt_fallback_order(hub, tmp_path):
    """model.safetensors missing in the repo -> model.pt is tried next
    (reference filename fallback order, core.py:196-203)."""
    from kiri_tpu.pipeline import OCR

    repo, calls = hub
    OCR._model_cache.clear()
    ocr = None
    try:
        OCR(model_path="org/ptonly", det_method="legacy")
    except FileNotFoundError:
        pass  # repo empty: both filenames tried, then local load fails
    names = [f for _, f in calls]
    assert names[:2] == ["model.safetensors", "model.pt"]


def test_offline_degrades_to_input_path(monkeypatch, tmp_path):
    """No huggingface_hub importable: the repo id is returned untouched and
    the loader raises a clean file error (no crash in resolution)."""
    import builtins

    from kiri_tpu.pipeline import OCR

    real_import = builtins.__import__

    def no_hub(name, *a, **k):
        if name == "huggingface_hub":
            raise ImportError("offline")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_hub)
    monkeypatch.setitem(sys.modules, "huggingface_hub", None)
    sys.modules.pop("huggingface_hub", None)
    OCR._model_cache.clear()
    with pytest.raises(Exception) as e:
        OCR(model_path="org/unreachable", det_method="legacy")
    assert "org/unreachable" in str(e.value) or isinstance(
        e.value, FileNotFoundError)


def test_local_path_never_hits_hub(hub, tmp_path):
    """An existing local file path must not trigger any hub request."""
    from kiri_tpu.pipeline import OCR

    repo, calls = hub
    ckpt = _make_ckpt(tmp_path)
    OCR._model_cache.clear()
    ocr = OCR(model_path=str(ckpt), det_method="legacy")
    assert calls == []


# ------------------------------------------------------------------ detector
def test_detector_hub_filename_order(hub, monkeypatch):
    """DB detector hub lookup tries detector/<f>, <f>, models/<f> in order
    and falls back to legacy when nothing resolves."""
    from kiri_tpu.detect import TextDetector

    repo, calls = hub
    monkeypatch.chdir(repo)  # no local models/ dir candidates
    det = TextDetector(method="db", model_path="definitely/absent.safetensors")
    names = [f for _, f in calls]
    assert names == ["detector/detector.safetensors", "detector.safetensors",
                     "models/detector.safetensors"]
    # Fallback chain engaged: facade still detects via the legacy engine.
    img = np.full((64, 200), 255, np.uint8)
    assert det.detect_lines(img) == [] or isinstance(det.detect_lines(img), list)


def test_detector_hub_hit_loads(hub, monkeypatch, tmp_path):
    """A hub-resolvable DB checkpoint is downloaded and actually loaded."""
    import shutil

    from kiri_tpu.detect import TextDetector

    repo, calls = hub
    src = Path(__file__).resolve().parents[1] / "models" / "detector.safetensors"
    if not src.exists():
        pytest.skip("no trained detector checkpoint in repo")
    (repo / "detector").mkdir()
    shutil.copy(src, repo / "detector" / "detector.safetensors")
    monkeypatch.chdir(tmp_path)
    det = TextDetector(method="db", model_path="definitely/absent.safetensors")
    assert det.db_detector is not None
    assert ("detector/detector.safetensors" in [f for _, f in calls])
