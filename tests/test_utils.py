"""Utilities: verified transfer, profiling, parallel batch padding."""
import numpy as np

import jax
import jax.numpy as jnp

from kiri_tpu.parallel import make_mesh, pad_batch_to_devices
from kiri_tpu.utils.profiling import StageTimer, annotate
from kiri_tpu.utils.transfer import faithful_device_get


def test_faithful_device_get_contiguous():
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    host = faithful_device_get({"a": x, "b": {"c": x.T}})
    assert host["a"].flags["C_CONTIGUOUS"]
    assert host["b"]["c"].flags["C_CONTIGUOUS"]
    np.testing.assert_array_equal(host["a"], np.arange(24).reshape(2, 3, 4))
    np.testing.assert_array_equal(host["b"]["c"],
                                  np.arange(24).reshape(2, 3, 4).T)


def test_faithful_device_get_numpy_passthrough():
    x = np.asfortranarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    out = faithful_device_get(x)
    assert out.flags["C_CONTIGUOUS"]
    np.testing.assert_array_equal(out, x)


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    rep = t.report()
    assert "a" in rep and "TOTAL" in rep


def test_annotate_noop():
    with annotate("x"):
        y = 1
    assert y == 1


def test_pad_batch_to_devices():
    mesh = make_mesh(8, model_parallel=1)
    batch = {"x": np.ones((5, 3), np.float32), "y": np.ones((5,), np.int32)}
    padded, n = pad_batch_to_devices(batch, mesh)
    assert n == 5
    assert padded["x"].shape[0] % 8 == 0
    assert (padded["x"][5:] == 0).all()
    # Already-aligned batch passes through.
    batch8 = {"x": np.ones((8, 3), np.float32)}
    padded8, n8 = pad_batch_to_devices(batch8, mesh)
    assert padded8["x"].shape[0] == 8 and n8 == 8


def test_kiriocr_facade_roundtrip():
    """KiriOCR export parity (reference kiri_ocr/__init__.py exports KiriOCR;
    model class at model.py:235-307)."""
    import numpy as np

    from kiri_tpu import KiriOCR
    from kiri_tpu.config import CFG
    from kiri_tpu.tokenizer import CharTokenizer, build_full_vocab

    import tempfile
    from pathlib import Path

    tmp = tempfile.mkdtemp()
    vp = str(Path(tmp) / "vocab.json")
    build_full_vocab(vp, include_khmer=False)
    cfg = CFG(ENC_DIM=64, ENC_LAYERS=1, ENC_HEADS=4, ENC_FF=128,
              DEC_DIM=64, DEC_LAYERS=1, DEC_HEADS=4, DEC_FF=128,
              COMPUTE_DTYPE="float32")
    m = KiriOCR(cfg, CharTokenizer(vp, cfg))
    mem = m.encode(np.zeros((2, 48, 160), np.uint8))
    assert mem.shape == (2, 40, 64)
    assert m.ctc_logits(mem).shape[0] == 2
    assert m.mem_project(mem).shape == (2, 40, 64)
    assert m.num_params() > 0
