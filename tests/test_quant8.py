"""Int8 fast-path parity: quantized encode+CTC must match bf16 text output.

The accuracy contract for the int8 MXU experiment (VERDICT r4 #5): fast-path
CER within 0.0005 of the bf16 path. Text-level parity is checked on the
committed checkpoint over freshly rendered bilingual lines; a random-weight
smoke test guards the numerics without needing the checkpoint.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
MODELS = REPO / "models"


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for x, ca in enumerate(a, 1):
        cur = [x]
        for y, cb in enumerate(b, 1):
            cur.append(min(prev[y] + 1, cur[y - 1] + 1,
                           prev[y - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_quant8_random_weights_close():
    """mem/ctc from the int8 path track bf16 closely on random weights."""
    import jax

    from kiri_tpu.config import CFG
    from kiri_tpu.models.recognizer import init_recognizer
    from kiri_tpu.ops.quant8 import Q8Encoder
    from kiri_tpu.tokenizer import CharTokenizer, build_full_vocab

    import tempfile

    cfg = CFG(ENC_DIM=64, ENC_LAYERS=2, ENC_HEADS=4, ENC_FF=128,
              DEC_LAYERS=1, DEC_HEADS=4, DEC_FF=128,
              COMPUTE_DTYPE="float32", IMG_W=128)
    vp = tempfile.mktemp(suffix=".json")
    build_full_vocab(vp, include_khmer=False)
    tok = CharTokenizer(vp, cfg)
    variables = init_recognizer(jax.random.PRNGKey(0), cfg, tok)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, cfg.IMG_H, cfg.IMG_W), np.uint8)

    q = Q8Encoder(variables, cfg)
    q.calibrate(imgs)
    mem_q, ctc_q = jax.device_get(q(imgs))
    mem_b, ctc_b = jax.device_get(q.bf16(imgs))
    # cosine similarity of the memory and agreement of CTC argmax frames
    cos = float(np.sum(mem_q * mem_b)
                / (np.linalg.norm(mem_q) * np.linalg.norm(mem_b)))
    assert cos > 0.995, cos
    agree = float(np.mean(np.argmax(ctc_q, -1) == np.argmax(ctc_b, -1)))
    # Random-weight CTC frames are near-uniform, so a few argmax ties flip
    # with backend reduction order (measured: 124/128 on CPU, 125/128 on
    # the TPU tunnel) — the bound guards gross numeric breakage only; real
    # accuracy is asserted by the flagship text-parity test below.
    assert agree > 0.94, agree


@pytest.mark.skipif(not (MODELS / "model.safetensors").exists(),
                    reason="committed flagship checkpoint not present")
def test_quant8_flagship_text_parity():
    """Fast-path text on the committed checkpoint: int8 CER-vs-bf16 must be
    within 0.0005 (i.e. near-identical transcripts)."""
    import random

    import jax

    from kiri_tpu.data.synth import (DatasetGenerator, sample_khmer_text,
                                     sample_text)
    from kiri_tpu.ops.preprocess import resize_keep_ratio_pad_np
    from kiri_tpu.ops.quant8 import Q8Encoder
    from kiri_tpu.pipeline import OCR

    vocab = json.loads((MODELS / "vocab.json").read_text())
    has_khmer = any(len(t) == 1 and 0x1780 <= ord(t) <= 0x17FF
                    for t in (vocab if isinstance(vocab, list) else vocab))

    ocr = OCR(str(MODELS / "model.safetensors"))
    cfg, tok = ocr.cfg, ocr.tokenizer
    rng = random.Random(31415)
    charset = "".join(t for t in tok.token_to_id
                      if len(t) == 1 and t.isascii() and t.isprintable())
    texts = [sample_text(rng, 2, 5, charset) for _ in range(20)]
    if has_khmer:
        texts += [sample_khmer_text(rng, 2, 4) for _ in range(12)]
    import tempfile

    gen = DatasetGenerator(tempfile.mkdtemp(prefix="q8_"), height=cfg.IMG_H,
                           augment=False, seed=31415)
    samples = gen.generate_samples(len(texts), texts=texts)
    imgs = np.stack([resize_keep_ratio_pad_np(s["image"], cfg.IMG_H,
                                              cfg.IMG_W) for s in samples])

    q = Q8Encoder(ocr.engine.variables, cfg)
    q.calibrate(imgs[:16])
    _, ctc_q = jax.device_get(q(imgs))
    _, ctc_b = jax.device_get(q.bf16(imgs))
    dec = tok.decode_ctc_batch
    ids_q = np.argmax(ctc_q, -1)
    ids_b = np.argmax(ctc_b, -1)
    texts_q = dec(ids_q)
    texts_b = dec(ids_b)
    total = sum(max(1, len(b)) for b in texts_b)
    err = sum(_lev(a, b) for a, b in zip(texts_q, texts_b))
    cer_vs_bf16 = err / total
    assert cer_vs_bf16 <= 0.0005, (
        f"int8 vs bf16 text CER {cer_vs_bf16:.5f}; "
        f"mismatches: {[(a, b) for a, b in zip(texts_q, texts_b) if a != b][:3]}")
