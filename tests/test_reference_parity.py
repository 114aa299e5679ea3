"""Numerical parity against the reference PyTorch implementation.

Loads the reference package (read-only, /root/reference) as a test oracle:
identical weights must produce matching encoder memory, CTC logits, decoder
logits, and identical beam-decoded text. Skipped when the reference or torch
is unavailable.
"""
import json
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not __import__("pathlib").Path(REFERENCE).exists(),
    reason="reference repo not mounted")

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import jax
import jax.numpy as jnp

from kiri_tpu.config import CFG
from kiri_tpu.models import recognizer as R
from kiri_tpu.ops import decode as D
from kiri_tpu.ops.ctc import greedy_ctc_stats
from kiri_tpu.tokenizer import CharTokenizer
from kiri_tpu.utils.convert import from_torch_state_dict


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from kiri_ocr.model import CFG as RefCFG
    from kiri_ocr.model import CharTokenizer as RefTok
    from kiri_ocr.model import KiriOCR as RefModel

    tmp = tmp_path_factory.mktemp("parity")
    vocab = {"<unk>": 0}
    for i, ch in enumerate("abcdefghij .,"):
        vocab[ch] = i + 1
    vp = tmp / "vocab.json"
    vp.write_text(json.dumps(vocab))

    kw = dict(ENC_DIM=64, ENC_LAYERS=2, ENC_FF=128, ENC_HEADS=4,
              DEC_DIM=64, DEC_LAYERS=2, DEC_FF=128, DEC_HEADS=4,
              IMG_H=48, IMG_W=160)
    ref_cfg = RefCFG(**kw)
    ref_tok = RefTok(str(vp), ref_cfg)
    torch.manual_seed(0)
    ref_model = RefModel(ref_cfg, ref_tok, use_dec_pos_enc=True).eval()

    cfg = CFG(COMPUTE_DTYPE="float32", **kw)
    tok = CharTokenizer(str(vp), cfg)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables, use_pe = from_torch_state_dict(sd, cfg)
    assert use_pe
    from kiri_tpu.models.recognizer import ModelMeta

    variables["meta"] = ModelMeta(use_pe)
    variables = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x, np.float32)), variables,
        is_leaf=lambda x: isinstance(x, np.ndarray))

    rng = np.random.default_rng(0)
    imgs_u8 = rng.integers(0, 255, (2, 48, 160), dtype=np.uint8)
    return ref_model, ref_tok, ref_cfg, variables, tok, cfg, imgs_u8


def _ref_encode(ref_model, imgs_u8):
    x = torch.tensor(imgs_u8, dtype=torch.float32)[:, None] / 255.0
    x = (x - 0.5) / 0.5
    with torch.inference_mode():
        return ref_model.encode(x)


def test_encoder_parity(setup):
    ref_model, _, _, variables, _, cfg, imgs_u8 = setup
    ref_mem = _ref_encode(ref_model, imgs_u8).numpy()
    mem, _ = R.encode(variables, jnp.asarray(imgs_u8), cfg, train=False)
    np.testing.assert_allclose(np.asarray(mem), ref_mem, atol=2e-4, rtol=1e-3)


def test_ctc_logits_parity(setup):
    ref_model, _, _, variables, _, cfg, imgs_u8 = setup
    ref_mem = _ref_encode(ref_model, imgs_u8)
    with torch.inference_mode():
        ref_logits = ref_model.ctc_head(ref_mem).numpy()
    mem, _ = R.encode(variables, jnp.asarray(imgs_u8), cfg, train=False)
    ours = R.ctc_logits(variables["params"], mem, cfg)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=5e-4, rtol=1e-3)


def test_decoder_logits_parity(setup):
    """Teacher-forcing full-sequence decoder logits match the torch decoder."""
    ref_model, ref_tok, _, variables, tok, cfg, imgs_u8 = setup
    ref_mem = _ref_encode(ref_model, imgs_u8)
    ids = np.array([[1, 5, 6, 7], [1, 8, 9, 4]], np.int64)  # bos + chars
    with torch.inference_mode():
        memp = ref_model.mem_proj(ref_mem)
        x = ref_model.dec_emb(torch.tensor(ids))
        x = ref_model.dec_pos_enc(x)
        L = ids.shape[1]
        mask = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)
        h = ref_model.dec(x, memp, tgt_mask=mask)
        h = ref_model.dec_ln(h)
        ref_logits = ref_model.dec_head(h).numpy()

    mem, _ = R.encode(variables, jnp.asarray(imgs_u8), cfg, train=False)
    memp_j = R.mem_project(variables["params"], mem)
    ours = R.decoder_train_logits(variables, memp_j, jnp.asarray(ids, jnp.int32),
                                  cfg, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=1e-3, rtol=1e-2)


def test_kv_cached_step_matches_full_decoder(setup):
    """Our incremental KV-cache path must equal our full teacher-forcing path."""
    _, _, _, variables, tok, cfg, imgs_u8 = setup
    mem, _ = R.encode(variables, jnp.asarray(imgs_u8), cfg, train=False)
    memp = R.mem_project(variables["params"], mem)
    ids = jnp.asarray([[1, 5, 6, 7], [1, 8, 9, 4]], jnp.int32)

    full = R.decoder_train_logits(variables, memp, ids, cfg, train=False)

    cross = R.decode_prepare(variables, memp, cfg)
    cache = R.init_decode_cache(cfg, 2, 8)
    step_logits = []
    for t in range(ids.shape[1]):
        lg, _, cache = R.decoder_step(variables, ids[:, t], t, cache, cross, cfg)
        step_logits.append(np.asarray(lg))
    inc = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(inc, np.asarray(full), atol=2e-4, rtol=1e-3)


def test_beam_text_parity(setup):
    """Identical weights -> identical beam-decoded text vs the reference."""
    from kiri_ocr.model import beam_decode_one_batched

    ref_model, ref_tok, ref_cfg, variables, tok, cfg, imgs_u8 = setup
    ref_mem = _ref_encode(ref_model, imgs_u8)
    with torch.inference_mode():
        ref_memp = ref_model.mem_proj(ref_mem)
        ref_ctc = ref_model.ctc_head(ref_mem)

    mem, _ = R.encode(variables, jnp.asarray(imgs_u8), cfg, train=False)
    memp = R.mem_project(variables["params"], mem)
    ctc = R.ctc_logits(variables["params"], mem, cfg)
    _, conf, est = greedy_ctc_stats(ctc)

    out = D.beam_search(variables, memp, ctc, est, conf, cfg=cfg,
                        k_beam=cfg.BEAM, l_cap=64, eos_id=tok.dec_eos,
                        unk_dec_id=tok.unk_id + tok.dec_offset,
                        dec_offset=tok.dec_offset, bos_id=tok.dec_bos)
    tokens = np.asarray(out.tokens)
    lengths = np.asarray(out.lengths)

    for i in range(imgs_u8.shape[0]):
        ref_text, ref_conf = beam_decode_one_batched(
            ref_model, ref_memp[i: i + 1], ref_tok, ref_cfg,
            ctc_logits_1=ref_ctc[i: i + 1])
        ids = tokens[i, 1: lengths[i]]
        eos = np.nonzero(ids == tok.dec_eos)[0]
        if eos.size:
            ids = ids[: eos[0]]
        our_text = tok.decode_dec(ids)
        assert our_text == ref_text, (our_text, ref_text)
        assert abs(float(out.final_conf[i]) - ref_conf) < 0.05
