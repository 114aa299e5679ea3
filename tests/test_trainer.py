"""Trainer: loss decreases (tiny overfit), collate shapes, resume."""
import json

import numpy as np
import pytest

from kiri_tpu.config import CFG
from kiri_tpu.tokenizer import CharTokenizer
from kiri_tpu.train.trainer import (TrainConfig, Trainer, collate,
                                    train_loop)

CFG_TINY = CFG(ENC_DIM=32, ENC_LAYERS=1, ENC_FF=64, ENC_HEADS=4,
               DEC_DIM=32, DEC_LAYERS=1, DEC_FF=64, DEC_HEADS=4,
               IMG_H=48, IMG_W=160, COMPUTE_DTYPE="float32", DROPOUT=0.0)


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("trainer")
    vocab = {"<unk>": 0}
    for i, ch in enumerate("abcde "):
        vocab[ch] = i + 1
    vp = tmp / "vocab.json"
    vp.write_text(json.dumps(vocab))
    return CharTokenizer(str(vp), CFG_TINY)


def _samples(n=8):
    rng = np.random.default_rng(0)
    return [{"image": rng.integers(0, 255, (48, 160), np.uint8),
             "text": "ab cde"} for _ in range(n)]


def test_collate_shapes(tok):
    batch = collate(_samples(4), tok)
    assert batch["image"].shape == (4, 48, 160)
    assert batch["image"].dtype == np.uint8
    assert batch["ctc_target"].shape[0] == 4
    assert batch["ctc_len"].tolist() == [6] * 4
    assert batch["dec_inp"].shape == batch["dec_tgt"].shape
    # dec_inp starts with bos; each dec_tgt row contains exactly one eos
    # (tail is pad after length bucketing).
    assert (batch["dec_inp"][:, 0] == tok.dec_bos).all()
    assert ((batch["dec_tgt"] == tok.dec_eos).sum(axis=1) == 1).all()
    # shifted relationship within each row's valid region (tail is pad)
    for i in range(4):
        L = int(np.argmax(batch["dec_tgt"][i] == tok.dec_eos))
        np.testing.assert_array_equal(batch["dec_inp"][i, 1: L + 1],
                                      batch["dec_tgt"][i, :L])


def test_collate_truncation(tok):
    long = [{"image": np.zeros((48, 160), np.uint8), "text": "ab" * 400}]
    batch = collate(long, tok, max_seq_len=16)
    assert batch["dec_inp"].shape[1] <= 16
    assert batch["ctc_target"].shape[1] <= 16  # bucketed to multiple of 16
    assert int(batch["ctc_len"][0]) <= 15


def test_loss_decreases_overfit(tok):
    tc = TrainConfig(epochs=1, batch_size=8, lr=3e-3, warmup_steps=2,
                     log_every=0)
    trainer = Trainer(CFG_TINY, tok, tc, total_steps=30, use_mesh=False)
    batch = collate(_samples(8), tok)
    losses = [trainer.run_step(batch)["loss"] for _ in range(30)]
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    assert np.isfinite(losses).all()


def test_train_loop_checkpoints_and_resume(tok, tmp_path):
    tc = TrainConfig(epochs=2, batch_size=4, out_dir=str(tmp_path / "ckpt"),
                     log_every=0)
    samples = _samples(8)
    trainer = train_loop(CFG_TINY, tok, tc, samples, samples[:4],
                         verbose=False)
    out = tmp_path / "ckpt"
    assert (out / "latest.safetensors").exists()
    assert (out / "model_epoch_2.safetensors").exists()
    assert (out / "history.json").exists()
    hist = json.loads((out / "history.json").read_text())
    assert len(hist) == 2

    # Resume restores epoch/step counters.
    t2 = Trainer(CFG_TINY, tok, tc, total_steps=10, use_mesh=False)
    assert t2.resume(out / "latest.safetensors")
    assert t2.epoch == 2
    assert t2.step == trainer.step


def test_decoder_only_training_freezes_fast_path(tok):
    """train_only='decoder': encoder/CTC params and BN stats stay
    bit-identical (so fast-mode outputs cannot move), decoder params train."""
    import jax

    from kiri_tpu.models import recognizer as R
    from kiri_tpu.train.trainer import DECODER_PARAM_KEYS

    tc = TrainConfig(epochs=1, batch_size=8, lr=3e-3, warmup_steps=2,
                     log_every=0, train_only="decoder")
    trainer = Trainer(CFG_TINY, tok, tc, total_steps=20, use_mesh=False)
    before = jax.device_get(trainer.variables)
    batch = collate(_samples(8), tok)
    imgs = batch["image"]
    mem_before = np.asarray(R.encode(before, imgs, CFG_TINY)[0])
    losses = [trainer.run_step(batch)["dec_loss"] for _ in range(20)]
    after = jax.device_get(trainer.variables)

    frozen = [k for k in after["params"] if k not in DECODER_PARAM_KEYS]
    assert frozen  # sanity: the frozen set is non-empty
    for k in frozen:
        for a, b in zip(jax.tree.leaves(after["params"][k]),
                        jax.tree.leaves(before["params"][k])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(after["batch_stats"]),
                    jax.tree.leaves(before["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Decoder actually trains...
    assert losses[-1] < losses[0] * 0.9, losses[::5]
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for k in DECODER_PARAM_KEYS if k in after["params"]
        for a, b in zip(jax.tree.leaves(after["params"][k]),
                        jax.tree.leaves(before["params"][k])))
    assert changed
    # ...and the serving encoder output is bit-identical.
    mem_after = np.asarray(R.encode(after, imgs, CFG_TINY)[0])
    np.testing.assert_array_equal(mem_before, mem_after)


def test_dec_input_noise_trains_and_differs(tok):
    """Input-noise runs produce finite decreasing loss and a different
    gradient signal than the clean run (the corruption is real)."""
    import jax

    from kiri_tpu.train.trainer import hybrid_loss

    batch = {k: (np.asarray(v) if not isinstance(v, list) else v)
             for k, v in collate(_samples(8), tok).items()}
    variables = __import__("kiri_tpu.models.recognizer",
                           fromlist=["init_recognizer"]).init_recognizer(
        jax.random.PRNGKey(0), CFG_TINY, tok)
    rng = jax.random.PRNGKey(1)
    kw = dict(cfg=CFG_TINY, dec_pad=tok.dec_pad, ctc_weight=0.5,
              dec_weight=0.5, dec_vocab=tok.dec_vocab)
    l_clean, _ = hybrid_loss(variables, batch, rng, dec_input_noise=0.0, **kw)
    l_noisy, _ = hybrid_loss(variables, batch, rng, dec_input_noise=0.5, **kw)
    assert np.isfinite(float(l_clean)) and np.isfinite(float(l_noisy))
    assert float(l_clean) != float(l_noisy)

    tc = TrainConfig(epochs=1, batch_size=8, lr=3e-3, warmup_steps=2,
                     log_every=0, dec_input_noise=0.15)
    trainer = Trainer(CFG_TINY, tok, tc, total_steps=25, use_mesh=False)
    losses = [trainer.run_step(batch)["loss"] for _ in range(25)]
    assert losses[-1] < losses[0] * 0.8, losses[::8]


def test_validate_exact_match(tok):
    tc = TrainConfig(epochs=1, batch_size=4, log_every=0)
    trainer = Trainer(CFG_TINY, tok, tc, total_steps=5, use_mesh=False)
    batch = collate(_samples(4), tok)
    batch["text"] = ["ab cde"] * 4
    acc = trainer.validate([batch])
    assert 0.0 <= acc <= 1.0


def test_ar_divergence_warning():
    from kiri_tpu.train.trainer import ar_divergence_warning

    assert ar_divergence_warning(0.90, 0.90) is None
    assert ar_divergence_warning(0.90, 0.80) is None   # 10 pts: within band
    msg = ar_divergence_warning(0.90, 0.70)            # 20 pts: warn
    assert msg is not None and "lags CTC" in msg
    assert ar_divergence_warning(0.10, 0.50) is None   # AR ahead: fine


def test_validate_samples_ar_decode(tok, capsys):
    """validate() runs sampled AR decode and records last_ar_acc
    (reference: kiri_ocr/training.py:865-949)."""
    tc = TrainConfig(epochs=1, batch_size=4, log_every=0)
    trainer = Trainer(CFG_TINY, tok, tc, total_steps=5, use_mesh=False)
    batch = collate(_samples(4), tok)
    batch["text"] = ["ab cde"] * 4
    acc = trainer.validate([batch], ar_sample_every=1)
    assert trainer.last_ar_acc is not None
    assert 0.0 <= trainer.last_ar_acc <= 1.0
    # With ar sampling disabled, last_ar_acc resets to None.
    trainer.validate([batch], ar_sample_every=0)
    assert trainer.last_ar_acc is None
    assert 0.0 <= acc <= 1.0
