"""Multi-process distributed training (VERDICT r3 #4; SURVEY §2.5 comm
backend): two OS processes join via jax.distributed.initialize with 2
virtual CPU devices each, run data-parallel train steps over the 4-device
global mesh (gloo CPU collectives), and must reproduce the single-process
loss trajectory on the same deterministic batch.

Marked slow: each subprocess pays a fresh JAX import (~20 s)."""
from __future__ import annotations

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _write_vocab(path: Path) -> None:
    from kiri_tpu.tokenizer import build_vocab_from_texts

    build_vocab_from_texts(["ab"], str(path))


def _single_process_losses() -> list:
    """Same config as tests/mp_runner.py on this process's local devices."""
    from kiri_tpu.config import CFG
    from kiri_tpu.tokenizer import CharTokenizer
    from kiri_tpu.train.trainer import TrainConfig, Trainer, collate

    cfg = CFG(IMG_H=48, IMG_W=160, ENC_DIM=64, ENC_LAYERS=1, ENC_HEADS=4,
              ENC_FF=128, DEC_DIM=64, DEC_LAYERS=1, DEC_HEADS=4, DEC_FF=128,
              COMPUTE_DTYPE="float32")
    tok = CharTokenizer(str(REPO / "tests" / "_mp_vocab.json"), cfg)
    rng = np.random.default_rng(7)
    texts = ["ab", "ba", "aa", "bb", "ab", "ba", "aa", "bb"]
    batch = collate([{"image": rng.integers(0, 255,
                                            (cfg.IMG_H, cfg.IMG_W), np.uint8),
                      "text": t} for t in texts], tok)
    tc = TrainConfig(epochs=1, batch_size=8, lr=1e-3, seed=3,
                     n_devices=4, model_parallel=1)
    trainer = Trainer(cfg, tok, tc, total_steps=4)
    return [trainer.run_step(batch)["loss"] for _ in range(3)]


def test_two_process_dp_matches_single_process(tmp_path):
    vocab = REPO / "tests" / "_mp_vocab.json"
    _write_vocab(vocab)

    coordinator = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "mp_runner.py"),
             coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(REPO)))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"runner failed:\n{out[-3000:]}"

    loss_lines = [ln for ln in outs[0].splitlines() if ln.startswith("LOSSES:")]
    assert loss_lines, f"no LOSSES line from process 0:\n{outs[0][-3000:]}"
    mp_losses = json.loads(loss_lines[0][len("LOSSES:"):])
    assert len(mp_losses) == 3 and all(np.isfinite(mp_losses))

    sp_losses = _single_process_losses()
    # gloo all-reduce order may differ from single-process XLA reductions;
    # f32 agreement to ~1e-5 relative proves the same global computation.
    np.testing.assert_allclose(mp_losses, sp_losses, rtol=2e-5, atol=2e-5)
