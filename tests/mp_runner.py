"""Subprocess entry for the 2-process distributed training test.

Launched by tests/test_multiprocess.py as
``python tests/mp_runner.py <coordinator> <num_processes> <process_id>``.
Each process joins the JAX distributed runtime with 2 virtual CPU devices
(4 global), builds the same deterministic tiny batch, and runs a few
data-parallel train steps over the global mesh; process 0 prints the
per-step losses as one JSON line prefixed with ``LOSSES:``.

The CPU backend's cross-process collectives run over gloo (JAX default).
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from kiri_tpu.parallel import initialize

    # Platform dance mirrors tests/conftest.py: the environment's
    # sitecustomize forces the axon TPU plugin, so the CPU override must go
    # through jax.config before first backend init — and the distributed
    # init must see the virtual-device flag (set inside initialize()).
    initialize(coordinator_address=coordinator, num_processes=n_proc,
               process_id=pid, local_device_count=2)
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from kiri_tpu.config import CFG
    from kiri_tpu.parallel import process_info
    from kiri_tpu.tokenizer import CharTokenizer
    from kiri_tpu.train.trainer import TrainConfig, Trainer, collate

    assert process_info() == (pid, n_proc), process_info()
    assert len(jax.devices()) == 2 * n_proc, jax.devices()

    cfg = CFG(IMG_H=48, IMG_W=160, ENC_DIM=64, ENC_LAYERS=1, ENC_HEADS=4,
              ENC_FF=128, DEC_DIM=64, DEC_LAYERS=1, DEC_HEADS=4, DEC_FF=128,
              COMPUTE_DTYPE="float32")
    vocab = str(REPO / "tests" / "_mp_vocab.json")  # written by the test
    tok = CharTokenizer(vocab, cfg)

    rng = np.random.default_rng(7)
    texts = ["ab", "ba", "aa", "bb", "ab", "ba", "aa", "bb"]
    batch = collate([{"image": rng.integers(0, 255,
                                            (cfg.IMG_H, cfg.IMG_W), np.uint8),
                      "text": t} for t in texts], tok)

    tc = TrainConfig(epochs=1, batch_size=8, lr=1e-3, seed=3,
                     n_devices=2 * n_proc, model_parallel=1)
    trainer = Trainer(cfg, tok, tc, total_steps=4)
    losses = [trainer.run_step(batch)["loss"] for _ in range(3)]
    if pid == 0:
        print("LOSSES:" + json.dumps(losses), flush=True)


if __name__ == "__main__":
    main()
