"""A/B the beam-decode kernel variants on the real TPU.

Times the flagship beam on device-resident memory (no tunnel in the timed
region) across the opt_* static switches in ops/decode.beam_search:
shared cross-KV, fused dec+lm head, identity-permutation gather skip.

Usage: python scripts/profile_beam.py   (serialize with other TPU jobs!)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from kiri_tpu.ops import decode as D
from kiri_tpu.ops.ctc import greedy_ctc_stats
from kiri_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

N, L_CAP = 128, 64


def main():
    print(f"devices: {jax.devices()}")
    from kiri_tpu.engine import RecognizerEngine
    from kiri_tpu.tokenizer import CharTokenizer
    from kiri_tpu.train.checkpoints import load_checkpoint

    variables, cfg, _ = load_checkpoint(str(REPO / "models/model.safetensors"))
    tok = CharTokenizer(str(REPO / "models/vocab.json"), cfg)
    engine = RecognizerEngine(variables, cfg, tok)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (N, 48, 320), np.uint8)
    memp, ctc, ids, conf, est, n = engine.encode_batch(imgs)
    memp, ctc, conf, est = jax.device_put((memp, ctc, conf, est))
    tl = est.astype(jnp.int32)

    kw = dict(cfg=cfg, k_beam=cfg.BEAM, l_cap=L_CAP, eos_id=tok.dec_eos,
              unk_dec_id=tok.unk_id + tok.dec_offset,
              dec_offset=tok.dec_offset, bos_id=tok.dec_bos)

    combos = [
        ("r2-baseline  (all off)", dict(opt_shared_kv=False,
                                        opt_fused_head=False,
                                        opt_identity_skip=False,
                                        opt_fused_qkv=False)),
        ("shared_kv only", dict(opt_shared_kv=True, opt_fused_head=False,
                                opt_identity_skip=False,
                                opt_fused_qkv=False)),
        ("fused_head only", dict(opt_shared_kv=False, opt_fused_head=True,
                                 opt_identity_skip=False,
                                 opt_fused_qkv=False)),
        ("identity_skip only", dict(opt_shared_kv=False, opt_fused_head=False,
                                    opt_identity_skip=True,
                                    opt_fused_qkv=False)),
        ("shared+fused", dict(opt_shared_kv=True,
                              opt_fused_head=True,
                              opt_identity_skip=False,
                              opt_fused_qkv=False)),
        ("all r2 opts, no fused_qkv", dict(opt_shared_kv=True,
                                           opt_fused_head=True,
                                           opt_identity_skip=True,
                                           opt_fused_qkv=False)),
        ("all on (current)", dict(opt_shared_kv=True, opt_fused_head=True,
                                  opt_identity_skip=True,
                                  opt_fused_qkv=True)),
    ]

    texts0 = None
    for label, opts in combos:
        out = D.beam_search(variables, memp, ctc, tl, conf, **kw, **opts)
        toks, lens = jax.device_get((out.tokens, out.lengths))  # sync
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = D.beam_search(variables, memp, ctc, tl, conf, **kw, **opts)
        toks, lens = jax.device_get((out.tokens, out.lengths))
        dt = (time.perf_counter() - t0) / reps
        texts = []
        for i in range(N):
            row = toks[i, 1: lens[i]]
            eos = np.nonzero(row == tok.dec_eos)[0]
            if eos.size:
                row = row[: eos[0]]
            texts.append(tok.decode_dec(row))
        if texts0 is None:
            texts0 = texts
        same = sum(a == b for a, b in zip(texts, texts0))
        print(f"{label:28s} {dt * 1000:8.1f} ms/batch "
              f"{N / dt:7.0f} lines/s  text-match {same}/{N}")


if __name__ == "__main__":
    main()
