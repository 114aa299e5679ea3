"""Beam throughput vs batch size / unroll on the real TPU.

Measures device-resident beam_search lines/s at several (N, opt_unroll)
points to find whether the step loop is overhead- or compute-bound, and
what the cheap batch-scaling headroom is.

Usage: python scripts/profile_beam_scale.py  (serialize with other TPU jobs!)
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
from kiri_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

L_CAP = 64


def main():
    print(f"devices: {jax.devices()}")
    import tempfile

    from kiri_tpu.data.synth import DatasetGenerator, sample_text
    from kiri_tpu.engine import RecognizerEngine
    from kiri_tpu.ops.preprocess import resize_keep_ratio_pad_np
    from kiri_tpu.tokenizer import CharTokenizer
    from kiri_tpu.train.checkpoints import load_checkpoint

    variables, cfg, _ = load_checkpoint(str(REPO / "models/model.safetensors"))
    tok = CharTokenizer(str(REPO / "models/vocab.json"), cfg)
    engine = RecognizerEngine(variables, cfg, tok)

    # Real rendered text lines (noise images EOS out in 1-2 steps and the
    # early-exit cond makes the loop look absurdly fast).
    tmp = tempfile.mkdtemp(prefix="kiri_pb_")
    gen = DatasetGenerator(tmp, height=cfg.IMG_H, augment=False)
    charset = "".join(t for t in tok.token_to_id if len(t) == 1)
    texts = [sample_text(gen.rng, 2, 8, charset) for _ in range(128)]
    samples = gen.generate_samples(128, texts=texts)
    base = np.stack([resize_keep_ratio_pad_np(s["image"], cfg.IMG_H, 320)
                     for s in samples])
    memp, ctc, ids, conf, est, n = engine.encode_batch(base)
    memp, ctc, conf, est = jax.device_put((memp, ctc, conf, est))
    tl = est.astype(jnp.int32)

    kw = dict(cfg=cfg, k_beam=cfg.BEAM, l_cap=L_CAP, eos_id=tok.dec_eos,
              unk_dec_id=tok.unk_id + tok.dec_offset,
              dec_offset=tok.dec_offset, bos_id=tok.dec_bos)

    for nb in (128, 512):
        rep = nb // 128
        mp = jnp.concatenate([memp] * rep, axis=0)
        ct = jnp.concatenate([ctc] * rep, axis=0)
        cf = jnp.concatenate([conf] * rep, axis=0)
        t_l = jnp.concatenate([tl] * rep, axis=0)

        # Engine bucketed dispatch (sorted rows -> per-chunk l_cap programs).
        est_np = np.asarray(t_l)

        for chunk in (32, 64):
            def bucketed():
                launched = engine.beam_device_bucketed(mp, ct, est_np, cf,
                                                       chunk=chunk)
                return [(d.tokens, d.lengths) for _, d in launched]

            caps = [d.tokens.shape[1] - 2
                    for _, d in engine.beam_device_bucketed(mp, ct, est_np,
                                                            cf, chunk=chunk)]
            jax.device_get(bucketed())
            t0 = time.perf_counter()
            for _ in range(3):
                pend = bucketed()
            jax.device_get(pend)
            dt = (time.perf_counter() - t0) / 3
            print(f"N={nb:4d} bucketed(c{chunk}) {dt*1000:8.1f} ms/batch  "
                  f"{nb/dt:8.1f} lines/s  l_caps={caps}", flush=True)

        for unroll in (1,):
            # NOTE: time with device_get — on this axon backend
            # block_until_ready does not force execution (bench.py has the
            # same pattern); per-dispatch block timings read ~0.2 ms.
            def once():
                out = D.beam_search(variables, mp, ct, t_l, cf,
                                    opt_unroll=unroll, **kw)
                return out.tokens, out.lengths
            jax.device_get(once())
            t0 = time.perf_counter()
            for _ in range(3):
                pend = once()
            jax.device_get(pend)
            dt = (time.perf_counter() - t0) / 3
            print(f"N={nb:4d} unroll={unroll}  {dt*1000:8.1f} ms/batch  "
                  f"{nb/dt:8.1f} lines/s", flush=True)


if __name__ == "__main__":
    main()
