"""A/B the speculative CTC-drafted decoder vs the KV-cached step loop on the
accurate ("decoder") path, device-resident, with the trained flagship.

Usage: python scripts/profile_spec.py [N_LINES]
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import jax
    import jax.numpy as jnp

    from kiri_tpu.data.synth import DatasetGenerator, sample_text
    from kiri_tpu.ops import decode as D
    from kiri_tpu.ops.preprocess import resize_keep_ratio_pad_np
    from kiri_tpu.pipeline import OCR

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ocr = OCR(str(REPO / "models" / "model.safetensors"))
    cfg, tok, eng = ocr.cfg, ocr.tokenizer, ocr.engine

    import tempfile
    tmp = tempfile.mkdtemp(prefix="kiri_spec_")
    gen = DatasetGenerator(tmp, height=cfg.IMG_H, augment=False)
    charset = "".join(t for t in tok.token_to_id if len(t) == 1)
    texts = [sample_text(gen.rng, 2, 8, charset) for _ in range(n)]
    samples = gen.generate_samples(n, texts=texts)
    imgs = np.stack([resize_keep_ratio_pad_np(s["image"], cfg.IMG_H, cfg.IMG_W)
                     for s in samples])

    memp, ctc, ids, conf, est, m = eng.encode_batch(imgs)
    est_np = np.asarray(est)
    l_cap = eng._step_cap(est_np, m, memp.shape[1])
    tl = jnp.asarray(np.where(est_np > 0, est_np, 0), jnp.int32)
    kw = dict(cfg=cfg, l_cap=l_cap, eos_id=tok.dec_eos,
              unk_dec_id=tok.unk_id + tok.dec_offset,
              dec_offset=tok.dec_offset, bos_id=tok.dec_bos)
    print(f"n={n} l_cap={l_cap}")

    def run(fn, label, reps=4):
        jax.device_get(fn().tokens)           # compile + warm
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        jax.device_get([o.tokens for o in outs])
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:28s} {dt * 1000:8.1f} ms  {n / dt:9.1f} lines/s")
        return outs[0]

    step = run(lambda: D.beam_search(eng.variables, memp, ctc, tl, conf,
                                     k_beam=1, **kw), "step loop (beam k=1)")
    spec = run(lambda: D.spec_decode(eng.variables, memp, ids, tl, conf, **kw),
               "spec (penalized select)")
    spec_raw = run(lambda: D.spec_decode(eng.variables, memp, ids, tl, None,
                                         raw_select=True, **kw),
                   "spec raw (greedy stream)")

    # sanity: identical text
    def texts_of(out):
        tokens, lengths = jax.device_get((out.tokens, out.lengths))
        res = []
        for i in range(m):
            seq = tokens[i, 1:lengths[i]]
            eos = np.nonzero(seq == tok.dec_eos)[0]
            if eos.size:
                seq = seq[: eos[0]]
            res.append(tok.decode_dec(seq))
        return res

    a, b = texts_of(step), texts_of(spec)
    mism = sum(x != y for x, y in zip(a, b))
    print(f"text mismatches step vs spec: {mism}/{m}")
    cer = np.mean([sum(c1 != c2 for c1, c2 in zip(x, y)) / max(1, len(x))
                   for x, y in zip(texts, b)])
    print(f"approx CER vs ground truth (spec): {cer:.4f}")


if __name__ == "__main__":
    main()
