"""Model / inference configuration for Kiri-TPU.

Hyperparameter surface mirrors the reference CFG dataclass
(reference: kiri_ocr/model.py:24-69) so checkpoints and configs are
interchangeable, but the object is a frozen-by-convention pytree-friendly
dataclass designed to be closed over by jitted functions (all fields are
static Python scalars, never traced).
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional


@dataclass(frozen=True)
class CFG:
    """Frozen (hashable) so jitted functions can take it as a static argument;
    use ``cfg.replace(...)`` to derive variants."""

    # --- Model architecture ---
    IMG_H: int = 48
    IMG_W: int = 640
    MAX_DEC_LEN: int = 512
    UNK_TOKEN: str = "<unk>"
    COLLAPSE_WHITESPACE: bool = True
    UNICODE_NFC: bool = True
    # Train/serve the model on VISUAL-order Khmer tokens (pre-base vowels
    # before their base, matching the ink) and reorder to logical Unicode at
    # the tokenizer boundary. Monotonic labels converge far better for CTC
    # on shaped Khmer; carried in checkpoint meta so loading a checkpoint
    # picks the token space it was trained in (data/khmer_order.py).
    KHMER_VISUAL_ORDER: bool = False

    ENC_DIM: int = 256
    ENC_LAYERS: int = 4
    ENC_HEADS: int = 8
    ENC_FF: int = 1024
    DROPOUT: float = 0.15

    USE_DECODER: bool = True
    DEC_DIM: int = 256
    DEC_LAYERS: int = 3
    DEC_HEADS: int = 8
    DEC_FF: int = 1024

    USE_CTC: bool = True
    USE_LM: bool = True
    USE_LM_FUSION_EVAL: bool = True
    LM_FUSION_ALPHA: float = 0.35
    # On TPU the fast path is bfloat16 (MXU-native), not fp16.
    USE_FP16: bool = True
    USE_AUTOCAST: bool = True

    # --- Inference params ---
    CTC_FUSION_ALPHA: float = 0.5
    BEAM: int = 3
    BEAM_LENP: float = 0.8
    # Device-beam dispatch knobs (text-identical variants, measured on the
    # v5e with scripts/profile_beam_dispatch.py over 128 rendered bilingual
    # lines: chunk 64/def-buckets 503 l/s -> chunk 16/def 777 -> chunk 16/
    # fine buckets 891, identical texts; chunk 128 REGRESSES to 320 —
    # small budget-sorted chunks + tight step caps beat wide dispatches
    # because each chunk's while_loop runs only its own rows' budget):
    # steps per while_loop iteration, row-chunk cap, and the step-bucket
    # grid for the per-chunk l_cap.
    BEAM_UNROLL: int = 1
    BEAM_CHUNK: int = 16
    BEAM_STEP_BUCKETS: tuple = (16, 24, 32, 48, 64, 96, 128, 256, 512)

    EOS_LOGP_BIAS: float = 0.0
    EOS_LOGP_BOOST: float = 0.0
    EOS_BIAS_UNTIL_LEN: int = 2

    REPEAT_LAST_PENALTY: float = 3.0
    REPEAT_BIGRAM_PENALTY: float = 2.5
    REPEAT_TRIGRAM_PENALTY: float = 2.0
    UNK_LOGP_PENALTY: float = 10.0

    DEC_MAX_LEN_RATIO: float = 1.3
    DEC_MAX_LEN_PAD: int = 10
    MEM_MAX_LEN_RATIO: float = 1.0

    # --- TPU-specific knobs (no reference equivalent) ---
    # Compute dtype for the jitted forward paths ("bfloat16" or "float32").
    COMPUTE_DTYPE: str = "bfloat16"
    # Batch-size buckets used by the batched recognizer so XLA compiles a
    # small, fixed set of program shapes (see pipeline.py).
    BATCH_BUCKETS: tuple = (1, 2, 4, 8, 16, 32, 64, 128)
    # Decode-step buckets: AR decoding compiles one while_loop program per
    # step bucket instead of per data-dependent max_steps.
    STEP_BUCKETS: tuple = (32, 64, 128, 256, 512)
    # Width buckets for line images: a line whose aspect-preserving resize is
    # narrower than IMG_W runs through a program padded only to the next
    # bucket, not the full IMG_W. Encoder FLOPs and decode memory length
    # scale with width, so narrow lines (the common case in documents) cost
    # a fraction of a full-width dispatch. Buckets wider than IMG_W are
    # ignored; IMG_W itself is always a valid bucket.
    WIDTH_BUCKETS: tuple = (160, 320, 480, 640)
    # decode_method="auto": lines whose greedy-CTC confidence (mean
    # per-frame max prob) reaches this threshold keep the CTC result; the
    # rest are re-decoded with beam search on the already-encoded features.
    # Most lines take the throughput path, hard lines get beam accuracy.
    AUTO_CONF_THRESHOLD: float = 0.95
    # Speculative decode for the single-hypothesis AR paths ("decoder" /
    # accurate mode and greedy streaming): the greedy-CTC transcript drafts
    # the sequence and whole-suffix teacher-forced passes verify it, so a
    # line costs ~2 full-attention dispatches instead of one KV-cached
    # dispatch per character (ops/decode.spec_decode). Output-equivalent to
    # the step loop; set False to force the step-by-step decoder.
    SPEC_DECODE: bool = True
    # Round budget for spec_decode: a garbage draft advances ~1 token per
    # full-attention round, so the budget caps the worst case near one
    # step-loop's cost; rows unfinished at the budget are re-decoded with
    # the step loop (engine fallback). Typical lines converge in 1-2 rounds.
    SPEC_MAX_ROUNDS: int = 8
    # Accurate ("decoder") mode: rescore the accepted AR transcript against
    # the CTC transcript with beam's CTC-fusion formula and keep the winner
    # (ops/decode.spec_decode ctc_logits=...). The AR head's residual errors
    # are mostly single-char slips the CTC head doesn't make, so this closes
    # most of the accurate-vs-beam CER gap at zero extra decoder passes.
    # False restores the pure sequential-decode-equivalent output.
    ACCURATE_CTC_RESCORE: bool = True
    # Certificate-gated speculative beam: beam mode first runs the
    # CTC-drafted single-hypothesis decode plus ONE teacher-forced
    # certificate pass that PROVES (score upper bounds over every possible
    # beam branch, ops/decode.beam_spec_certificate) the step-loop beam
    # would return the same text; only uncertified lines run the real
    # while_loop beam. Text-identical by construction (parity-tested in
    # tests/test_beam_spec.py). Default False — a MEASURED NULL RESULT:
    # with the reference's LM fusion on, every hypothesis pays
    # ~|LM_FUSION_ALPHA * LM entropy| per token (~1.4 nats on the
    # flagship), so the sound "competitor suffix costs >= 0" bound exceeds
    # the greedy path's real accumulated score by ~|avg logp| * suffix_len
    # and the certificate never fires (0/24 clean lines; see the
    # beam_spec_certificate docstring). The machinery is kept because it
    # is exact, tested, and becomes profitable the moment fusion is
    # disabled or a low-entropy LM head lands.
    SPEC_BEAM: bool = False
    # Step-window size for incremental character streaming: the AR
    # streaming decoders run as resumable W-step windows (decode state and
    # KV cache stay on device between dispatches) and each window's chunks
    # are emitted before the next window launches — time-to-first-char is
    # encode + one window instead of the whole page decode
    # (ops/decode.*_stream_window; reference yields inside its eager loop,
    # kiri_ocr/model.py:779-946). 0 disables (one-shot decode + replay).
    STREAM_WINDOW: int = 16

    def replace(self, **kw) -> "CFG":
        return dataclasses.replace(self, **kw)

    # -- (de)serialization ---------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["BATCH_BUCKETS"] = list(self.BATCH_BUCKETS)
        d["STEP_BUCKETS"] = list(self.STEP_BUCKETS)
        d["WIDTH_BUCKETS"] = list(self.WIDTH_BUCKETS)
        return d

    @classmethod
    def from_dict(cls, data: Optional[Dict[str, Any]]) -> "CFG":
        """Build a CFG from a (possibly partial / reference-produced) dict.

        Unknown keys are ignored so reference `_meta.json` checkpoint configs
        (reference: kiri_ocr/training.py:1018-1037) load unchanged.
        """
        cfg = cls()
        if not data:
            return cfg
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in data.items():
            if k in fields:
                if k in ("BATCH_BUCKETS", "STEP_BUCKETS", "WIDTH_BUCKETS"):
                    v = tuple(v)
                kw[k] = v
        return dataclasses.replace(cfg, **kw)

    def save_json(self, path) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), indent=2))

    @classmethod
    def load_json(cls, path) -> "CFG":
        return cls.from_dict(json.loads(Path(path).read_text()))


def merge_config(defaults: Dict[str, Any], file_cfg: Optional[Dict[str, Any]],
                 overrides: Dict[str, Any]) -> Dict[str, Any]:
    """Three-layer config merge: defaults < config file < explicit flags.

    Mirrors the reference CLI semantics (reference: kiri_ocr/cli.py:225-259):
    a value from the config file replaces the default; an explicitly-passed
    flag (non-None) replaces both.
    """
    merged = dict(defaults)
    if file_cfg:
        for k, v in file_cfg.items():
            if k in merged:
                merged[k] = v
    for k, v in overrides.items():
        if v is not None:
            merged[k] = v
    return merged


def load_config_file(path) -> Dict[str, Any]:
    """Load a YAML or JSON config file (reference: kiri_ocr/cli.py:9-27)."""
    p = Path(path)
    text = p.read_text()
    if p.suffix.lower() in (".yaml", ".yml"):
        import yaml

        return yaml.safe_load(text) or {}
    return json.loads(text)
