"""End-to-end pipeline accuracy: synthetic pages -> OCR.process_document ->
line-matched CER against the generator's ground-truth texts.

This is the product metric the component evals (eval_recognizer: crops only,
eval_detector: boxes only) don't cover: detection, cropping, preprocessing,
recognition, and reading-order assembly all in one measurement, per
robustness condition. A GT line is matched to the detected result whose box
covers its center; unmatched GT lines count their full length as errors, so
end2end_cer is bounded below by (1 - recall).

Usage:
  python scripts/eval_pipeline.py [--n 6] [--conditions clean,rotated]
      [--decode fast|accurate|beam|auto] [--deskew] [--model ...]
Prints one JSON line per condition plus a summary line.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6, help="docs per condition")
    ap.add_argument("--conditions", default="clean,rotated",
                    help="comma list from docsynth CONDITIONS")
    ap.add_argument("--decode", default="fast",
                    choices=("fast", "accurate", "beam", "auto"))
    ap.add_argument("--deskew", action="store_true")
    ap.add_argument("--enhance", action="store_true",
                    help="adaptive crop cleanup (denoise/contrast) before "
                         "recognition")
    ap.add_argument("--model", default="models/model.safetensors")
    ap.add_argument("--det-model", default=None)
    ap.add_argument("--detector", default="db", choices=("db", "craft", "legacy"))
    ap.add_argument("--khmer-ratio", type=float, default=0.4)
    ap.add_argument("--seed", type=int, default=7000)
    ap.add_argument("--upload-bits", type=int, choices=(4, 8), default=8,
                    help="4: packed recognition uploads (wire saver)")
    ap.add_argument("--map-downsample", type=int, default=1,
                    help="DB det_map_downsample serving knob")
    ap.add_argument("--two-step-deskew", action="store_true",
                    help="disable the single-resample deskew crop path "
                         "(A/B the double-interpolation cost)")
    args = ap.parse_args()

    from kiri_tpu import OCR
    from kiri_tpu.evalpage import eval_condition

    ocr = OCR(model_path=args.model, det_model_path=args.det_model,
              det_method=args.detector, decode_method=args.decode,
              deskew=args.deskew, enhance=args.enhance,
              upload_bits=args.upload_bits,
              deskew_single_resample=not args.two_step_deskew,
              det_kwargs=({"det_map_downsample": args.map_downsample}
                          if args.map_downsample > 1 else None))

    summary = {}
    for cond in args.conditions.split(","):
        cond = cond.strip()
        row = eval_condition(ocr, cond, args.n, seed=args.seed,
                             khmer_ratio=args.khmer_ratio)
        summary[cond] = row
        print(json.dumps(row))

    print(json.dumps({"decode": args.decode, "detector": args.detector,
                      "deskew": args.deskew, "enhance": args.enhance,
                      "summary": summary}))


if __name__ == "__main__":
    main()
