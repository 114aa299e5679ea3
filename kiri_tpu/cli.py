"""Kiri-TPU command-line interface.

Subcommand surface mirrors the reference CLI (kiri_ocr/cli.py:280-596):
``predict`` (with bare-image implicit predict), ``train``, ``generate``,
``generate-detector``, ``train-detector``, ``init-config``; config merge
order defaults < config file < explicit flags; streaming mode on predict.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

from .config import load_config_file, merge_config

DEFAULT_TRAIN_CONFIG = {
    "epochs": 10,
    "batch_size": 32,
    "lr": 3e-4,
    "weight_decay": 0.01,
    "height": 48,
    "width": 640,
    "max_seq_len": 512,
    "ctc_weight": 0.5,
    "dec_weight": 0.5,
    "save_steps": 0,
    "output_dir": "checkpoints",
    "enc_dim": 256,
    "enc_layers": 4,
    "enc_heads": 8,
    "enc_ff": 1024,
    "dec_dim": 256,
    "dec_layers": 3,
    "dec_heads": 8,
    "dec_ff": 1024,
    "dropout": 0.15,
}

_COMMANDS = ("predict", "train", "generate", "generate-detector",
             "train-detector", "init-config", "-h", "--help", "--version")


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="kiri-tpu", description="Kiri-TPU document OCR (JAX/TPU)")
    parser.add_argument("--version", action="version",
                        version="kiri-tpu 0.1.0")
    sub = parser.add_subparsers(dest="command")

    p = sub.add_parser("predict", help="Run OCR on one or more images")
    p.add_argument("image", nargs="+", metavar="IMAGE",
                   help="Path(s) to document image(s); multiple images are "
                        "recognized in one pooled device pass")
    p.add_argument("--mode", choices=["lines", "words"], default="lines")
    p.add_argument("--model", default="models/model.safetensors")
    p.add_argument("--det-model", default=None)
    p.add_argument("--det-method", choices=["db", "craft", "legacy"],
                   default="db")
    p.add_argument("--decode-method",
                   choices=["fast", "accurate", "beam", "auto"],
                   default="accurate")
    p.add_argument("--padding", type=int, default=10)
    p.add_argument("--output", "-o", default="output")
    p.add_argument("--no-render", action="store_true")
    p.add_argument("--device", default="tpu")
    p.add_argument("--verbose", "-v", action="store_true")
    p.add_argument("--stream", action="store_true",
                   help="LLM-style character streaming output")
    p.add_argument("--deskew", action="store_true",
                   help="Straighten skewed pages before detection "
                        "(projection-profile estimate, detect/deskew.py)")
    p.add_argument("--upload-bits", type=int, choices=(4, 8), default=8,
                   help="4: pack two pixels/byte for recognition uploads "
                        "(16 gray levels; halves the dominant wire cost on "
                        "link-bound hosts at ~0.0003 CER)")
    p.add_argument("--det-map-downsample", type=int, default=1,
                   help="DB detection maps download at 1/N resolution "
                        "(device mean-pool + host upsample; N must divide "
                        "32) — ~40%% fewer detection bytes at N=2")
    p.add_argument("--enhance", action="store_true",
                   help="Adaptive crop cleanup for degraded captures "
                        "(conditional denoise + contrast stretch; no-op on "
                        "clean pages)")

    t = sub.add_parser("train", help="Train the recognizer")
    t.add_argument("--config", help="YAML or JSON config file")
    t.add_argument("--train-labels", help="Path to training labels.txt")
    t.add_argument("--val-labels", help="Path to validation labels.txt")
    t.add_argument("--hf-dataset", "--hf-datasets", nargs="+",
                   help="HuggingFace dataset ID(s)")
    t.add_argument("--hf-subset", default=None,
                   help="Dataset subset/config name")
    t.add_argument("--hf-train-split", default="train")
    t.add_argument("--hf-val-split", default=None)
    t.add_argument("--hf-streaming", action="store_true",
                   help="Load with streaming=True and materialize host-side")
    t.add_argument("--hf-image-col", default="image")
    t.add_argument("--hf-text-col", default="text")
    t.add_argument("--hf-val-percent", type=float, default=0.1)
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--lr", type=float, default=None)
    t.add_argument("--weight-decay", type=float, default=None)
    t.add_argument("--vocab", help="Path to vocab.json (auto-built if absent)")
    t.add_argument("--height", type=int, default=None)
    t.add_argument("--width", type=int, default=None)
    t.add_argument("--max-seq-len", type=int, default=None)
    t.add_argument("--ctc-weight", type=float, default=None)
    t.add_argument("--dec-weight", type=float, default=None)
    t.add_argument("--save-steps", type=int, default=None)
    t.add_argument("--output-dir", default=None)
    t.add_argument("--from-model", help="Warm-start checkpoint")
    t.add_argument("--resume", action="store_true",
                   help="Resume from <output-dir>/latest.safetensors")
    t.add_argument("--device", choices=["cpu", "tpu"], default=None,
                   help="Force backend (default: auto)")
    # Both our short spellings and the reference's long spellings
    # (kiri_ocr/cli.py:406-456) are accepted for each architecture knob.
    t.add_argument("--enc-dim", "--encoder-dim", type=int, default=None,
                   dest="enc_dim")
    t.add_argument("--enc-layers", "--encoder-layers", type=int, default=None,
                   dest="enc_layers")
    t.add_argument("--enc-heads", "--encoder-heads", type=int, default=None,
                   dest="enc_heads")
    t.add_argument("--enc-ff", "--encoder-ffn-dim", type=int, default=None,
                   dest="enc_ff")
    t.add_argument("--dec-dim", "--decoder-dim", type=int, default=None,
                   dest="dec_dim")
    t.add_argument("--dec-layers", "--decoder-layers", type=int, default=None,
                   dest="dec_layers")
    t.add_argument("--dec-heads", "--decoder-heads", type=int, default=None,
                   dest="dec_heads")
    t.add_argument("--dec-ff", "--decoder-ffn-dim", type=int, default=None,
                   dest="dec_ff")
    t.add_argument("--dropout", type=float, default=None)
    t.add_argument("--n-devices", type=int, default=None)
    t.add_argument("--model-parallel", type=int, default=1)
    t.add_argument("--select-metric", choices=["ctc", "ar", "mean"],
                   default="ctc",
                   help="best-checkpoint criterion (ar/mean for "
                        "accurate-mode-focused runs)")
    t.add_argument("--train-only", choices=["decoder"], default=None,
                   help="'decoder' freezes encoder+CTC bit-exactly and "
                        "trains only the AR decode path")
    t.add_argument("--dec-input-noise", type=float, default=0.0,
                   help="P(corrupt a decoder-input token) — exposure-bias "
                        "regularization")

    g = sub.add_parser("generate", help="Generate synthetic line dataset")
    g.add_argument("--train-file", "-t", default=None,
                   help="Text file, one line per sample (random if omitted)")
    g.add_argument("--val-file", "-v", default=None,
                   help="Validation text file (else 10%% split of train-file)")
    g.add_argument("--output", "-o", default="data")
    g.add_argument("--num-samples", "-n", type=int, default=1000)
    g.add_argument("--language", "-l",
                   choices=["english", "khmer", "mixed"], default=None,
                   help="Script mix for random sampling (sets khmer-ratio)")
    g.add_argument("--augment", "-a", type=int, default=1,
                   help="Copies per train-file line (file-driven mode)")
    g.add_argument("--val-augment", type=int, default=1)
    g.add_argument("--height", type=int, default=48)
    g.add_argument("--width", type=int, default=None,
                   help="Max render width (over-wide lines are resampled)")
    g.add_argument("--fonts-dir", default=None,
                   help="Extra font directory searched before system fonts")
    g.add_argument("--font-mode", choices=["random", "all"], default="random",
                   help="'all' renders every capable font per line")
    g.add_argument("--random-augment", action="store_true",
                   help="Re-roll augmentation on/off per rendered copy")
    g.add_argument("--no-augment", action="store_true")
    g.add_argument("--append", action="store_true")
    g.add_argument("--khmer-ratio", type=float, default=0.0)

    gd = sub.add_parser("generate-detector",
                        help="Generate synthetic detector dataset")
    gd.add_argument("--text-file", default=None,
                    help="Corpus file for document lines (random if omitted); "
                         "'lang:file,lang:file' pairs are merged")
    gd.add_argument("--fonts-dir", default=None,
                    help="Extra font directory ('lang:dir,...' accepted)")
    gd.add_argument("--font", default=None,
                    help="Restrict rendering to one font file")
    gd.add_argument("--output", default="detector_dataset")
    gd.add_argument("--num-train", type=int, default=800)
    gd.add_argument("--num-val", type=int, default=200)
    gd.add_argument("--min-lines", type=int, default=None)
    gd.add_argument("--max-lines", type=int, default=None)
    gd.add_argument("--image-size", type=int, default=640)
    gd.add_argument("--image-height", type=int, default=None,
                    help="Document height (default: image-size)")
    gd.add_argument("--no-augment", action="store_true")
    gd.add_argument("--workers", type=int, default=1,
                    help="Accepted for reference-CLI compat; generation is "
                         "vectorized in-process")
    gd.add_argument("--kind", choices=["db", "craft", "both"], default="both")
    gd.add_argument("--khmer-ratio", type=float, default=0.0)

    td = sub.add_parser("train-detector", help="Train a text detector")
    td.add_argument("--detector", choices=["db", "craft"], default="db")
    td.add_argument("--data-yaml", default=None,
                    help="Pre-generated dataset dir (generate-detector "
                         "output); trains from disk instead of the live "
                         "generator pool")
    td.add_argument("--steps", type=int, default=2000)
    td.add_argument("--epochs", type=int, default=None,
                    help="With --data-yaml: passes over the dataset "
                         "(overrides --steps)")
    td.add_argument("--batch-size", type=int, default=8)
    td.add_argument("--lr", type=float, default=None)
    td.add_argument("--image-size", type=int, default=640)
    td.add_argument("--model-size", choices=["n", "s", "m", "l", "x"],
                    default="n",
                    help="Accepted for reference-CLI compat (the reference "
                         "CRAFT trainer ignores it too)")
    td.add_argument("--name", default=None,
                    help="Run name -> runs/detect/<name> (reference layout)")
    td.add_argument("--output-dir", default=None)
    td.add_argument("--pool-size", type=int, default=256)
    td.add_argument("--khmer-ratio", type=float, default=0.3)
    td.add_argument("--aug-conditions", type=float, default=0.0,
                    help="fraction of training docs degraded with a "
                         "robustness condition (rotation/noise/texture/"
                         "low-contrast)")
    td.add_argument("--aug-weights", default=None,
                    help="comma-separated condition=weight pairs biasing "
                         "which condition --aug-conditions applies, e.g. "
                         "'rotated=3' (unlisted conditions weigh 1.0)")
    td.add_argument("--scale-aug", type=float, default=0.0,
                    help="(craft) fraction of docs rendered small and "
                         "upscaled to image-size, matching the serving "
                         "canvas/mag_ratio magnification")
    td.add_argument("--from-model", default=None,
                    help="warm-start detector weights (.safetensors)")

    ic = sub.add_parser("init-config", help="Create a training config file")
    ic.add_argument("--output", "-o", default="train_config.yaml")
    return parser


# ---------------------------------------------------------------------------
def run_inference(args) -> None:
    import numpy as np

    from .pipeline import OCR
    from .renderer import DocumentRenderer

    output_dir = Path(args.output)
    output_dir.mkdir(exist_ok=True, parents=True)

    if args.verbose:
        print("\n" + "=" * 70)
        print("  📄 Kiri-TPU OCR System")
        print("=" * 70)

    try:
        ocr = OCR(model_path=args.model, det_model_path=args.det_model,
                  det_method=args.det_method, padding=args.padding,
                  device=args.device, verbose=args.verbose,
                  decode_method=args.decode_method,
                  deskew=getattr(args, "deskew", False),
                  enhance=getattr(args, "enhance", False),
                  upload_bits=getattr(args, "upload_bits", 8),
                  det_kwargs=(
                      {"det_map_downsample": args.det_map_downsample}
                      if getattr(args, "det_map_downsample", 1) > 1
                      else None))

        images = args.image
        if args.stream:
            for image in images:
                run_streaming_inference(ocr, image, args, output_dir)
            return

        if len(images) == 1:
            if not args.verbose:
                print(f"Processing {images[0]}...")
            doc_results = [ocr.extract_text(images[0], mode=args.mode,
                                            verbose=args.verbose)]
        else:
            # Multi-image: one pooled recognition pass over every page's
            # regions (pipeline.process_documents) instead of per-image runs.
            if not args.verbose:
                print(f"Processing {len(images)} images (pooled batch)...")
            doc_results = ocr.extract_text_batch(images, mode=args.mode,
                                                 verbose=args.verbose)

        for image, (full_text, results) in zip(images, doc_results):
            # Single image keeps the historical flat layout; multi-image
            # writes one subdirectory per input page.
            doc_dir = (output_dir if len(images) == 1
                       else output_dir / Path(image).stem)
            doc_dir.mkdir(exist_ok=True, parents=True)
            (doc_dir / "extracted_text.txt").write_text(full_text,
                                                        encoding="utf-8")
            (doc_dir / "ocr_results.json").write_text(
                json.dumps(results, indent=2, ensure_ascii=False),
                encoding="utf-8")

            if not args.no_render:
                renderer = DocumentRenderer()
                renderer.draw_boxes(image, results,
                                    output_path=str(doc_dir / "boxes.png"))
                renderer.draw_results(image, results,
                                      output_path=str(doc_dir / "ocr_result.png"))
                renderer.create_report(image, results,
                                       output_path=str(doc_dir / "report.html"))

            if args.verbose:
                print("\n" + "=" * 70)
                print("  ✅ Processing Complete!")
                print(f"  Regions detected: {len(results)}")
                if results:
                    avg = np.mean([r["confidence"] for r in results]) * 100
                    print(f"  Average confidence: {avg:.2f}%")
                print(f"  Output directory: {doc_dir}")
                print("=" * 70 + "\n")
            else:
                for res in results:
                    print(res["text"])
                print(f"\n✓ Saved results to {doc_dir}")
    except Exception as e:
        print(f"\n❌ Error: {e}")
        if args.verbose:
            import traceback

            traceback.print_exc()


def run_streaming_inference(ocr, image, args, output_dir: Path) -> None:
    """Character streaming to stdout (reference cli.py:163-222)."""
    print(f"Processing {image} (streaming)...\n")
    full_text_parts = []
    current_region = 0
    for chunk in ocr.extract_text_stream_chars(image, mode=args.mode):
        if chunk.get("region_start"):
            if current_region:
                sys.stdout.write("\n")
            current_region = chunk["region_number"]
            continue
        token = chunk.get("token", "")
        if token:
            sys.stdout.write(token)
            sys.stdout.flush()
            time.sleep(0.002)
        if chunk.get("document_finished"):
            full_text_parts.append(chunk.get("cumulative_text", ""))
    sys.stdout.write("\n")
    text = full_text_parts[-1] if full_text_parts else ""
    if len(args.image) > 1:
        output_dir = output_dir / Path(image).stem
        output_dir.mkdir(exist_ok=True, parents=True)
    (output_dir / "extracted_text.txt").write_text(text, encoding="utf-8")
    print(f"\n✓ Saved to {output_dir / 'extracted_text.txt'}")


# ---------------------------------------------------------------------------
# Reference config-file spellings for architecture knobs (its CLI flag
# names with dashes->underscores, kiri_ocr/cli.py:245-259).
_REF_CFG_ALIASES = {
    "encoder_dim": "enc_dim", "encoder_layers": "enc_layers",
    "encoder_heads": "enc_heads", "encoder_ffn_dim": "enc_ff",
    "decoder_dim": "dec_dim", "decoder_layers": "dec_layers",
    "decoder_heads": "dec_heads", "decoder_ffn_dim": "dec_ff",
}
# Config-file keys outside DEFAULT_TRAIN_CONFIG that the reference honors
# (paths, data sources, resume — kiri_ocr/cli.py:9-27 init template). They
# fill in only when the CLI flag was not given, matching the reference's
# "CLI overrides when not None" rule.
_CFG_PASSTHROUGH = (
    "train_labels", "val_labels", "vocab", "from_model", "resume",
    "device", "hf_dataset", "hf_subset", "hf_val_split", "hf_streaming")


def run_train(args) -> None:
    from .config import CFG
    from .data.datasets import load_hf_dataset, load_local_dataset
    from .tokenizer import CharTokenizer, build_vocab_from_texts
    from .train.trainer import TrainConfig, train_loop

    file_cfg = load_config_file(args.config) if args.config else None
    if file_cfg:
        file_cfg = {_REF_CFG_ALIASES.get(k, k): v for k, v in file_cfg.items()}
        # A YAML scalar is the natural way to write one dataset id; the CLI
        # flag is nargs="+", so normalize to a list.
        if isinstance(file_cfg.get("hf_dataset"), str):
            file_cfg["hf_dataset"] = [file_cfg["hf_dataset"]]
        for k in _CFG_PASSTHROUGH:
            if k in file_cfg and getattr(args, k, None) in (None, False):
                setattr(args, k, file_cfg[k])
    merged = merge_config(
        DEFAULT_TRAIN_CONFIG, file_cfg,
        {k: getattr(args, k, None) for k in DEFAULT_TRAIN_CONFIG})

    cfg = CFG(IMG_H=merged["height"], IMG_W=merged["width"],
              ENC_DIM=merged["enc_dim"], ENC_LAYERS=merged["enc_layers"],
              ENC_HEADS=merged["enc_heads"], ENC_FF=merged["enc_ff"],
              DEC_DIM=merged["dec_dim"], DEC_LAYERS=merged["dec_layers"],
              DEC_HEADS=merged["dec_heads"], DEC_FF=merged["dec_ff"],
              DROPOUT=merged["dropout"], MAX_DEC_LEN=merged["max_seq_len"])

    if args.train_labels:
        train_set = load_local_dataset(args.train_labels, cfg.IMG_H,
                                       cfg.IMG_W, augment=True)
        if args.val_labels:
            val_set = load_local_dataset(args.val_labels, cfg.IMG_H, cfg.IMG_W)
        else:
            n_val = max(1, len(train_set) // 20)
            val_set = [train_set[i] for i in range(n_val)]
    elif args.hf_dataset:
        train_set, val_set = load_hf_dataset(
            args.hf_dataset, args.hf_image_col, args.hf_text_col,
            cfg.IMG_H, cfg.IMG_W, augment=True,
            val_ratio=args.hf_val_percent, subset=args.hf_subset,
            train_split=args.hf_train_split, val_split=args.hf_val_split,
            streaming=args.hf_streaming)
    else:
        print("❌ Error: --train-labels or --hf-dataset is required")
        sys.exit(1)

    out_dir = Path(merged["output_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)
    vocab_path = args.vocab
    if not vocab_path:
        vocab_path = str(out_dir / "vocab.json")
        if not Path(vocab_path).exists():
            print("🔤 Building vocabulary from training texts...")
            texts = (train_set[i]["text"] for i in range(len(train_set)))
            build_vocab_from_texts(texts, vocab_path)
    tok = CharTokenizer(vocab_path, cfg)

    tc = TrainConfig(
        epochs=merged["epochs"], batch_size=merged["batch_size"],
        lr=merged["lr"], weight_decay=merged["weight_decay"],
        ctc_weight=merged["ctc_weight"], dec_weight=merged["dec_weight"],
        max_seq_len=merged["max_seq_len"], save_steps=merged["save_steps"],
        out_dir=str(out_dir), n_devices=args.n_devices,
        model_parallel=args.model_parallel,
        select_metric=args.select_metric, train_only=args.train_only,
        dec_input_noise=args.dec_input_noise)

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    train_samples = [train_set[i] for i in range(len(train_set))]
    val_samples = ([val_set[i] for i in range(len(val_set))]
                   if not isinstance(val_set, list) else val_set)
    # Resume is opt-in like the reference (cli.py:389-390); our library-level
    # train_loop keeps resume-if-latest-exists as its default.
    train_loop(cfg, tok, tc, train_samples, val_samples,
               vocab_path=vocab_path, from_model=args.from_model,
               resume=args.resume)


def run_generate(args) -> None:
    from .data.synth import DatasetGenerator, MultilingualDatasetGenerator

    khmer_ratio = args.khmer_ratio
    if args.language and not khmer_ratio:
        khmer_ratio = {"english": 0.0, "khmer": 1.0, "mixed": 0.5}[args.language]
    cls = MultilingualDatasetGenerator if khmer_ratio > 0 else DatasetGenerator
    kwargs = {"khmer_ratio": khmer_ratio} if khmer_ratio > 0 else {}
    gen = cls(args.output, height=args.height,
              augment=not args.no_augment, fonts_dir=args.fonts_dir,
              max_width=args.width, **kwargs)

    # A --train-file always produces the reference layout (train/ + val/
    # splits, per-line augment counts, font-mode — generator.py:312-454) so
    # downstream scripts written against the reference find the same files.
    if args.train_file:
        out = gen.generate_from_files(
            args.train_file, val_file=args.val_file,
            train_augment=args.augment, val_augment=args.val_augment,
            font_mode=args.font_mode, random_augment=args.random_augment)
        print(f"✓ Generated dataset -> {out}")
        return

    # Random-text mode (no reference equivalent): flat images/ + labels.txt.
    labels = gen.generate_dataset(args.num_samples, append=args.append)
    print(f"✓ Generated {args.num_samples} samples -> {labels}")


def _parse_lang_spec(spec):
    """Reference 'lang:path,lang:path' syntax (detector/craft/dataset.py:
    767-779) -> list of paths; a plain existing path passes through."""
    if not spec:
        return []
    if Path(spec).exists():
        return [spec]
    out = []
    for item in spec.split(","):
        _, _, path = item.rpartition(":")
        if path.strip():
            out.append(path.strip())
    return out


def run_generate_detector(args) -> None:
    from .data.docsynth import generate_detector_dataset
    from .data.synth import FontManager

    texts = None
    for tf in _parse_lang_spec(args.text_file):
        lines = [l.strip() for l in
                 Path(tf).read_text(encoding="utf-8").splitlines()
                 if l.strip()]
        texts = (texts or []) + lines

    fonts = None
    if args.font:
        fonts = FontManager(font_dirs=[], sizes=(18, 22, 26, 30, 34))
        fonts.font_paths = [args.font]
        fonts.english_fonts = [args.font]
        fonts.khmer_fonts = ([args.font]
                             if fonts._supports(args.font, "កខ") else [])
    elif args.fonts_dir:
        from .data.synth import _FONT_DIRS

        dirs = _parse_lang_spec(args.fonts_dir) + list(_FONT_DIRS)
        fonts = FontManager(font_dirs=dirs, sizes=(18, 22, 26, 30, 34))

    height = args.image_height or args.image_size
    common = dict(kind=args.kind, khmer_ratio=args.khmer_ratio, texts=texts,
                  min_lines=args.min_lines, max_lines=args.max_lines,
                  augment=not args.no_augment, fonts=fonts)
    out = Path(args.output)
    generate_detector_dataset(str(out / "train"), args.num_train,
                              args.image_size, height, **common)
    generate_detector_dataset(str(out / "val"), args.num_val,
                              args.image_size, height, seed=1337, **common)
    print(f"✓ Detector dataset -> {out}")


def _parse_aug_weights(spec):
    """'rotated=3,noisy=1.5' -> {'rotated': 3.0, 'noisy': 1.5} (None if '')."""
    if not spec:
        return None
    out = {}
    for part in spec.split(","):
        name, _, val = part.partition("=")
        out[name.strip()] = float(val)
    return out


def run_train_detector(args) -> None:
    aug_weights = _parse_aug_weights(args.aug_weights)
    # Reference output layout when --name is given (craft/training.py:214-217)
    default_out = (f"runs/detect/{args.name}" if args.name
                   else ("checkpoints_db" if args.detector == "db"
                         else "checkpoints_craft"))
    steps = args.steps
    if args.epochs and args.data_yaml:
        # Count batches from the annotation index alone — loading every
        # image/GT map here would duplicate the trainer's own load.
        root = Path(args.data_yaml)
        if root.suffix in (".yaml", ".yml", ".json"):
            root = root.parent
        for cand in (root, root / "train"):
            if (cand / "annotations.json").exists():
                root = cand
                break
        n_docs = len(json.loads((root / "annotations.json").read_text()))
        n_batches = max(1, (n_docs + args.batch_size - 1) // args.batch_size)
        steps = args.epochs * n_batches
        print(f"ℹ {args.epochs} epochs x {n_batches} batches = {steps} steps")
    if args.detector == "db":
        from .detect.db.train import DBTrainConfig, train_db

        tc = DBTrainConfig(steps=steps, batch_size=args.batch_size,
                           image_size=args.image_size,
                           pool_size=args.pool_size,
                           khmer_ratio=args.khmer_ratio,
                           aug_conditions=args.aug_conditions,
                           aug_weights=aug_weights,
                           data_dir=args.data_yaml,
                           out_dir=args.output_dir or default_out)
        if args.lr:
            tc.lr = args.lr
        variables = None
        if args.from_model:
            from .detect.db import load_db_checkpoint

            variables = load_db_checkpoint(args.from_model)
        train_db(tc, variables=variables)
    else:
        from .detect.craft.train import CRAFTTrainConfig, train_craft

        tc = CRAFTTrainConfig(steps=steps, batch_size=args.batch_size,
                              image_size=args.image_size,
                              pool_size=args.pool_size,
                              khmer_ratio=args.khmer_ratio,
                              aug_conditions=args.aug_conditions,
                              aug_weights=aug_weights,
                              scale_aug=args.scale_aug,
                              data_dir=args.data_yaml,
                              out_dir=args.output_dir or default_out)
        if args.lr:
            tc.lr = args.lr
        variables = None
        if args.from_model:
            from .detect.craft import load_craft_checkpoint

            variables = load_craft_checkpoint(args.from_model)
        train_craft(tc, variables=variables)


def init_config(args) -> None:
    out = Path(args.output)
    lines = ["# Kiri-TPU training configuration",
             "# Values here override defaults; CLI flags override both.", ""]
    for k, v in DEFAULT_TRAIN_CONFIG.items():
        lines.append(f"{k}: {v}")
    out.write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(f"✓ Config written to {out}")


# ---------------------------------------------------------------------------
def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    # Bare image path -> implicit predict (reference cli.py:516-530).
    if argv and argv[0] not in _COMMANDS and not argv[0].startswith("-"):
        argv.insert(0, "predict")

    parser = _build_parser()
    args = parser.parse_args(argv)

    if args.command == "predict":
        run_inference(args)
    elif args.command == "train":
        run_train(args)
    elif args.command == "generate":
        run_generate(args)
    elif args.command == "generate-detector":
        run_generate_detector(args)
    elif args.command == "train-detector":
        run_train_detector(args)
    elif args.command == "init-config":
        init_config(args)
    else:
        parser.print_help()


if __name__ == "__main__":
    main()
