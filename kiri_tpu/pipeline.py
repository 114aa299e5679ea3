"""The OCR pipeline: detection -> batched recognition -> text assembly.

Public surface is preserved from the reference ``OCR`` class
(reference: kiri_ocr/core.py:40-1161): constructor arguments, decode-method
aliases, ``extract_text`` -> (full_text, results) with the exact result-dict
keys, ``process_document[_streaming]``, ``extract_text_stream_chars`` chunk
schema, ``recognize_region[_streaming]``, ``recognize_single_line_image``,
lazy ``detector`` property and class-level model cache.

TPU-first difference: ``process_document`` crops all detected regions and
recognizes them in batched, bucketed compiled calls (see engine.py) instead
of the reference's one-model-dispatch-per-line Python loop
(kiri_ocr/core.py:770-793, "HOT LOOP #1").
"""
from __future__ import annotations

import sys
import warnings
from pathlib import Path
from typing import Dict, Generator, List, Optional, Tuple, Union

import numpy as np

from .config import CFG
from .engine import RecognizerEngine
from .models import recognizer as R
from .ops.preprocess import (crop_region, enhance_crop, invert_if_dark,
                             preprocess_crops, preprocess_np, to_gray)
from .tokenizer import CharTokenizer
from .train.checkpoints import find_vocab_file, load_checkpoint

DecodeMethod = str

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class OCR:
    """Complete document OCR system on TPU.

    Example:
        >>> ocr = OCR(model_path='models/model.safetensors')
        >>> text, results = ocr.extract_text('document.png')
    """

    _model_cache: Dict[Tuple[str, str], Dict] = {}

    def __init__(
        self,
        model_path: str = "models/model.safetensors",
        det_model_path: Optional[str] = None,
        det_method: str = "db",
        det_conf_threshold: float = 0.5,
        padding: int = 10,
        device: str = "tpu",
        verbose: bool = False,
        decode_method: DecodeMethod = "accurate",
        use_beam_search: Optional[bool] = None,  # deprecated
        use_fp16: Optional[bool] = None,
        preprocess: str = "host",
        deskew: bool = False,
        enhance: bool = False,
        det_kwargs: Optional[Dict] = None,
        upload_bits: int = 8,
        deskew_single_resample: bool = True,
        stream_window: Optional[int] = None,
    ):
        if preprocess not in ("host", "device"):
            raise ValueError(
                f"Invalid preprocess '{preprocess}'. Choose 'host' (cv2 "
                f"resize, ships 48xW u8 tensors — wins when host->device "
                f"bandwidth is the bottleneck) or 'device' (Pallas fused "
                f"invert+resize+pad+normalize, ships raw crops — wins when "
                f"host CPU is).")
        if use_beam_search is not None:
            warnings.warn(
                "use_beam_search is deprecated. Use decode_method instead:\n"
                "  - decode_method='fast' (replaces use_beam_search=False)\n"
                "  - decode_method='accurate' (default, balanced)\n"
                "  - decode_method='beam' (replaces use_beam_search=True)",
                DeprecationWarning, stacklevel=2)
            decode_method = "beam" if use_beam_search else "fast"

        decode_method = self._normalize_decode_method(decode_method)

        self.device = device
        self.verbose = verbose
        self.padding = padding
        self.det_model_path = det_model_path
        self.det_method = det_method
        self.det_conf_threshold = det_conf_threshold
        #: Straighten skewed pages inside the detector (detect/deskew.py);
        #: boxes are mapped back to input-frame coordinates.
        self.deskew = deskew
        #: Adaptive crop cleanup for degraded captures — conditional denoise
        #: + contrast stretch, a no-op on clean pages. Host path:
        #: ops/preprocess.enhance_crop; device path: the XLA twin
        #: kernels/resize.enhance_lines.
        self.enhance = enhance
        #: Extra kwargs forwarded to TextDetector (e.g. det_db_thresh,
        #: det_map_downsample) — the constructor-kwargs surface the
        #: reference exposes on its detector classes.
        self.det_kwargs = dict(det_kwargs or {})
        #: 4 = pack two pixels per byte for recognition uploads (16 gray
        #: levels, unpacked fused on device) — halves the dominant wire
        #: cost of tunnel-fed serving at ~0.0003 CER; 8 = bit-exact.
        self.upload_bits = upload_bits
        #: When a page was deskewed, cut recognition crops straight from the
        #: ORIGINAL page with one combined rotate+scale cubic resample
        #: (detect/deskew.extract_crop_single_resample) instead of cropping
        #: the twice-interpolated deskewed frame — rotated pages then see
        #: the same interpolation count as upright ones. Applies to crops
        #: the extraction would upscale (scale >= 0.75); strong downscales
        #: keep the two-step path for its area-averaging resize.
        self.deskew_single_resample = deskew_single_resample
        #: Step-window size for INCREMENTAL character streaming: the AR
        #: streaming decoders run in resumable W-step windows (state +
        #: KV cache stay on device) and each window's chunks are emitted
        #: before the next launches, so time-to-first-char is one window
        #: rather than the page decode (matching the reference's
        #: yield-inside-the-loop behavior, kiri_ocr/model.py:779-946).
        #: None -> cfg.STREAM_WINDOW after model load; 0 disables (one-shot
        #: decode + replay, maximal throughput).
        self.stream_window = stream_window
        # Set per page by _deskew_crop_view: True when crops come from the
        # deskew-resampled frame (enables the sharpen repair).
        self._crops_resampled = False
        self.decode_method = decode_method
        self.use_fp16 = use_fp16
        self.use_beam_search = decode_method == "beam"
        self.preprocess = preprocess

        self.cfg: Optional[CFG] = None
        self.tokenizer: Optional[CharTokenizer] = None
        self.engine: Optional[RecognizerEngine] = None

        resolved = self._resolve_model_path(model_path)
        self._load_model(resolved)
        if self.stream_window is None:
            self.stream_window = self.cfg.STREAM_WINDOW
        self._detector = None

    # ------------------------------------------------------------ utilities
    def _stream_window_for(self, method: str) -> Optional[int]:
        """Streaming mode per decode method (measured on the v5e tunnel,
        32-line page, scripts/bench_streaming.py):

        - beam: WINDOWED — the one-shot loop runs to completion and then
          downloads the full [N, S, L] history (TTFC 365 ms / 45 lines/s vs
          windowed 233 ms / 62 lines/s).
        - decoder (greedy): one-shot SPECULATIVE decode, which finishes the
          whole page in ~2 teacher-forced dispatches — its TTFC (196 ms)
          beats even the FIRST window of the step loop (274 ms), so
          windowing would only delay chars. Windowed engages when
          SPEC_DECODE is off (the step loop then profits from windows).
        """
        if not self.stream_window:
            return None
        if method == "decoder" and self.cfg.SPEC_DECODE:
            return None
        return self.stream_window

    @staticmethod
    def _normalize_decode_method(method: str) -> str:
        method = method.lower().strip()
        # "auto" is a TPU-only addition (no reference equivalent): greedy
        # CTC for confident lines, beam escalation for the rest (engine.py).
        aliases = {"fast": "ctc", "ctc": "ctc", "accurate": "decoder",
                   "decoder": "decoder", "beam": "beam", "auto": "auto"}
        if method not in aliases:
            raise ValueError(
                f"Invalid decode_method '{method}'. Choose from: 'fast', "
                f"'accurate', 'beam', 'auto' (or aliases: 'ctc', 'decoder')")
        return aliases[method]

    def _resolve_model_path(self, model_path: str) -> str:
        model_file = Path(model_path)
        if model_file.exists():
            return str(model_file)
        pkg_dir = Path(__file__).parent
        for candidate in (pkg_dir / model_path,
                          pkg_dir.parent / "models" / model_file.name):
            if candidate.exists():
                return str(candidate)
        # Repo-id heuristic: "org/name" with no file extension downloads
        # from the HuggingFace hub (reference: kiri_ocr/core.py:123-131).
        if "/" in model_path and not model_file.suffix:
            downloaded = self._download_from_huggingface(model_path)
            if downloaded:
                return downloaded
        return model_path

    def _download_from_huggingface(self, repo_id: str) -> Optional[str]:
        """Fetch model + vocab from the HF hub (reference core.py:191-217).
        Returns the local model path, or None when offline/unavailable."""
        try:
            from huggingface_hub import hf_hub_download
        except Exception:
            return None
        try:
            local = None
            for fname in ("model.safetensors", "model.pt"):
                try:
                    local = hf_hub_download(repo_id=repo_id, filename=fname)
                    break
                except Exception:
                    continue
            if local is None:
                return None
            for extra in ("model_meta.json", "vocab.json", "vocab_auto.json",
                          "vocab_char.json", "config.json"):
                try:
                    hf_hub_download(repo_id=repo_id, filename=extra)
                except Exception:
                    pass
            return local
        except Exception as e:
            if self.verbose:
                print(f"HF download failed for {repo_id}: {e}")
            return None

    # --------------------------------------------------------- model loading
    def _load_model(self, model_path: str) -> None:
        cache_key = (str(model_path), self.device, self.upload_bits)
        if cache_key in OCR._model_cache:
            if self.verbose:
                print("⚡ Loading from memory cache")
            cached = OCR._model_cache[cache_key]
            self.engine = cached["engine"]
            self.cfg = cached["cfg"]
            self.tokenizer = cached["tokenizer"]
            return

        if self.verbose:
            print(f"📦 Loading OCR model from {model_path}...")

        variables, cfg, meta = load_checkpoint(model_path)
        if self.use_fp16 is not None:
            cfg = cfg.replace(USE_FP16=self.use_fp16,
                              COMPUTE_DTYPE="bfloat16" if self.use_fp16 else "float32")
        self.cfg = cfg

        vocab_path = find_vocab_file(meta.get("vocab_path", ""), model_path)
        if not vocab_path:
            raise FileNotFoundError(
                f"Could not find vocabulary file. Expected near: {model_path}")
        self.tokenizer = CharTokenizer(vocab_path, cfg)
        self.engine = RecognizerEngine(variables, cfg, self.tokenizer,
                                       upload_bits=self.upload_bits)

        if self.verbose:
            print(f"  ✓ Loaded (Vocab: {self.tokenizer.vocab_size} chars)")

        OCR._model_cache[cache_key] = {
            "engine": self.engine, "cfg": self.cfg, "tokenizer": self.tokenizer,
        }

    # -------------------------------------------------------------- detector
    @property
    def detector(self):
        if self._detector is None:
            from .detect import TextDetector

            self._detector = TextDetector(
                method=self.det_method,
                model_path=self.det_model_path,
                conf_threshold=self.det_conf_threshold,
                deskew=self.deskew,
                **self.det_kwargs)
        return self._detector

    # ------------------------------------------------------------ recognition
    def _preprocess_region(self, img: np.ndarray, box, extra_padding: int = 5):
        roi = crop_region(img, box, extra_padding)
        if roi is None:
            return None
        return preprocess_np(self.cfg, roi)

    def recognize_region(self, image_tensor) -> Tuple[str, float]:
        """Recognize one preprocessed line image (uint8 [H,W] or reference
        [1,1,H,W] float layout)."""
        img = self._coerce_input(image_tensor)
        out = self.engine.recognize_batch(img[None], self.decode_method)
        return out[0]

    def _coerce_input(self, image_tensor) -> np.ndarray:
        arr = np.asarray(image_tensor)
        if arr.ndim == 4:  # [1, 1, H, W] normalized float (reference layout)
            arr = arr[0, 0]
        if arr.dtype != np.uint8:
            arr = np.clip((arr * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
        return arr

    def recognize_region_streaming(self, image_tensor,
                                   decode_method: Optional[str] = None
                                   ) -> Generator[Dict, None, None]:
        img = self._coerce_input(image_tensor)
        method = (self._normalize_decode_method(decode_method)
                  if decode_method is not None else self.decode_method)
        yield from self.engine.stream_records(
            img, method, window=self._stream_window_for(method))

    def recognize_streaming(self, image_path, decode_method: Optional[str] = None
                            ) -> Generator[Dict, None, None]:
        img = self._load_gray(image_path)
        img = invert_if_dark(img)
        yield from self.recognize_region_streaming(
            preprocess_np(self.cfg, img), decode_method)

    def recognize_single_line_image(self, image_path) -> Tuple[str, float]:
        img = self._load_gray(image_path)
        img = invert_if_dark(img)
        return self.recognize_region(preprocess_np(self.cfg, img))

    def _load_gray(self, image_path) -> np.ndarray:
        if isinstance(image_path, np.ndarray):
            # In-memory page (every document entry point accepts arrays,
            # like the detector facade does).
            return to_gray(image_path)
        img = cv2.imread(str(image_path))
        if img is None:
            raise ValueError(f"Could not load image: {image_path}")
        return to_gray(img)

    # ------------------------------------------------------ document pipeline
    def _detect_boxes(self, image_path, mode: str):
        if mode == "lines":
            text_boxes = self.detector.detect_lines_objects(image_path)
            boxes = [b.bbox for b in text_boxes]
            det_confs = [b.confidence for b in text_boxes]
        else:
            boxes = self.detector.detect_words(image_path)
            det_confs = [1.0] * len(boxes)
        return boxes, det_confs

    def process_document(self, image_path, mode: str = "lines",
                         verbose: bool = False) -> List[Dict]:
        """Detect + recognize; returns the reference result-dict list
        (box, text, confidence, det_confidence, line_number)."""
        from .utils.profiling import StageTimer

        timer = StageTimer()
        if verbose:
            print(f"\n📄 Processing: {image_path}")
            print(f"🔲 Box padding: {self.padding}px")
        with timer.stage("detect"):
            boxes, det_confs = self._detect_boxes(image_path, mode)
        if verbose:
            print(f"🔍 Detected {len(boxes)} regions")

        img_gray = self._load_gray(image_path)
        recognized, kept = self._recognize_regions(img_gray, boxes, timer)

        results = []
        for row, bi in enumerate(kept):
            text, confidence = recognized[row]
            results.append({
                "box": [int(v) for v in boxes[bi]],
                "text": text,
                "confidence": float(confidence),
                "det_confidence": float(det_confs[bi]),
                "line_number": bi + 1,
            })
            if verbose:
                print(f"  {bi + 1:2d}. {text[:50]:50s} ({confidence * 100:.1f}%)")
        if verbose:
            print("⏱ Stage timing:")
            print(timer.report())
        return results

    def _deskew_crop_view(self, img_gray, boxes):
        """(crop_img, crop_boxes) to cut line crops from.

        When the detector deskewed this page (deskew=True and the skew
        fired), recognition must crop from the DESKEWED frame: a 2-6 deg
        skewed crop costs the recognizer ~60x CER (measured — it is trained
        on upright lines). The facade keeps the deskewed page and its
        frame's boxes 1:1 with the input-frame boxes it returned; reported
        result boxes always stay in input-frame coordinates.
        """
        det = self._detector
        if (self.deskew and det is not None
                and getattr(det, "last_deskew_boxes", None)
                and len(det.last_deskew_boxes) == len(boxes)):
            # Provenance note for enhance_crop: these crops went through the
            # deskew bilinear resample, so the sharpen repair applies.
            self._crops_resampled = True
            return (det.last_deskewed_image,
                    [b.bbox for b in det.last_deskew_boxes])
        self._crops_resampled = False
        return img_gray, boxes

    def _cut_crops(self, img_gray, boxes, extra_padding: int = 5):
        """Cut grayscale recognition crops for input-frame ``boxes``.

        Returns (crops, kept, sharpen): uint8 crops, the original box
        indices they came from, and a per-crop bool list — True when the
        crop was cut from the twice-interpolated deskewed frame (so
        ``enhance_crop``'s resample-repair unsharp applies).

        When the detector deskewed the page and ``deskew_single_resample``
        is on, crops are sampled straight from the ORIGINAL page with one
        combined rotate+scale cubic warp at model height — those rows skip
        the second interpolation entirely and get sharpen=False. Crops the
        warp would downscale hard (or when cv2 is missing) fall back to the
        two-step path per-crop.

        With ``enhance`` on, a NOISY rotated page (sigma > the shared
        NOISE_SIGMA_THRESH gate) is despiked once at native scale — lazily,
        on the first crop that actually takes the warp path — and warped
        with LINEAR interpolation: the same treatment upright noisy crops
        get (despike-then-linear-resize). The default cubic warp smears
        salt-and-pepper impulses into blobs the crop-level despike can't
        catch and re-crisps gaussian noise, which made rotated+noisy pages
        ~2.3x worse than noisy alone end-to-end. Crops the warp rejects
        (strong downscale) fall back to a deskewed view RE-DERIVED from the
        despiked page (also lazy), so both crop paths see the same despiked
        pixels. Clean pages are untouched (the sigma gate fails, path is
        bit-identical).
        """
        from .detect.deskew import extract_crop_single_resample

        crop_img, crop_boxes = self._deskew_crop_view(img_gray, boxes)
        crops: List[np.ndarray] = []
        kept: List[int] = []
        sharpen: List[bool] = []
        angle = 0.0
        fill = None
        warp_interp = None
        noise_gate = False
        if self._crops_resampled and self.deskew_single_resample:
            angle = float(getattr(self._detector, "last_deskew_angle", 0.0))
        if angle and self.enhance:
            try:
                import cv2 as _cv2

                from .ops.preprocess import (NOISE_SIGMA_THRESH,
                                             estimate_noise_sigma)

                if estimate_noise_sigma(img_gray) > NOISE_SIGMA_THRESH:
                    noise_gate = True
                    warp_interp = _cv2.INTER_LINEAR
            except ImportError:  # no cv2: warp path is skipped anyway
                pass
        # Lazy per-page derived views (computed at most once each, and only
        # when some crop actually needs them — ADVICE r3 #1/#2).
        lazy: Dict[str, np.ndarray] = {}

        def _warp_src() -> np.ndarray:
            if "warp" not in lazy:
                if noise_gate:
                    from .ops.preprocess import _despike

                    lazy["warp"] = np.clip(
                        _despike(img_gray.astype(np.float32)),
                        0.0, 255.0).astype(np.uint8)
                else:
                    lazy["warp"] = img_gray
            return lazy["warp"]

        def _fallback_view() -> np.ndarray:
            # Deskewed frame for warp-rejected crops. On noisy pages the
            # detector's frame was bilinear-rotated from the UN-despiked
            # original (smeared impulses); re-derive it from the despiked
            # page so fallback crops get the same treatment.
            if not noise_gate:
                return crop_img
            if "fb" not in lazy:
                from .detect.deskew import rotate_image

                lazy["fb"] = rotate_image(_warp_src(), -angle)
            return lazy["fb"]

        for i, box in enumerate(crop_boxes):
            roi = None
            resampled = self._crops_resampled
            if angle:
                if fill is None:
                    fill = int(np.median(img_gray))
                roi = extract_crop_single_resample(
                    _warp_src(), angle, box, self.cfg.IMG_H,
                    extra_padding=extra_padding, fill=fill,
                    interp=warp_interp)
                if roi is not None:
                    resampled = False
            if roi is None:
                roi = crop_region(_fallback_view() if angle else crop_img,
                                  box, extra_padding)
            if roi is None:
                continue
            crops.append(to_gray(roi))
            kept.append(i)
            sharpen.append(resampled)
        return crops, kept, sharpen

    def _recognize_regions(self, img_gray, boxes, timer=None):
        """Crop + preprocess + recognize all regions, honoring the
        constructor's ``preprocess`` option on every document entry point.
        Returns (recognized [(text, conf)], kept [original box indices])."""
        from .utils.profiling import StageTimer

        timer = timer or StageTimer()
        if self.preprocess == "device":
            # Pallas path: ship raw crops; invert+resize+pad+normalize run
            # fused on-chip (kernels/resize.py).
            with timer.stage("preprocess"):
                crops, kept, sharpen = self._cut_crops(img_gray, boxes)
            with timer.stage("recognize"):
                recognized = self.engine.recognize_crops(
                    crops, self.decode_method, enhance=self.enhance,
                    sharpen=np.asarray(sharpen, bool))
        else:
            with timer.stage("preprocess"):
                crops, kept, sharpen = self._cut_crops(img_gray, boxes)
                batch, widths = preprocess_crops(
                    self.cfg, crops, enhance=self.enhance, sharpen=sharpen)
            with timer.stage("recognize"):
                recognized = self.engine.recognize_batch(
                    batch, self.decode_method, widths=widths)
        return recognized, kept

    def process_document_streaming(self, image_path, mode: str = "lines",
                                   verbose: bool = False
                                   ) -> Generator[Dict, None, None]:
        """Region-at-a-time result streaming. Recognition still runs batched
        up front (TPU), results are yielded in reading order."""
        if verbose:
            print(f"\n📄 Processing (streaming): {image_path}")
            print(f"🔲 Box padding: {self.padding}px")
        boxes, det_confs = self._detect_boxes(image_path, mode)
        total_regions = len(boxes)
        if verbose:
            print(f"🔍 Detected {total_regions} regions")

        img_gray = self._load_gray(image_path)
        recognized, kept = self._recognize_regions(img_gray, boxes)
        by_index = {bi: rec for bi, rec in zip(kept, recognized)}

        for i, (box, det_conf) in enumerate(zip(boxes, det_confs), 1):
            if (i - 1) not in by_index:
                continue
            text, confidence = by_index[i - 1]
            result = {
                "box": [int(v) for v in box],
                "text": text,
                "confidence": float(confidence),
                "det_confidence": float(det_conf),
                "line_number": i,
                "total_regions": total_regions,
            }
            if verbose:
                print(f"  {i:2d}. {text[:50]:50s} ({confidence * 100:.1f}%)")
            yield result

    def extract_text_stream_chars(self, image_path, mode: str = "lines",
                                  decode_method: Optional[str] = None,
                                  verbose: bool = False,
                                  batched: bool = True
                                  ) -> Generator[Dict, None, None]:
        """LLM-style character streaming with the reference chunk schema
        (kiri_ocr/core.py:887-1026).

        batched=True (TPU default): ALL regions decode in one compiled call
        with per-step history recorded on device, then chunks replay in
        reading order — identical schema and content at batched throughput.
        batched=False preserves the reference's region-at-a-time compute.

        Note: char streaming always preprocesses on host — the per-step
        history decode needs the width metadata host preprocessing produces;
        the constructor's ``preprocess='device'`` option applies to
        process_document / process_document_streaming / extract_text.
        """
        if verbose:
            print(f"\n📄 Processing (char streaming): {image_path}")
        boxes, det_confs = self._detect_boxes(image_path, mode)
        total_regions = len(boxes)
        if verbose:
            print(f"🔍 Detected {total_regions} regions")

        img_gray = self._load_gray(image_path)
        all_region_texts: List[str] = []

        if batched and total_regions > 1:
            yield from self._stream_chars_batched(
                img_gray, boxes, det_confs, decode_method, verbose)
            return

        crops, kept, sharpen = self._cut_crops(img_gray, boxes)
        by_idx = {bi: (c, sh) for bi, c, sh in zip(kept, crops, sharpen)}
        for region_num, (box, det_conf) in enumerate(zip(boxes, det_confs), 1):
            try:
                entry = by_idx.get(region_num - 1)
                if entry is None:
                    continue
                roi, roi_sharpen = entry
                if self.enhance:
                    roi = enhance_crop(invert_if_dark(to_gray(roi)),
                                       sharpen=roi_sharpen)
                region_img = preprocess_np(self.cfg, roi)

                yield {
                    "token": "", "text": "",
                    "cumulative_text": "\n".join(all_region_texts),
                    "region_number": region_num,
                    "total_regions": total_regions,
                    "step": 0, "region_finished": False,
                    "document_finished": False, "region_start": True,
                    "box": [int(v) for v in box],
                    "det_confidence": float(det_conf),
                }

                current_region_text = ""
                for chunk in self.recognize_region_streaming(region_img, decode_method):
                    current_region_text = chunk["text"]
                    temp = all_region_texts + (
                        [current_region_text] if current_region_text else [])
                    yield {
                        "token": chunk["token"],
                        "text": current_region_text,
                        "cumulative_text": "\n".join(temp),
                        "region_number": region_num,
                        "total_regions": total_regions,
                        "step": chunk["step"],
                        "confidence": chunk["confidence"],
                        "region_finished": chunk["finished"],
                        "document_finished": chunk["finished"]
                        and region_num == total_regions,
                        "region_start": False,
                        "box": [int(v) for v in box],
                        "det_confidence": float(det_conf),
                    }
                    if chunk["finished"]:
                        break

                if current_region_text:
                    all_region_texts.append(current_region_text)
                if verbose:
                    print(f"  {region_num:2d}. {current_region_text[:50]}")
            except Exception as e:
                if verbose:
                    print(f"  {region_num:2d}. [Error: {e}]")
                yield {
                    "token": "", "text": "",
                    "cumulative_text": "\n".join(all_region_texts),
                    "region_number": region_num,
                    "total_regions": total_regions,
                    "step": 0, "region_finished": True,
                    "document_finished": region_num == total_regions,
                    "region_start": True,
                    "box": [int(v) for v in box],
                    "error": str(e),
                }

    def _stream_chars_batched(self, img_gray, boxes, det_confs,
                              decode_method: Optional[str],
                              verbose: bool) -> Generator[Dict, None, None]:
        """One compiled decode for the whole page, then chunk replay."""
        method = (self._normalize_decode_method(decode_method)
                  if decode_method is not None else self.decode_method)
        total_regions = len(boxes)
        crops, kept, sharpen = self._cut_crops(img_gray, boxes)
        batch, _ = preprocess_crops(self.cfg, crops, enhance=self.enhance,
                                    sharpen=sharpen)
        record_lists = self.engine.stream_records_batch(
            batch, method, window=self._stream_window_for(method))
        by_index = {bi: recs for bi, recs in zip(kept, record_lists)}

        all_region_texts: List[str] = []
        for region_num, (box, det_conf) in enumerate(zip(boxes, det_confs), 1):
            recs = by_index.get(region_num - 1)
            if recs is None:
                continue
            yield {
                "token": "", "text": "",
                "cumulative_text": "\n".join(all_region_texts),
                "region_number": region_num,
                "total_regions": total_regions,
                "step": 0, "region_finished": False,
                "document_finished": False, "region_start": True,
                "box": [int(v) for v in box],
                "det_confidence": float(det_conf),
            }
            current_region_text = ""
            for chunk in recs:
                current_region_text = chunk["text"]
                temp = all_region_texts + (
                    [current_region_text] if current_region_text else [])
                yield {
                    "token": chunk["token"],
                    "text": current_region_text,
                    "cumulative_text": "\n".join(temp),
                    "region_number": region_num,
                    "total_regions": total_regions,
                    "step": chunk["step"],
                    "confidence": chunk["confidence"],
                    "region_finished": chunk["finished"],
                    "document_finished": chunk["finished"]
                    and region_num == total_regions,
                    "region_start": False,
                    "box": [int(v) for v in box],
                    "det_confidence": float(det_conf),
                }
                if chunk["finished"]:
                    break
            if current_region_text:
                all_region_texts.append(current_region_text)
            if verbose:
                print(f"  {region_num:2d}. {current_region_text[:50]}")

    def extract_text_streaming(self, image_path, mode: str = "lines",
                               verbose: bool = False
                               ) -> Generator[Dict, None, None]:
        """Per-region streaming with cumulative text assembly
        (kiri_ocr/core.py:1028-1102)."""
        lines: List[str] = []
        current_line: List[str] = []
        prev_center_y = None
        prev_height = None

        for result in self.process_document_streaming(image_path, mode, verbose):
            if "error" not in result and result["text"]:
                y, h = result["box"][1], result["box"][3]
                center_y = y + h / 2
                if prev_center_y is not None:
                    tolerance = max(h, prev_height) * 0.8
                    if abs(center_y - prev_center_y) < tolerance:
                        current_line.append(result["text"])
                    else:
                        if current_line:
                            lines.append(" ".join(current_line))
                        current_line = [result["text"]]
                else:
                    current_line = [result["text"]]
                prev_center_y = center_y
                prev_height = h

            temp_lines = lines.copy()
            if current_line:
                temp_lines.append(" ".join(current_line))
            result["cumulative_text"] = "\n".join(temp_lines)
            yield result

    @staticmethod
    def _assemble_text(results: List[Dict],
                       group_boxes: Optional[List] = None) -> str:
        """Join region texts into document text; regions whose vertical
        centers fall within 80% of max height share a line
        (kiri_ocr/core.py:1135-1161).

        ``group_boxes`` (optional, aligned with ``results``) supplies the
        GROUPING geometry when it differs from the reported boxes: on a
        deskewed page the reported input-frame boxes are axis-aligned hulls
        whose heights grow ~width*sin(angle), which merges adjacent text
        lines into one space-joined group — the deskewed-frame twins keep
        the upright-page grouping behavior.
        """
        lines: List[str] = []
        current_line: List[str] = []
        prev_center_y = None
        prev_height = None
        for i, res in enumerate(results):
            if group_boxes is not None and group_boxes[i] is not None:
                y, h = group_boxes[i][1], group_boxes[i][3]
            else:
                y, h = res["box"][1], res["box"][3]
            center_y = y + h / 2
            if prev_center_y is not None:
                tolerance = max(h, prev_height) * 0.8
                if abs(center_y - prev_center_y) < tolerance:
                    current_line.append(res["text"])
                else:
                    lines.append(" ".join(current_line))
                    current_line = [res["text"]]
            else:
                current_line = [res["text"]]
            prev_center_y = center_y
            prev_height = h
        if current_line:
            lines.append(" ".join(current_line))
        return "\n".join(lines)

    def extract_text(self, image_path, mode: str = "lines",
                     verbose: bool = False) -> Tuple[str, List[Dict]]:
        """Full-document text extraction; line grouping joins regions whose
        vertical centers fall within 80% of max height
        (kiri_ocr/core.py:1104-1161)."""
        results = self.process_document(image_path, mode, verbose=verbose)
        if not results:
            return "", results
        return (self._assemble_text(results, self._group_boxes_for(results)),
                results)

    def _group_boxes_for(self, results: List[Dict]) -> Optional[List]:
        """Deskewed-frame grouping twins for ``results`` (by line_number),
        or None when the page wasn't deskewed. Reads the detector's
        per-page state, so call before processing another page."""
        det = self._detector
        if not (self.deskew and det is not None
                and getattr(det, "last_deskew_boxes", None)):
            return None
        return self._align_twins(
            [b.bbox for b in det.last_deskew_boxes], results)

    @staticmethod
    def _align_twins(twins: Optional[List], results: List[Dict]
                     ) -> Optional[List]:
        """Align a page's deskewed-frame bbox list (indexed by detected box)
        with its result rows (indexed by line_number - 1)."""
        if twins is None:
            return None
        out = []
        for res in results:
            bi = res.get("line_number", 0) - 1
            out.append(twins[bi] if 0 <= bi < len(twins) else None)
        return out

    # ------------------------------------------------- multi-document batch
    def process_documents(self, image_paths, mode: str = "lines",
                          verbose: bool = False) -> List[List[Dict]]:
        """Batched multi-page pipeline: detect each page, then recognize the
        regions of EVERY page in one pooled width-bucketed pass.

        The reference has no multi-document API — it runs one eager decode
        per region of one page at a time (kiri_ocr/core.py:770-793). On TPU
        the chip's throughput comes from batch size and each dispatch/fetch
        pays a fixed link round-trip, so pooling all pages' regions into one
        ``recognize_batch`` amortizes both across the whole stack of pages.
        Returns one ``process_document``-style result list per input path.
        """
        # Detection runs as grouped batched dispatches (facade
        # iter_lines_objects_batch) — serial per-page detection is the
        # dominant cost of pooled multi-page OCR on a link-bound host —
        # and pages are consumed AS THEIR MAPS LAND, so this loop's CPU
        # work (gray load, deskew crop view, crop preprocessing) runs
        # under the remaining detection transfers.
        image_paths = list(image_paths)
        n_docs = len(image_paths)

        def _prep_page(di, boxes, det_confs):
            """Per-page CPU work; fills the per-doc slots."""
            image_path = image_paths[di]
            img_gray = self._load_gray(image_path)
            crops, kept, sharpen = self._cut_crops(img_gray, boxes)
            if self.preprocess == "device":
                doc_pool[di] = (crops, sharpen)
            else:
                batch, widths = preprocess_crops(
                    self.cfg, crops, enhance=self.enhance, sharpen=sharpen)
                doc_pool[di] = (batch, widths) if len(kept) else None
            pool_kept[di] = kept
            per_doc[di] = (boxes, det_confs, len(kept))
            det = self._detector
            if (self.deskew and det is not None
                    and getattr(det, "last_deskew_boxes", None)):
                doc_twins[di] = [b.bbox for b in det.last_deskew_boxes]
            if verbose:
                print(f"🔍 {image_path}: {len(boxes)} regions")

        per_doc: List = [None] * n_docs   # (boxes, det_confs, n_rows)
        pool_kept: List = [None] * n_docs
        doc_twins: List = [None] * n_docs  # deskewed-frame grouping bboxes
        doc_pool: List = [None] * n_docs  # host: (batch, widths) | device:
        #                                   (crops, resampled) | None
        done = False
        if mode == "lines":
            # Only the detector iteration sits inside the try: a
            # _prep_page bug must propagate (it would fail identically on
            # the serial path), not get mislabeled as a detection failure
            # and silently disable pooled detection forever.
            det_iter = self.detector.iter_lines_objects_batch(image_paths)
            while True:
                try:
                    di, tbs = next(det_iter)
                except StopIteration:
                    done = True
                    break
                except Exception as e:
                    print(f"Batched detection failed: {e}. "
                          f"Falling back to per-page detection.")
                    break
                st = self.detector.last_batch_state[di]
                # Restore this page's deskew artifacts for the crops.
                self.detector.last_deskewed_image = st[0]
                self.detector.last_deskew_boxes = st[1]
                self.detector.last_deskew_angle = st[2]
                _prep_page(di, [b.bbox for b in tbs],
                           [b.confidence for b in tbs])
        if not done:
            for di, image_path in enumerate(image_paths):
                boxes, det_confs = self._detect_boxes(image_path, mode)
                _prep_page(di, boxes, det_confs)

        pool_batches, pool_widths, pool_crops, pool_resampled = [], [], [], []
        for entry in doc_pool:
            if entry is None:
                continue
            if self.preprocess == "device":
                pool_crops.extend(entry[0])
                pool_resampled.extend(entry[1])
            else:
                pool_batches.append(entry[0])
                pool_widths.append(entry[1])

        if self.preprocess == "device":
            recognized = self.engine.recognize_crops(
                pool_crops, self.decode_method, enhance=self.enhance,
                sharpen=np.asarray(pool_resampled, bool))
        elif pool_batches:
            recognized = self.engine.recognize_batch(
                np.concatenate(pool_batches),
                self.decode_method,
                widths=np.concatenate(pool_widths))
        else:
            recognized = []

        all_results: List[List[Dict]] = []
        row = 0
        for (boxes, det_confs, n_rows), kept in zip(per_doc, pool_kept):
            results = []
            for bi in kept:
                text, confidence = recognized[row]
                row += 1
                results.append({
                    "box": [int(v) for v in boxes[bi]],
                    "text": text,
                    "confidence": float(confidence),
                    "det_confidence": float(det_confs[bi]),
                    "line_number": bi + 1,
                })
            all_results.append(results)
        # Deskewed-frame grouping geometry for extract_text_batch (aligned
        # with all_results; None for upright pages).
        self._last_batch_twins = doc_twins
        return all_results

    def extract_text_batch(self, image_paths, mode: str = "lines",
                           verbose: bool = False
                           ) -> List[Tuple[str, List[Dict]]]:
        """``extract_text`` over many documents with one pooled recognition
        pass (see ``process_documents``)."""
        docs = self.process_documents(image_paths, mode, verbose=verbose)
        twins = getattr(self, "_last_batch_twins", None) or [None] * len(docs)
        return [(self._assemble_text(res, self._align_twins(tw, res))
                 if res else "", res)
                for res, tw in zip(docs, twins)]
