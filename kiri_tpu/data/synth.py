"""Synthetic text-line image generation for recognizer training & benchmarks.

Capability parity with the reference generator (kiri_ocr/generator.py:18-537):
font pools with per-script routing and tofu-glyph detection, randomized font
sizes, photometric/geometric augmentation (noise, blur, morphology,
brightness), labels.txt output with resume/append, and a multilingual text
sampler. The implementation is new: augmentations are vectorized numpy (the
reference loops per-pixel via PIL filters), and rendering targets the exact
uint8 [H, W] tensors the TPU pipeline consumes.
"""
from __future__ import annotations

import json
import random
import string
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from .pseudofont import (is_pseudo_path, load_pseudo_font,
                         pseudo_font_paths)

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

_FONT_DIRS = [
    "/usr/share/fonts/truetype",
    "/usr/share/fonts",
    "/usr/local/share/fonts",
]
_KHMER_RANGE = (0x1780, 0x17FF)


def _is_khmer(text: str) -> bool:
    return any(_KHMER_RANGE[0] <= ord(c) <= _KHMER_RANGE[1] for c in text)


class FontManager:
    """Discovers system fonts and routes text to fonts that can render it.

    Mirrors the reference FontManager's tofu detection
    (kiri_ocr/generator.py:118-164): a font is accepted for a script only if
    rendering a probe string produces non-blank, distinct glyphs.
    """

    def __init__(self, font_dirs: Optional[Sequence[str]] = None,
                 sizes: Sequence[int] = (24, 28, 32, 36, 40, 44),
                 allow_pseudo: bool = True):
        self.sizes = list(sizes)
        # font_dirs=[] means "no discovery" (single-font callers); only
        # None falls back to the system search path.
        self.font_paths = self._discover(
            font_dirs if font_dirs is not None else _FONT_DIRS)
        self._cache: Dict[Tuple[str, int], ImageFont.FreeTypeFont] = {}
        self.english_fonts = [p for p in self.font_paths
                              if self._supports(p, "Ag1")]
        self.khmer_fonts = [p for p in self.font_paths
                            if self._supports(p, "កខ")]
        # No Khmer-capable TTF on this host: fall back to the deterministic
        # procedural glyph pool so the bilingual paths stay trainable
        # (see pseudofont.py; reference ships real Khmer TTFs instead).
        if allow_pseudo and not self.khmer_fonts:
            self.khmer_fonts = pseudo_font_paths()
            self.font_paths = self.font_paths + self.khmer_fonts

    @staticmethod
    def _discover(dirs: Sequence[str]) -> List[str]:
        out = []
        for d in dirs:
            p = Path(d)
            if p.exists():
                out.extend(str(f) for f in p.rglob("*.ttf"))
                out.extend(str(f) for f in p.rglob("*.otf"))
        return sorted(set(out))

    def get(self, path: str, size: int) -> ImageFont.FreeTypeFont:
        key = (path, size)
        if key not in self._cache:
            if is_pseudo_path(path):
                self._cache[key] = load_pseudo_font(path, size)
            else:
                self._cache[key] = ImageFont.truetype(path, size)
        return self._cache[key]

    def _supports(self, path: str, probe: str) -> bool:
        """Tofu check: each probe char must render non-blank and differ from
        the .notdef box (detected as identical renders for distinct chars)."""
        try:
            font = self.get(path, 32)
        except Exception:
            return False
        renders = []
        for ch in probe:
            img = Image.new("L", (64, 64), 0)
            ImageDraw.Draw(img).text((4, 4), ch, fill=255, font=font)
            arr = np.asarray(img)
            if arr.max() == 0:  # blank -> unsupported
                return False
            renders.append(arr)
        for i in range(len(renders) - 1):
            if np.array_equal(renders[i], renders[i + 1]):
                return False  # same tofu box for different chars
        return True

    def pick(self, text: str, rng: random.Random) -> Optional[Tuple[str, int]]:
        pool = self.khmer_fonts if _is_khmer(text) else self.english_fonts
        if not pool:
            pool = self.font_paths
        if not pool:
            return None
        return rng.choice(pool), rng.choice(self.sizes)


class ImageRenderer:
    """Renders one text line to a uint8 grayscale image with augmentation."""

    def __init__(self, height: int = 48, pad: int = 8, augment: bool = True):
        self.height = height
        self.pad = pad
        self.augment = augment

    def render(self, text: str, font: ImageFont.FreeTypeFont,
               rng: random.Random) -> np.ndarray:
        bbox = font.getbbox(text)
        tw = max(1, bbox[2] - bbox[0])
        th = max(1, bbox[3] - bbox[1])
        # Crop jitter: detector crops at inference have variable margins
        # (smart padding + 5px recognizer padding), so train with per-side
        # margin jitter instead of a fixed frame.
        if self.augment:
            pl, pr = rng.randint(1, 2 * self.pad), rng.randint(1, 2 * self.pad)
            pt, pb = rng.randint(1, 2 * self.pad), rng.randint(1, 2 * self.pad)
        else:
            pl = pr = pt = pb = self.pad
        w = tw + pl + pr
        h = th + pt + pb
        bg = rng.randint(235, 255) if self.augment else 255
        fg = rng.randint(0, 40) if self.augment else 0
        img = Image.new("L", (w, h), bg)
        draw = ImageDraw.Draw(img)
        draw.text((pl - bbox[0], pt - bbox[1]), text, fill=fg, font=font)
        # Edge artifacts: fragments of neighboring lines clipped at the
        # top/bottom border, as real detector crops contain.
        if self.augment and rng.random() < 0.35:
            frag = text[: rng.randint(2, max(3, len(text) // 2))]
            if rng.random() < 0.5:
                fy = -th + rng.randint(2, max(3, pt // 2) + 2)  # top edge
            else:
                fy = h - rng.randint(2, max(3, pb // 2) + 2)    # bottom edge
            draw.text((rng.randint(0, max(1, w // 3)), fy), frag,
                      fill=fg, font=font)
        arr = np.asarray(img, dtype=np.uint8)
        if self.augment:
            arr = self._augment(arr, rng)
        # Scale to target height keeping aspect.
        scale = self.height / arr.shape[0]
        nw = max(1, int(round(arr.shape[1] * scale)))
        if _HAS_CV2:
            arr = cv2.resize(arr, (nw, self.height),
                             interpolation=cv2.INTER_AREA if scale < 1 else cv2.INTER_LINEAR)
        else:
            arr = np.asarray(Image.fromarray(arr).resize((nw, self.height),
                                                         Image.BILINEAR))
        return arr

    def _augment(self, arr: np.ndarray, rng: random.Random) -> np.ndarray:
        """Vectorized photometric augmentation (reference:
        kiri_ocr/generator.py:239-276 does the same families via PIL)."""
        nprng = np.random.default_rng(rng.getrandbits(32))
        # Gaussian noise
        if rng.random() < 0.5:
            sigma = rng.uniform(2, 10)
            arr = np.clip(arr.astype(np.float32)
                          + nprng.normal(0, sigma, arr.shape), 0, 255)
            arr = arr.astype(np.uint8)
        # Blur
        if _HAS_CV2 and rng.random() < 0.3:
            k = rng.choice([3, 5])
            arr = cv2.GaussianBlur(arr, (k, k), 0)
        # Morphology (stroke weight jitter)
        if _HAS_CV2 and rng.random() < 0.2:
            kernel = np.ones((2, 2), np.uint8)
            if rng.random() < 0.5:
                arr = cv2.erode(arr, kernel, iterations=1)
            else:
                arr = cv2.dilate(arr, kernel, iterations=1)
        # Brightness / contrast
        if rng.random() < 0.4:
            alpha = rng.uniform(0.85, 1.15)
            beta = rng.uniform(-15, 15)
            arr = np.clip(arr.astype(np.float32) * alpha + beta, 0, 255)
            arr = arr.astype(np.uint8)
        return arr


_EN_WORDS = ("the quick brown fox jumps over lazy dog a and to of in is it "
             "you that he was for on are with as his they be at one have "
             "this from or had by hot word but what some we can out other "
             "were all there when up use your how said an each she").split()

# Every non-space printable ASCII char: guarantees full-charset coverage in
# training text via the occasional "soup" word (round 1's observed-text-only
# vocab was missing 9 uppercase letters the word list never produced).
_ASCII_SOUP = string.digits + string.ascii_letters + string.punctuation


def sample_text(rng: random.Random, min_words: int = 1, max_words: int = 8,
                charset: Optional[str] = None) -> str:
    """Random English-ish line; mixes words, digits, punctuation, and rare
    random-ASCII 'soup' words so every printable char appears in training."""
    n = rng.randint(min_words, max_words)
    words = []
    for _ in range(n):
        r = rng.random()
        if r < 0.70:
            w = rng.choice(_EN_WORDS)
            if rng.random() < 0.2:
                w = w.capitalize()
            elif rng.random() < 0.06:
                w = w.upper()
        elif r < 0.85:
            w = "".join(rng.choice(string.digits)
                        for _ in range(rng.randint(1, 5)))
        elif r < 0.93:
            w = rng.choice(_EN_WORDS) + rng.choice(".,!?:;")
        else:
            w = "".join(rng.choice(_ASCII_SOUP)
                        for _ in range(rng.randint(2, 6)))
        words.append(w)
    text = " ".join(words)
    if charset is not None:
        text = "".join(c for c in text if c in charset) or "a"
    return text


_KHMER_CONS = [chr(c) for c in range(0x1780, 0x17A3)]
_KHMER_INDEP = [chr(c) for c in range(0x17A5, 0x17B4)]
_KHMER_VOWELS = [chr(c) for c in range(0x17B6, 0x17C6)]
_KHMER_SIGNS = [chr(c) for c in (0x17C6, 0x17C7, 0x17C9, 0x17CA, 0x17CB,
                                 0x17CC, 0x17CD, 0x17D0)]
_KHMER_DIGITS = [chr(c) for c in range(0x17E0, 0x17EA)]


def sample_khmer_word(rng: random.Random, vowel_p: float = 0.55,
                      sign_p: float = 0.18) -> str:
    """One Khmer 'word': consonant clusters with dependent vowels/signs,
    occasionally digits or an independent vowel.

    `vowel_p`/`sign_p` control per-cluster dependent-vowel and sign
    probabilities; boosted values oversample the small above-base marks
    (ំ ៊ ័ ៌ ...) that dominate the trained model's residual confusions."""
    r = rng.random()
    if r < 0.06:
        return "".join(rng.choice(_KHMER_DIGITS)
                       for _ in range(rng.randint(1, 4)))
    chars = []
    if r < 0.12:
        chars.append(rng.choice(_KHMER_INDEP))
    for _ in range(rng.randint(1, 5)):
        chars.append(rng.choice(_KHMER_CONS))
        if rng.random() < 0.15:  # coeng stack: subscript consonant
            chars.append("្")
            chars.append(rng.choice(_KHMER_CONS))
        if rng.random() < vowel_p:
            chars.append(rng.choice(_KHMER_VOWELS))
        if rng.random() < sign_p:
            chars.append(rng.choice(_KHMER_SIGNS))
    return "".join(chars)


def sample_khmer_text(rng: random.Random, min_words: int = 1,
                      max_words: int = 6, mixed_ratio: float = 0.15,
                      vowel_p: float = 0.55, sign_p: float = 0.18) -> str:
    """Khmer line; with probability `mixed_ratio` per word, an English word
    is interleaved (mixed-script lines, as bilingual documents contain)."""
    words = []
    for _ in range(rng.randint(min_words, max_words)):
        if rng.random() < mixed_ratio:
            words.append(rng.choice(_EN_WORDS))
        else:
            words.append(sample_khmer_word(rng, vowel_p, sign_p))
    return " ".join(words)


class DatasetGenerator:
    """Generates (image, label) pairs to an output directory with labels.txt.

    Resume semantics match the reference (kiri_ocr/generator.py:424-454):
    append mode re-scans the existing labels file and continues numbering.
    """

    def __init__(self, output_dir: str, height: int = 48, augment: bool = True,
                 fonts: Optional[FontManager] = None, seed: int = 42,
                 fonts_dir: Optional[str] = None,
                 max_width: Optional[int] = None):
        self.out = Path(output_dir)
        (self.out / "images").mkdir(parents=True, exist_ok=True)
        if fonts is None and fonts_dir:
            fonts = FontManager(font_dirs=[fonts_dir] + list(_FONT_DIRS))
        self.fonts = fonts or FontManager()
        self.renderer = ImageRenderer(height=height, augment=augment)
        self.rng = random.Random(seed)
        #: Canvas-width cap (reference generate --width): renders wider than
        #: this are aspect-resized down to fit.
        self.max_width = max_width

    def _sample_line(self, min_words: int = 1, max_words: int = 8) -> str:
        """Text sampler hook; subclasses override for other scripts."""
        return sample_text(self.rng, min_words, max_words)

    def generate_dataset(self, num_samples: int,
                         texts: Optional[Sequence[str]] = None,
                         append: bool = False) -> str:
        labels_path = self.out / "labels.txt"
        existing = 0
        mode = "w"
        if append and labels_path.exists():
            existing = sum(1 for _ in labels_path.open(encoding="utf-8"))
            mode = "a"
        with labels_path.open(mode, encoding="utf-8") as f:
            for i in range(num_samples):
                text = (texts[i % len(texts)] if texts
                        else self._sample_line())
                sample = self.generate_one(text)
                if sample is None:
                    continue
                name = f"img_{existing + i:06d}.png"
                Image.fromarray(sample).save(self.out / "images" / name)
                f.write(f"{name}\t{text}\n")
        return str(labels_path)

    def generate_one(self, text: str) -> Optional[np.ndarray]:
        picked = self.fonts.pick(text, self.rng)
        if picked is None:
            return None
        path, size = picked
        try:
            font = self.fonts.get(path, size)
            img = self.renderer.render(text, font, self.rng)
        except Exception:
            return None
        return self._cap_width(img)

    def _cap_width(self, img: Optional[np.ndarray]) -> Optional[np.ndarray]:
        """Aspect-resize renders wider than ``max_width`` down to fit."""
        if self.max_width and img is not None and img.shape[1] > self.max_width:
            h = max(1, int(img.shape[0] * self.max_width / img.shape[1]))
            img = np.asarray(Image.fromarray(img).resize(
                (self.max_width, h), Image.BILINEAR), dtype=np.uint8)
        return img

    def generate_from_files(self, train_file, val_file=None,
                            train_augment: int = 1, val_augment: int = 1,
                            font_mode: str = "random",
                            random_augment: bool = False,
                            val_ratio: float = 0.1) -> str:
        """Reference-style file-driven generation (kiri_ocr/generator.py:312-454):
        ``<out>/train/{images,labels.txt}`` + ``<out>/val/...``, each source
        text line rendered ``augment`` times. ``font_mode='all'`` renders every
        capable font per line instead of a random pick; ``random_augment``
        re-rolls whether each copy is augmented. Without ``val_file`` the last
        10% of shuffled train lines become the validation set."""
        lines = [l.strip() for l in
                 Path(train_file).read_text(encoding="utf-8").splitlines()
                 if l.strip()]
        if val_file:
            # An explicitly-given path must exist — silently auto-splitting
            # instead would discard the user's intended validation corpus.
            if not Path(val_file).exists():
                raise FileNotFoundError(f"val_file not found: {val_file}")
            val_lines = [l.strip() for l in
                         Path(val_file).read_text(encoding="utf-8").splitlines()
                         if l.strip()]
        else:
            shuffled = list(lines)
            self.rng.shuffle(shuffled)
            n_val = max(1, int(len(shuffled) * val_ratio))
            val_lines, lines = shuffled[:n_val], shuffled[n_val:]
        self._generate_split(self.out / "train", lines, train_augment,
                             font_mode, random_augment)
        self._generate_split(self.out / "val", val_lines, val_augment,
                             font_mode, random_augment)
        return str(self.out)

    def _generate_split(self, out_dir: Path, lines: Sequence[str],
                        augment_factor: int, font_mode: str,
                        random_augment: bool) -> None:
        (out_dir / "images").mkdir(parents=True, exist_ok=True)
        base_augment = self.renderer.augment
        i = 0
        try:
            with (out_dir / "labels.txt").open("w", encoding="utf-8") as f:
                for text in lines:
                    if font_mode == "all":
                        pool = ((self.fonts.khmer_fonts if _is_khmer(text)
                                 else self.fonts.english_fonts)
                                or self.fonts.font_paths)
                    else:
                        pool = [None]  # random pick per copy via generate_one
                    for _ in range(max(1, augment_factor)):
                        for fpath in pool:
                            if random_augment:
                                self.renderer.augment = self.rng.random() < 0.5
                            if fpath is None:
                                img = self.generate_one(text)
                            else:
                                try:
                                    font = self.fonts.get(
                                        fpath,
                                        self.rng.choice(self.fonts.sizes))
                                    img = self._cap_width(
                                        self.renderer.render(text, font,
                                                             self.rng))
                                except Exception:
                                    img = None
                            if img is None:
                                continue
                            name = f"img_{i:06d}.png"
                            Image.fromarray(img).save(
                                out_dir / "images" / name)
                            f.write(f"{name}\t{text}\n")
                            i += 1
        finally:
            self.renderer.augment = base_augment

    def generate_samples(self, num_samples: int,
                         texts: Optional[Sequence[str]] = None,
                         min_words: int = 1, max_words: int = 14,
                         max_width: Optional[int] = None
                         ) -> List[Dict[str, object]]:
        """In-memory samples for the Trainer: [{image u8 [H,W'], text}].

        max_words defaults high enough to cover full-width document lines —
        an AR decoder trained only on short lines hallucinates/repeats past
        its training length distribution. With ``max_width``, sampled lines
        whose render exceeds it are resampled with a smaller word budget
        (otherwise the collate crop truncates pixels while the label keeps
        the full text — label noise that teaches the decoder to hallucinate).
        Caller-provided ``texts`` are never resampled.
        """
        out = []
        for i in range(num_samples):
            img = None
            text = ""
            best: Optional[Dict[str, object]] = None  # narrowest over-wide try
            budget = max_words
            for _ in range(6):
                text = (texts[i % len(texts)] if texts
                        else self._sample_line(min_words, budget))
                img = self.generate_one(text)
                if img is None:
                    break
                if (texts is not None or max_width is None
                        or img.shape[1] <= max_width):
                    break
                if best is None or img.shape[1] < best["image"].shape[1]:
                    best = {"image": img, "text": text}
                budget = max(min_words, budget * 2 // 3)
                img = None
            if img is not None:
                out.append({"image": img, "text": text})
            elif best is not None:
                # All attempts rendered wider than max_width: keep the
                # narrowest rather than silently shorting the caller — it is
                # aspect-resized downstream anyway.
                out.append(best)
        return out


class MultilingualDatasetGenerator(DatasetGenerator):
    """Khmer + English mix (reference: kiri_ocr/generator.py:510-537).

    Khmer lines are only produced when a Khmer-capable font exists on the
    host; otherwise output degrades to English-only with a warning.
    """

    def __init__(self, *args, khmer_ratio: float = 0.5,
                 sign_boost: float = 0.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.khmer_ratio = khmer_ratio if self.fonts.khmer_fonts else 0.0
        #: Fraction of Khmer lines sampled diacritic-dense (vowel_p=0.75,
        #: sign_p=0.50) to oversample the above-base marks behind the
        #: flagship's residual errors (see scripts/eval_recognizer.py
        #: --dump-errors: ំ<->ិ, dropped ៊/័/៌ etc.).
        self.sign_boost = sign_boost
        if khmer_ratio > 0 and not self.fonts.khmer_fonts:
            print("⚠ No Khmer-capable fonts found; generating English only.")

    def _sample_line(self, min_words: int = 1, max_words: int = 8) -> str:
        if self.rng.random() < self.khmer_ratio:
            if self.sign_boost and self.rng.random() < self.sign_boost:
                return sample_khmer_text(self.rng, min_words,
                                         max(2, max_words // 2),
                                         vowel_p=0.75, sign_p=0.50)
            return sample_khmer_text(self.rng, min_words,
                                     max(2, max_words // 2))
        return sample_text(self.rng, min_words, max_words)
