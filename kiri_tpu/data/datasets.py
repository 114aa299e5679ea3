"""Dataset adapters: local labels.txt directories and HuggingFace datasets.

Format parity with the reference loaders (kiri_ocr/training.py:105-289):

* local: ``labels.txt`` rows ``<img_name>\\t<text>``, images resolved against
  ``<dir>/images/`` then ``<dir>/``.
* HF: any dataset with image/text columns (configurable names), auto val
  split with seed 42 when no validation split exists.

Samples are dicts {"image": uint8 [H, W'] variable width, "text": str}; the
trainer's collate handles resize-to-48x640, gray-128 padding and the ±25%
width augmentation (kiri_ocr/training.py:144-153).
"""
from __future__ import annotations

import random
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..ops.preprocess import resize_keep_ratio_pad_np


class LineSampleSet:
    """Lazy list-like sample source with on-access preprocessing.

    Each item is {"image": uint8 [IMG_H, IMG_W], "text": str}; augmentation
    (random width stretch ±25%) is applied when ``augment=True``.
    """

    def __init__(self, records: Sequence[Tuple[object, str]], img_h: int = 48,
                 img_w: int = 640, augment: bool = False, seed: int = 42):
        self.records = list(records)
        self.img_h = img_h
        self.img_w = img_w
        self.augment = augment
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.records)

    def _load_gray(self, src) -> Optional[np.ndarray]:
        try:
            if isinstance(src, np.ndarray):
                img = src
                if img.ndim == 3:
                    img = np.asarray(Image.fromarray(img).convert("L"))
                return img.astype(np.uint8)
            if isinstance(src, Image.Image):
                return np.asarray(src.convert("L"), dtype=np.uint8)
            return np.asarray(Image.open(src).convert("L"), dtype=np.uint8)
        except Exception as e:  # dummy sample on I/O error (reference:
            # kiri_ocr/training.py:200-209)
            print(f"Error loading sample: {e}")
            return None

    def __getitem__(self, idx: int) -> Dict[str, object]:
        src, text = self.records[idx]
        img = self._load_gray(src)
        if img is None:
            return {"image": np.zeros((self.img_h, self.img_w), np.uint8),
                    "text": ""}
        if self.augment and img.shape[1] > 2:
            scale = self.rng.uniform(0.75, 1.25)
            new_w = max(1, int(img.shape[1] * scale))
            img = np.asarray(
                Image.fromarray(img).resize((new_w, img.shape[0]),
                                            Image.BILINEAR), dtype=np.uint8)
        return {"image": resize_keep_ratio_pad_np(img, self.img_h, self.img_w),
                "text": text}


def load_local_dataset(labels_file, img_h: int = 48, img_w: int = 640,
                       augment: bool = False) -> LineSampleSet:
    """labels.txt loader (reference: kiri_ocr/training.py:212-249)."""
    labels_path = Path(labels_file)
    img_dirs = [labels_path.parent / "images", labels_path.parent]
    records: List[Tuple[object, str]] = []
    with open(labels_path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                continue
            name, text = parts[0], parts[1]
            for d in img_dirs:
                p = d / name
                if p.exists():
                    records.append((str(p), text))
                    break
    return LineSampleSet(records, img_h, img_w, augment)


def load_hf_dataset(names: Sequence[str], image_col: str = "image",
                    text_col: str = "text", img_h: int = 48, img_w: int = 640,
                    augment: bool = False, val_ratio: float = 0.05,
                    seed: int = 42, subset: Optional[str] = None,
                    train_split: str = "train",
                    val_split: Optional[str] = None,
                    streaming: bool = False
                    ) -> Tuple[LineSampleSet, LineSampleSet]:
    """Load + concat HF datasets; auto train/val split with seed 42 when no
    validation split exists (reference: kiri_ocr/training.py:369-438).

    ``subset``/``train_split``/``val_split`` mirror the reference's
    ``--hf-subset``/``--hf-train-split``/``--hf-val-split`` flags, and the
    val-split fallback order matches training.py:388-394 (given split, then
    validation/val/test, else a seeded auto-split). ``streaming`` loads with
    ``streaming=True`` and materializes records host-side — the reference
    accepts the flag but never forwards it (cli.py:339 vs training.py:383).
    """
    from datasets import concatenate_datasets, load_dataset

    def _load(name, split):
        ds = load_dataset(name, subset, split=split, streaming=streaming)
        if streaming:
            # Width-bucketed batching needs random access + len; drain the
            # stream into an indexable list of records once.
            return [dict(row) for row in ds]
        return ds

    trains, vals = [], []
    for name in names:
        trains.append(_load(name, train_split))
        val = None
        for split in (val_split, "validation", "val", "test"):
            if not split:
                continue
            try:
                val = _load(name, split)
                break
            except Exception as e:
                # Broad fallback matches the reference (training.py:395-402),
                # but an explicitly-requested split failing deserves a trace —
                # an auth/network error here would otherwise silently swap
                # the user's validation set for an auto-split.
                if split == val_split:
                    print(f"⚠ val split '{val_split}' of {name} failed "
                          f"({type(e).__name__}: {e}); trying fallbacks")
                continue
        if val is None:
            if streaming:
                tr = trains[-1]
                rng = random.Random(seed)
                idx = list(range(len(tr)))
                rng.shuffle(idx)
                n_val = max(1, int(len(tr) * val_ratio))
                val = [tr[i] for i in idx[:n_val]]
                trains[-1] = [tr[i] for i in idx[n_val:]]
            else:
                split = trains[-1].train_test_split(test_size=val_ratio,
                                                    seed=seed)
                trains[-1] = split["train"]
                val = split["test"]
        vals.append(val)

    if streaming:
        train_ds = [r for ds in trains for r in ds]
        val_ds = [r for ds in vals for r in ds]
    else:
        train_ds = concatenate_datasets(trains) if len(trains) > 1 else trains[0]
        val_ds = concatenate_datasets(vals) if len(vals) > 1 else vals[0]

    def to_records(ds):
        return _HFRecords(ds, image_col, text_col)

    return (LineSampleSet(to_records(train_ds), img_h, img_w, augment, seed),
            LineSampleSet(to_records(val_ds), img_h, img_w, False, seed))


class _HFRecords:
    """Adapter presenting an HF dataset as a sequence of (image, text)."""

    def __init__(self, ds, image_col: str, text_col: str):
        self.ds = ds
        self.image_col = image_col
        self.text_col = text_col

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return [self[i] for i in range(*idx.indices(len(self)))]
        item = self.ds[int(idx)]
        return (item[self.image_col], item[self.text_col])

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
