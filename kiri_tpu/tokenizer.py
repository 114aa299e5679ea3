"""Character tokenizer with dual CTC / decoder id-spaces.

Semantics match the reference CharTokenizer exactly
(reference: kiri_ocr/model.py:83-144):

* One `vocab.json` file mapping character -> raw id. Ids are re-densified by
  sorting on the stored id, so gaps in the file are tolerated.
* `<unk>` is appended if absent.
* CTC id-space:     blank=0, pad=1, char = raw + 2.
* Decoder id-space: pad=0, bos=1, eos=2, char = raw + 3.
* `decode_ctc` collapses repeats then drops blanks/specials/<unk>.
* `decode_dec` drops specials, maps <unk> to "".

On top of the reference surface this adds vectorized numpy encode/decode
helpers used by the batched TPU pipeline.
"""
from __future__ import annotations

import json
import string
from pathlib import Path
from typing import Dict, Iterable, List, Sequence, Union

import numpy as np


class CharTokenizer:
    def __init__(self, vocab_path: Union[str, Path], cfg=None):
        unk_token = getattr(cfg, "UNK_TOKEN", "<unk>") if cfg is not None else "<unk>"
        # KHMER_VISUAL_ORDER checkpoints are trained on ink-order labels
        # (pre-base vowels before their base consonant — monotonic for CTC);
        # the tokenizer is the single boundary where the model's visual
        # token space meets user-facing logical text, so encode applies
        # to_visual_order and every decode applies the exact inverse. Both
        # are the identity on English and on Khmer without pre-base vowels
        # (kiri_tpu/data/khmer_order.py).
        self.visual_order = bool(getattr(cfg, "KHMER_VISUAL_ORDER", False))
        if self.visual_order:
            from .data.khmer_order import to_logical_order, to_visual_order

            self._to_visual, self._to_logical = to_visual_order, to_logical_order
        else:
            self._to_visual = self._to_logical = lambda s: s
        with open(vocab_path, "r", encoding="utf-8") as f:
            vocab_raw: Dict[str, int] = json.load(f)

        if unk_token not in vocab_raw:
            vocab_raw[unk_token] = max(vocab_raw.values(), default=-1) + 1

        items = sorted(vocab_raw.items(), key=lambda kv: kv[1])
        self.token_to_id = {tok: i for i, (tok, _) in enumerate(items)}
        self.id_to_token = {i: tok for i, (tok, _) in enumerate(items)}

        self.unk_token = unk_token
        self.unk_id = self.token_to_id[unk_token]
        self.blank_id = 0
        self.pad_id = 1
        self.ctc_offset = 2
        self.vocab_size = len(self.token_to_id)
        self.ctc_classes = self.vocab_size + self.ctc_offset

        self.dec_pad = 0
        self.dec_bos = 1
        self.dec_eos = 2
        self.dec_offset = 3
        self.dec_vocab = self.vocab_size + self.dec_offset

        # Lookup table: decoder id -> character (specials and <unk> -> "").
        # Used by the vectorized decoders.
        self._dec_id_to_char = [""] * self.dec_vocab
        for raw, tok in self.id_to_token.items():
            if tok != self.unk_token:
                self._dec_id_to_char[raw + self.dec_offset] = tok
        self._ctc_id_to_char = [""] * self.ctc_classes
        for raw, tok in self.id_to_token.items():
            if tok != self.unk_token:
                self._ctc_id_to_char[raw + self.ctc_offset] = tok

    # ------------------------------------------------------------- decoding
    def decode_ctc(self, ids: Sequence[int]) -> str:
        """Decode CTC ids: collapse repeats, drop blank/pad/<unk>."""
        chars = []
        prev_id = None
        for idx in ids:
            idx = int(idx)
            if idx == prev_id:
                continue
            prev_id = idx
            if idx < self.ctc_offset:
                continue
            raw_id = idx - self.ctc_offset
            if 0 <= raw_id < self.vocab_size:
                char = self.id_to_token.get(raw_id, "")
                if char != self.unk_token:
                    chars.append(char)
        return self._to_logical("".join(chars))

    def decode_dec(self, ids: Sequence[int]) -> str:
        out = []
        for x in ids:
            x = int(x)
            if x in (self.dec_pad, self.dec_bos, self.dec_eos):
                continue
            y = x - self.dec_offset
            if 0 <= y < self.vocab_size:
                t = self.id_to_token.get(y, self.unk_token)
                out.append("" if t == self.unk_token else t)
        return self._to_logical("".join(out))

    def dec_to_ctc_id(self, dec_id: int) -> int:
        if dec_id in (self.dec_pad, self.dec_bos, self.dec_eos):
            return self.blank_id
        raw_id = dec_id - self.dec_offset
        if 0 <= raw_id < self.vocab_size:
            return raw_id + self.ctc_offset
        return self.unk_id + self.ctc_offset

    # ------------------------------------------------------------- encoding
    def encode_raw(self, text: str) -> List[int]:
        """Text -> raw char ids (<unk> for unknown characters)."""
        text = self._to_visual(text)
        return [self.token_to_id.get(ch, self.unk_id) for ch in text]

    def encode_ctc(self, text: str) -> List[int]:
        return [i + self.ctc_offset for i in self.encode_raw(text)]

    def encode_dec(self, text: str, add_bos: bool = True, add_eos: bool = True) -> List[int]:
        ids = [i + self.dec_offset for i in self.encode_raw(text)]
        if add_bos:
            ids = [self.dec_bos] + ids
        if add_eos:
            ids = ids + [self.dec_eos]
        return ids

    # ----------------------------------------------------- vectorized paths
    def decode_ctc_batch(self, ids: np.ndarray, lengths: np.ndarray = None) -> List[str]:
        """Vectorized CTC collapse for a [N, T] id matrix.

        Replaces the reference per-id Python loop with numpy masking; output
        strings are identical to ``decode_ctc`` per row.
        """
        ids = np.asarray(ids)
        n, t = ids.shape
        keep_new = np.ones((n, t), dtype=bool)
        keep_new[:, 1:] = ids[:, 1:] != ids[:, :-1]
        if lengths is not None:
            frame_idx = np.arange(t)[None, :]
            keep_new &= frame_idx < np.asarray(lengths)[:, None]
        is_char = ids >= self.ctc_offset
        is_unk = ids == (self.unk_id + self.ctc_offset)
        keep = keep_new & is_char & ~is_unk
        table = np.array(self._ctc_id_to_char, dtype=object)
        out = []
        for i in range(n):
            out.append(self._to_logical("".join(table[ids[i][keep[i]]])))
        return out

    def decode_dec_batch(self, ids: np.ndarray, lengths: np.ndarray) -> List[str]:
        """Decode [N, L] decoder-id matrix up to per-row `lengths` (eos-exclusive)."""
        ids = np.asarray(ids)
        n, L = ids.shape
        pos = np.arange(L)[None, :]
        valid = pos < np.asarray(lengths)[:, None]
        special = ids < self.dec_offset
        unk = ids == (self.unk_id + self.dec_offset)
        keep = valid & ~special & ~unk
        table = np.array(self._dec_id_to_char, dtype=object)
        return [self._to_logical("".join(table[ids[i][keep[i]]]))
                for i in range(n)]

    def save(self, path: Union[str, Path]) -> None:
        raw = {tok: i for tok, i in self.token_to_id.items()}
        Path(path).write_text(json.dumps(raw, ensure_ascii=False, indent=0))


def build_vocab_from_texts(texts, out_path: Union[str, Path], unk_token: str = "<unk>") -> str:
    """Scan an iterable of strings and write a sorted char vocab json.

    Mirrors the reference vocab builders (reference: kiri_ocr/training.py:39-101):
    characters are sorted, `<unk>` gets id 0.
    """
    chars = set()
    for t in texts:
        chars.update(t)
    chars.discard("\n")
    vocab = {unk_token: 0}
    for i, ch in enumerate(sorted(chars), start=1):
        vocab[ch] = i
    Path(out_path).write_text(json.dumps(vocab, ensure_ascii=False, indent=0))
    return str(out_path)


def build_vocab_from_hf_dataset(ds, out_path: Union[str, Path],
                                text_col: str = "text") -> str:
    """Vocab from a HuggingFace dataset's text column (reference:
    kiri_ocr/training.py:68-101 ``build_vocab_from_hf_dataset``)."""
    return build_vocab_from_texts((row[text_col] for row in ds), out_path)


def full_charset(include_khmer: bool = True) -> str:
    """The complete target character set: every printable ASCII char plus
    the assigned Khmer block (consonants, vowels, signs, digits, lunar
    dates), minus the two invisible inherent-vowel marks (U+17B4/U+17B5).

    Building vocabs from this union instead of observed training text only
    prevents silent unknown-char drops (round 1's observed-only vocab was
    missing G K M N P R V X Z because the text sampler never produced them).
    """
    chars = string.digits + string.ascii_letters + string.punctuation + " "
    if include_khmer:
        khmer = [chr(c) for c in range(0x1780, 0x17DE)
                 if c not in (0x17B4, 0x17B5)]
        khmer += [chr(c) for c in range(0x17E0, 0x17EA)]  # Khmer digits
        khmer += [chr(c) for c in range(0x17F0, 0x17FA)]  # lunar-date digits
        chars += "".join(khmer)
    return chars


def build_full_vocab(out_path: Union[str, Path], include_khmer: bool = True,
                     extra_texts: Iterable[str] = (),
                     unk_token: str = "<unk>") -> str:
    """Write a vocab covering the full target charset, unioned with any
    characters observed in `extra_texts` (dataset-specific symbols)."""
    texts = [full_charset(include_khmer)]
    texts.extend(extra_texts)
    return build_vocab_from_texts(texts, out_path, unk_token)
