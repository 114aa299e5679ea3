"""CharTokenizer: dual id-space semantics (reference kiri_ocr/model.py:83-144)."""
import json

import numpy as np
import pytest

from kiri_tpu.tokenizer import CharTokenizer, build_vocab_from_texts


@pytest.fixture()
def vocab_file(tmp_path):
    vocab = {"<unk>": 0, "a": 1, "b": 2, "c": 3, " ": 4, "z": 9}  # id gap
    p = tmp_path / "vocab.json"
    p.write_text(json.dumps(vocab))
    return str(p)


def test_id_spaces(vocab_file):
    tok = CharTokenizer(vocab_file)
    assert tok.blank_id == 0 and tok.pad_id == 1 and tok.ctc_offset == 2
    assert tok.dec_pad == 0 and tok.dec_bos == 1 and tok.dec_eos == 2
    assert tok.dec_offset == 3
    assert tok.vocab_size == 6  # gap densified
    assert tok.ctc_classes == 8
    assert tok.dec_vocab == 9


def test_encode_decode_roundtrip(vocab_file):
    tok = CharTokenizer(vocab_file)
    text = "ab cz"
    assert tok.decode_ctc(tok.encode_ctc(text)) == text
    dec = tok.encode_dec(text)
    assert dec[0] == tok.dec_bos and dec[-1] == tok.dec_eos
    assert tok.decode_dec(dec) == text


def test_decode_ctc_collapses_repeats_and_blanks(vocab_file):
    tok = CharTokenizer(vocab_file)
    a = tok.encode_ctc("a")[0]
    b = tok.encode_ctc("b")[0]
    ids = [0, a, a, 0, a, b, b, 1, b]
    assert tok.decode_ctc(ids) == "aabb"


def test_unknown_chars_map_to_unk_and_drop(vocab_file):
    tok = CharTokenizer(vocab_file)
    ids = tok.encode_ctc("aXb")
    assert ids[1] == tok.unk_id + tok.ctc_offset
    assert tok.decode_ctc(ids) == "ab"
    assert tok.decode_dec(tok.encode_dec("aXb")) == "ab"


def test_dec_to_ctc_id(vocab_file):
    tok = CharTokenizer(vocab_file)
    for special in (tok.dec_pad, tok.dec_bos, tok.dec_eos):
        assert tok.dec_to_ctc_id(special) == tok.blank_id
    raw = tok.token_to_id["b"]
    assert tok.dec_to_ctc_id(raw + tok.dec_offset) == raw + tok.ctc_offset


def test_batch_decode_matches_scalar(vocab_file):
    tok = CharTokenizer(vocab_file)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, tok.ctc_classes, (5, 20))
    batch = tok.decode_ctc_batch(ids)
    scalar = [tok.decode_ctc(row) for row in ids]
    assert batch == scalar

    dec_ids = rng.integers(0, tok.dec_vocab, (5, 12))
    lens = rng.integers(0, 12, (5,))
    batch = tok.decode_dec_batch(dec_ids, lens)
    scalar = [tok.decode_dec(row[:l]) for row, l in zip(dec_ids, lens)]
    assert batch == scalar


def test_build_vocab(tmp_path):
    out = tmp_path / "v.json"
    build_vocab_from_texts(["cab", "bad\n"], out)
    v = json.loads(out.read_text())
    assert v["<unk>"] == 0
    assert "\n" not in v
    chars = sorted(set("cabbad"))
    assert [v[c] for c in chars] == list(range(1, len(chars) + 1))


def test_save_roundtrip(vocab_file, tmp_path):
    tok = CharTokenizer(vocab_file)
    out = tmp_path / "v2.json"
    tok.save(out)
    tok2 = CharTokenizer(out)
    assert tok2.token_to_id == tok.token_to_id


def test_khmer_codepoints(tmp_path):
    """Khmer cluster characters round-trip through both id spaces."""
    import json as _json

    khmer = [chr(c) for c in range(0x1780, 0x1790)] + ["ា", "ំ"]
    vocab = {"<unk>": 0}
    for i, ch in enumerate(khmer, start=1):
        vocab[ch] = i
    p = tmp_path / "kh.json"
    p.write_text(_json.dumps(vocab, ensure_ascii=False))
    tok = CharTokenizer(str(p))
    text = "".join(khmer[:5]) + "ា"
    assert tok.decode_ctc(tok.encode_ctc(text)) == text
    assert tok.decode_dec(tok.encode_dec(text)) == text
    ids = np.array([tok.encode_ctc(text) + [0]])
    assert tok.decode_ctc_batch(ids)[0] == text


def test_full_charset_covers_printable_ascii(tmp_path):
    """Round 1's observed-text vocab was missing G K M N P R V X Z; the full
    charset builder must cover every printable ASCII char and round-trip it."""
    import string

    from kiri_tpu.tokenizer import build_full_vocab, full_charset

    charset = full_charset(include_khmer=False)
    for ch in string.digits + string.ascii_letters + string.punctuation + " ":
        assert ch in charset

    p = tmp_path / "vocab_full.json"
    build_full_vocab(p, include_khmer=False)
    tok = CharTokenizer(str(p))
    for ch in charset:
        ids = tok.encode_ctc(ch + ch)
        assert tok.unk_id + tok.ctc_offset not in ids, f"unk for {ch!r}"
        # Interleave blank so CTC collapse keeps the doubled char.
        assert tok.decode_ctc([ids[0], 0, ids[1]]) == ch + ch
        assert tok.decode_dec(tok.encode_dec(ch)) == ch


def test_full_charset_khmer_roundtrip(tmp_path):
    from kiri_tpu.tokenizer import build_full_vocab, full_charset

    charset = full_charset(include_khmer=True)
    # Representative Khmer: consonants, dependent vowels, signs, digits.
    for cp in (0x1780, 0x17A2, 0x17B6, 0x17C5, 0x17D2, 0x17DB, 0x17E0, 0x17E9):
        assert chr(cp) in charset
    # The invisible inherent-vowel marks are deliberately excluded.
    assert chr(0x17B4) not in charset and chr(0x17B5) not in charset

    p = tmp_path / "vocab_full.json"
    build_full_vocab(p, include_khmer=True, extra_texts=["€"])
    tok = CharTokenizer(str(p))
    text = "កា្រ ១២៣ superb"
    assert tok.decode_dec(tok.encode_dec(text)) == text
    assert "€" in tok.token_to_id
