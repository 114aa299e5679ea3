"""Round-trip and shape properties of the Khmer visual-order transform.

The training recipe may present CTC labels in visual order (monotonic with
the rendered ink) and map hypotheses back at the text boundary; that is
only sound if to_logical_order(to_visual_order(t)) == t for every line the
samplers can produce.
"""
import random

from kiri_tpu.data.khmer_order import to_logical_order, to_visual_order
from kiri_tpu.data.synth import sample_khmer_text, sample_text


def test_roundtrip_khmer_sampler():
    rng = random.Random(123)
    for _ in range(5000):
        t = sample_khmer_text(rng, max_words=8, mixed_ratio=0.2,
                              vowel_p=0.7, sign_p=0.3)
        v = to_visual_order(t)
        assert to_logical_order(v) == t, (t, v)
        assert sorted(v) == sorted(t)  # permutation, never loss


def test_identity_on_english():
    rng = random.Random(7)
    for _ in range(500):
        t = sample_text(rng)
        assert to_visual_order(t) == t
        assert to_logical_order(t) == t


def test_prebase_moves_before_base():
    # ប + ោ (o, split vowel): visually the e-part renders left of the base.
    assert to_visual_order("បោ") == "ោប"
    assert to_logical_order("ោប") == "បោ"
    # Coeng stack keeps the subscript attached to the base.
    assert to_visual_order("ប្រើ") == "ើប្រ"
    assert to_logical_order("ើប្រ") == "ប្រើ"
    # Non-pre-base vowel: identity.
    assert to_visual_order("បា") == "បា"


def test_total_on_malformed_output():
    # Model hypotheses can be arbitrary; the inverse must not crash or drop
    # characters.
    for bad in ["េ", "េេ", "េ ប", "aេ", "្", "េ្ប", "បេេប"]:
        out = to_logical_order(bad)
        assert sorted(out) == sorted(bad)


def test_incremental_logical_matches_full_transform():
    from kiri_tpu.data.khmer_order import IncrementalLogical
    rng = random.Random(99)
    for _ in range(500):
        t = sample_khmer_text(rng, max_words=5, mixed_ratio=0.2,
                              vowel_p=0.7, sign_p=0.3)
        v = to_visual_order(t)
        filt = IncrementalLogical()
        parts = [filt.push(c) for c in v]
        parts.append(filt.flush())
        assert "".join(parts) == t, (t, v, parts)
        # every prefix emitted is a prefix of the final logical text
        acc = ""
        for p in parts:
            acc += p
            assert t.startswith(acc)


def test_tokenizer_visual_order_roundtrip(tmp_path):
    import json

    from kiri_tpu.config import CFG
    from kiri_tpu.tokenizer import CharTokenizer, build_full_vocab

    vp = tmp_path / "vocab.json"
    build_full_vocab(str(vp), include_khmer=True)
    cfg_v = CFG(KHMER_VISUAL_ORDER=True)
    tok_v = CharTokenizer(str(vp), cfg_v)
    tok_p = CharTokenizer(str(vp), CFG())
    rng = random.Random(5)
    for _ in range(200):
        t = sample_khmer_text(rng, max_words=4, vowel_p=0.8)
        # encode in visual space == plain-encode of the visual transform
        assert tok_v.encode_ctc(t) == tok_p.encode_ctc(to_visual_order(t))
        # decode inverts back to logical text (pad ids between chars so the
        # CTC collapse cannot merge repeated characters)
        ids = tok_v.encode_ctc(t)
        interleaved = []
        for i in ids:
            interleaved += [i, tok_v.blank_id]
        assert tok_v.decode_ctc(interleaved) == t
        dec = tok_p.encode_dec(to_visual_order(t))
        assert tok_v.decode_dec(dec) == t
    # English identity both ways
    assert tok_v.encode_ctc("Hello") == tok_p.encode_ctc("Hello")
    assert tok_v.decode_dec(tok_v.encode_dec("Hello")) == "Hello"
