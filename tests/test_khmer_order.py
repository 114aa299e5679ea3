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
