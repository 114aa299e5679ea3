"""Khmer grapheme clusters: segmentation, cluster-level CER, and the
pseudo-font's real shaping behaviors (coeng stacking, pre-base reordering).

The reference evaluates codepoint CER only (reference:
benchmark/run_benchmark.py:15-39) and renders real Khmer TTFs whose shaping
the pseudo-font must approximate (reference: kiri_ocr/generator.py:118-164).
"""
import numpy as np

from kiri_tpu.data.pseudofont import PseudoGlyphFont
from kiri_tpu.utils.khmer import (cluster_cer, corpus_cluster_cer,
                                  grapheme_clusters)

KA = "ក"      # ក base consonant
KHA = "ខ"     # ខ base consonant
COENG = "្"   # ្
AA = "ា"      # ា right vowel
I = "ិ"       # ិ above vowel
U = "ុ"       # ុ below vowel
E = "េ"       # េ pre-base vowel
OO = "ោ"      # ោ two-part vowel (e + right)
OE = "ើ"      # ើ two-part vowel (e + above)
NIKA = "ំ"    # ំ sign


# ------------------------------------------------------------- segmentation
def test_simple_clusters():
    assert grapheme_clusters(KA + KHA) == [KA, KHA]
    assert grapheme_clusters(KA + AA + KHA + I) == [KA + AA, KHA + I]


def test_coeng_joins_subscript():
    # ក + ្ + ខ + ា is ONE cluster (subscript kha under ka, vowel aa).
    s = KA + COENG + KHA + AA
    assert grapheme_clusters(s) == [s]
    # Two stacked coengs stay in one cluster.
    s2 = KA + COENG + KHA + COENG + KA + U
    assert grapheme_clusters(s2) == [s2]


def test_nonkhmer_singletons():
    assert grapheme_clusters("ab 1") == ["a", "b", " ", "1"]
    mixed = "a" + KA + AA + "b"
    assert grapheme_clusters(mixed) == ["a", KA + AA, "b"]


def test_malformed_never_raises():
    # Dangling coeng at end / before non-base stays with its cluster.
    assert grapheme_clusters(KA + COENG) == [KA + COENG]
    assert grapheme_clusters(KA + COENG + " x") == [KA + COENG, " ", "x"]
    # Orphan mark with no base is a singleton.
    assert grapheme_clusters(AA + KA) == [AA, KA]
    assert grapheme_clusters("") == []


def test_khmer_digits_standalone():
    # Khmer digits (17E0..) are not cluster bases.
    s = "១២" + KA + I
    assert grapheme_clusters(s) == ["១", "២", KA + I]


# ----------------------------------------------------------------- cluster CER
def test_cluster_cer_weighs_whole_cluster():
    ref = KA + COENG + KHA + AA    # 1 cluster
    hyp_drop = KA + AA             # dropped coeng pair -> whole cluster wrong
    assert cluster_cer(ref, hyp_drop) == 1.0
    # Codepoint CER for the same error would be 2/4 = 0.5.
    assert cluster_cer(ref, ref) == 0.0


def test_cluster_cer_equals_char_cer_on_ascii():
    assert cluster_cer("hello", "hallo") == 1 / 5
    assert cluster_cer("abc", "abcd") == 1 / 3


def test_cluster_cer_empty_refs():
    assert cluster_cer("", "") == 0.0
    assert cluster_cer("", KA) == 1.0


def test_corpus_cluster_cer_pools():
    refs = [KA + AA + " " + KHA, "ab"]
    hyps = [KA + AA + " " + KHA, "ax"]
    # 0 errors over 3 clusters + 1 error over 2 -> 1/5.
    assert corpus_cluster_cer(refs, hyps) == 1 / 5


# -------------------------------------------------------- pseudo-font shaping
def test_coeng_subscript_rendering():
    """COENG + consonant renders as a subscript below the base: zero
    advance, ink in the below-base slot, and distinct from the bare base."""
    f = PseudoGlyphFont(32)
    assert f.getlength(KA + COENG + KHA) == f.getlength(KA)
    img = f.render(KA + COENG + KHA)
    bare = f.render(KA)
    assert img[f._below_y:].max() > 0, "no subscript ink below the base"
    assert bare[f._below_y:].max() == 0
    # Different subscript consonants give different renders.
    img2 = f.render(KA + COENG + KA)
    pad = max(img.shape[1], img2.shape[1])

    def padto(a):
        out = np.zeros((a.shape[0], pad), np.uint8)
        out[:, : a.shape[1]] = a
        return out

    assert not np.array_equal(padto(img), padto(img2))


def test_prebase_vowel_reorders_left():
    """កេ puts the vowel's ink LEFT of the base consonant ink."""
    f = PseudoGlyphFont(32)
    with_e = f.render(KA + E)
    bare = f.render(KA)
    assert f.getlength(KA + E) > f.getlength(KA)
    body = slice(f._body_y, f._body_y + f._body_h)
    cols_e = np.nonzero(with_e[body].max(axis=0))[0]
    cols_bare = np.nonzero(bare[body].max(axis=0))[0]
    # Pre-base part starts at the left edge; the base is shifted right by
    # the vowel advance, so its first ink column moves right.
    assert cols_e[0] <= cols_bare[0]
    assert with_e.shape[1] > bare.shape[1]


def test_two_part_vowels_have_both_parts():
    """ោ (e + right part) inks both sides of the base; ើ (e + above part)
    inks pre-base and above-base."""
    f = PseudoGlyphFont(32)
    body = slice(f._body_y, f._body_y + f._body_h)
    oo = f.render(KA + OO)
    # Right part: ink beyond the base's advance (prebase + base widths).
    assert oo[body, f._adv_right + f._adv_base:].max() > 0
    # Pre-base part: ink in the left slot.
    assert oo[body, : f._adv_right].max() > 0
    oe = f.render(KA + OE)
    assert oe[: f._body_y].max() > 0, "no above part for OE"
    assert oe[body, : f._adv_right].max() > 0, "no pre-base part for OE"


def test_shaping_deterministic():
    f = PseudoGlyphFont(28, style=1)
    g = PseudoGlyphFont(28, style=1)
    s = KA + COENG + KHA + OO + NIKA + " " + KHA + E
    assert np.array_equal(f.render(s), g.render(s))


def test_advance_prefixes_stay_monotonic():
    """docsynth char boxes rely on non-decreasing prefix advances."""
    f = PseudoGlyphFont(32)
    s = KA + COENG + KHA + OO + " a" + KHA + E + NIKA
    prev = 0
    for i in range(1, len(s) + 1):
        cur = f.getbbox(s[:i])[2]
        assert cur >= prev, (i, cur, prev)
        prev = cur
