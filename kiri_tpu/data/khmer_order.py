"""Logical <-> visual codepoint reordering for Khmer pre-base vowels.

Khmer stores text in logical (spoken) order — base consonant first, then
dependent vowel — but fonts draw the vowels E/AE/AI (U+17C1..U+17C3) and
the left part of the two-part vowels (U+17BE..U+17C5) BEFORE the base
glyph (reference rendering behavior: kiri_ocr/generator.py renders through
real shaping engines; our procedural equivalent is
kiri_tpu/data/pseudofont.py:268-346 `_layout_cluster`).

CTC assumes a monotonic image-order -> label-order alignment, so training
the CTC head on logical-order labels asks the network to emit the base
consonant while still looking at the vowel's ink. A full-attention encoder
can learn this, but converges much slower. These helpers let the training
recipe present labels in VISUAL order (monotonic with the ink) and map
hypotheses back to logical order at the text boundary:

    to_visual_order(label)   — move each pre-base vowel to the front of its
                               orthographic cluster (before base + coengs).
    to_logical_order(hyp)    — exact inverse on well-formed text: a pre-base
                               vowel that appears before its base moves back
                               after the base + coeng-subscript pairs.

Both are the identity on text with no pre-base vowels (all English, most
Khmer), and `to_logical_order(to_visual_order(t)) == t` for every line the
samplers produce (property-tested in tests/test_khmer_order.py).
"""
from __future__ import annotations

from .pseudofont import (_CLUSTER_EXTEND, _COENG, _PREBASE_FULL,
                         _PREBASE_SPLIT, _khmer_class)

_PREBASE = _PREBASE_FULL | set(_PREBASE_SPLIT)


def _cluster_end(text: str, i: int) -> int:
    """End index (exclusive) of the orthographic cluster whose base starts
    at ``i`` — same scan as pseudofont.PseudoGlyphFont.render."""
    n = len(text)
    j = i + 1
    while j < n:
        cpj = ord(text[j])
        if (cpj == _COENG and j + 1 < n
                and _khmer_class(ord(text[j + 1])) == "base"):
            j += 2
        elif cpj == _COENG or cpj in _CLUSTER_EXTEND:
            j += 1
        else:
            break
    return j


def to_visual_order(text: str) -> str:
    """Reorder each cluster's pre-base vowels to the cluster front."""
    out = []
    i, n = 0, len(text)
    while i < n:
        cp = ord(text[i])
        if _khmer_class(cp) != "base":
            out.append(text[i])
            i += 1
            continue
        j = _cluster_end(text, i)
        cluster = text[i:j]
        pre = [c for c in cluster if ord(c) in _PREBASE]
        if pre:
            out.extend(pre)
            out.extend(c for c in cluster if ord(c) not in _PREBASE)
        else:
            out.append(cluster)
        i = j
    return "".join(out)


def _visual_cluster_end(text: str, i: int) -> int:
    """Cluster scan for VISUAL-order text: identical to `_cluster_end`
    except pre-base vowels never extend a cluster — in visual order they
    always precede their own base, so one appearing after a base belongs
    to the NEXT cluster."""
    n = len(text)
    j = i + 1
    while j < n:
        cpj = ord(text[j])
        if cpj in _PREBASE:
            break
        if (cpj == _COENG and j + 1 < n
                and _khmer_class(ord(text[j + 1])) == "base"):
            j += 2
        elif cpj == _COENG or cpj in _CLUSTER_EXTEND:
            j += 1
        else:
            break
    return j


def stable_visual_prefix(text: str) -> int:
    """Length of the visual-order prefix whose logical transform can no
    longer change as more characters arrive.

    The last visual "unit" (an optional pre-base vowel run plus its —
    possibly still incomplete — cluster, or a dangling run/char) is held
    back: a future combining mark or coeng pair could still extend it, and
    a buffered pre-base vowel's logical insertion point moves as coeng
    pairs arrive. Everything before that unit is final because
    ``to_logical_order`` processes units independently.
    """
    i, n = 0, len(text)
    last_start = 0
    while i < n:
        start = i
        while i < n and ord(text[i]) in _PREBASE:
            i += 1
        if i < n and _khmer_class(ord(text[i])) == "base":
            i = _visual_cluster_end(text, i)
        elif i == start:
            i += 1
        last_start = start
    return last_start


class IncrementalLogical:
    """Streaming visual->logical reordering that only ever APPENDS.

    Feed visual-order characters with :meth:`push`; it returns the newly
    stabilized logical characters (possibly "" while a cluster is still
    open, possibly several once it closes). :meth:`flush` returns the
    remainder at end of stream. ``emitted`` always equals
    ``to_logical_order(everything_pushed)[: len(emitted)]`` — chunk
    consumers can treat it as a monotonically growing logical transcript.
    """

    def __init__(self) -> None:
        self._raw = ""
        self._stable = 0  # chars of _raw already emitted (logical length ==
        #                   visual length: the transform is a permutation)

    @property
    def emitted(self) -> str:
        return to_logical_order(self._raw[: self._stable])

    def push(self, chars: str) -> str:
        self._raw += chars
        j = stable_visual_prefix(self._raw)
        if j <= self._stable:
            return ""
        out = to_logical_order(self._raw[: j])[self._stable:]
        self._stable = j
        return out

    def flush(self) -> str:
        out = to_logical_order(self._raw)[self._stable:]
        self._stable = len(self._raw)
        return out


def to_logical_order(text: str) -> str:
    """Inverse of :func:`to_visual_order` on well-formed visual text.

    A run of pre-base vowels immediately preceding a base consonant is
    moved to just after that base and its coeng-subscript pairs (the
    canonical logical position — the samplers emit vowels directly after
    the consonant stack, before signs). Dangling pre-base vowels with no
    following base are left in place, so the function is total on
    arbitrary (including malformed model-output) strings.
    """
    out = []
    i, n = 0, len(text)
    while i < n:
        cp = ord(text[i])
        if cp in _PREBASE:
            # Collect the pre-base run.
            k = i
            while k < n and ord(text[k]) in _PREBASE:
                k += 1
            if k < n and _khmer_class(ord(text[k])) == "base":
                j = _visual_cluster_end(text, k)
                cluster = text[k:j]
                # Insertion point: after base + coeng/subscript pairs.
                p = 1
                while (p + 1 < len(cluster) and ord(cluster[p]) == _COENG
                       and _khmer_class(ord(cluster[p + 1])) == "base"):
                    p += 2
                out.append(cluster[:p])
                out.append(text[i:k])
                out.append(cluster[p:])
                i = j
                continue
            # Dangling pre-base vowel(s): emit verbatim.
            out.append(text[i:k])
            i = k
            continue
        if _khmer_class(cp) == "base":
            j = _visual_cluster_end(text, i)
            out.append(text[i:j])
            i = j
        else:
            out.append(text[i])
            i += 1
    return "".join(out)
