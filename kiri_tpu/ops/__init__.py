"""Compute ops: decoding, CTC, preprocessing."""
from . import ctc, decode, preprocess

__all__ = ["ctc", "decode", "preprocess"]
