"""Kiri-TPU: a TPU-native bilingual document-OCR framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``kiri-ocr`` library (PyTorch/ONNX/OpenCV): text detection (DB / CRAFT /
classic-CV backends), CNN+Transformer recognition with hybrid CTC/attention
decoding, LLM-style character streaming, training for recognizer and
detectors, synthetic data generation, a CLI, rendering, and benchmarking.

Public surface mirrors the reference package (kiri_ocr/__init__.py:15-45):
lazy attribute exports keep CLI startup fast.
"""
__version__ = "0.1.0"

_LAZY = {
    "OCR": ("kiri_tpu.pipeline", "OCR"),
    "CFG": ("kiri_tpu.config", "CFG"),
    "CharTokenizer": ("kiri_tpu.tokenizer", "CharTokenizer"),
    "TextDetector": ("kiri_tpu.detect", "TextDetector"),
    "DocumentRenderer": ("kiri_tpu.renderer", "DocumentRenderer"),
    "TextBox": ("kiri_tpu.detect.base", "TextBox"),
    "DetectionLevel": ("kiri_tpu.detect.base", "DetectionLevel"),
    "KiriOCR": ("kiri_tpu.models.recognizer", "KiriOCR"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'kiri_tpu' has no attribute '{name}'")


def __dir__():
    return sorted(list(globals().keys()) + list(_LAZY.keys()))
