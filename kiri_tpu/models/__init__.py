"""Model definitions (pure-function parameter trees)."""
from . import layers, recognizer

__all__ = ["layers", "recognizer"]
