"""Training: trainer loop, checkpoints."""
from . import checkpoints, trainer

__all__ = ["checkpoints", "trainer"]
