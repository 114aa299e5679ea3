"""Data: synthetic generators and dataset adapters."""
from .datasets import LineSampleSet, load_hf_dataset, load_local_dataset
from .synth import (DatasetGenerator, FontManager, ImageRenderer,
                    MultilingualDatasetGenerator, sample_text)

__all__ = ["DatasetGenerator", "MultilingualDatasetGenerator", "FontManager",
           "ImageRenderer", "sample_text", "LineSampleSet",
           "load_local_dataset", "load_hf_dataset"]
