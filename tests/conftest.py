"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere. XLA_FLAGS must be set before the first backend initialization;
the platform override goes through jax.config because the environment's
sitecustomize (axon TPU plugin) forces jax_platforms at interpreter start."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


# ---------------------------------------------------------------------------
# Test tiers. The full suite takes ~15 min on CPU; CI and pre-commit runs
# want a fast core tier: `pytest -m "not slow"` (< 90 s). Membership is
# centralized here (measured from --durations=0 of the full run) instead of
# scattering @pytest.mark.slow across files.
# ---------------------------------------------------------------------------
import pytest

# Whole modules that are inherently heavy: training loops, 8-virtual-device
# sharding, torch-oracle parity, trained-checkpoint e2e, detector training.
SLOW_MODULES = {
    "test_sharding", "test_trainer", "test_spec_decode", "test_detectors",
    "test_e2e_trained", "test_stem_kernel", "test_parity_corpus",
    "test_cli_parity_flags", "test_ckpt_roundtrip", "test_reference_parity",
    "test_sharded_ckpt", "test_beam_unroll", "test_ckpt_regression",
}

# Individual heavy tests inside otherwise-fast modules (>= ~1.5 s call time),
# so those modules keep their quick smoke tests in the core tier.
SLOW_TESTS = {
    "test_quant8_flagship_text_parity",
    "test_process_documents_mixed_sizes_order",
    "test_auto_decode_method_end_to_end",
    "test_extract_text_result_schema",
    "test_device_preprocess_path",
    "test_stream_chars_schema",
    "test_process_documents_device_preprocess",
    "test_recognize_region_and_streaming_schema",
    "test_extract_text_batch_matches_single",
    "test_recognize_single_line_image",
    "test_auto_width_bucketed_matches_extremes",
    "test_recognize_batch_width_bucketed",
    "test_windowed_stream_matches_oneshot",
    "test_auto_partial_escalation_mixes_paths",
    "test_auto_escalates_everything_matches_beam",
    "test_recognize_batch_shapes",
    "test_batch_padding_invariance",
    "test_stream_schema",
    "test_upload_bits4_matches_quantized_full_path",
    "test_recognize_crops_device_preprocess",
    "test_pooled_documents_deskew_matches_single",
    "test_pipeline_recognizes_from_deskewed_frame",
    "test_cut_crops_noisy_page_despikes_and_warps_linear",
    "test_pipeline_enhance_flag",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = Path(item.fspath).stem
        name = item.name.split("[")[0]
        if mod in SLOW_MODULES or name in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
