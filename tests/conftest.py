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
