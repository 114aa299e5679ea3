"""Device-mesh parallelism for Kiri-TPU.

The reference is strictly single-process / single-device (SURVEY §2.5: no
torch.distributed, no NCCL/MPI anywhere). This module supplies the TPU-native
scaling layer the reference never had:

* ``make_mesh``        — build a ``jax.sharding.Mesh`` over (data, model) axes;
                         data-parallelism rides ICI via XLA collectives
                         inserted automatically by jit on sharded arrays.
* ``shard_variables``  — tensor-parallel PartitionSpecs for the recognizer
                         param tree (FFN + attention-head sharding); a no-op
                         1-way 'model' axis degrades gracefully to pure DP.
* ``shard_batch``      — batch-dim sharding for host-loaded input pytrees.

At the reference model scale (~10M params) TP is not needed; the specs exist
so the same trainer scales to bigger CFGs without code changes — the mesh
shape is the only knob.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_count: Optional[int] = None) -> None:
    """Multi-process (multi-host) entry point: join the JAX distributed
    runtime so ``jax.devices()`` spans every process's chips and jit'ed
    collectives ride ICI/DCN across them.

    The TPU-native equivalent of a NCCL/MPI init (SURVEY §2.5 — the
    reference has none): on real multi-host TPU slices call with no
    arguments (the TPU metadata server provides coordinator/process info);
    on CPU/GPU clusters pass ``coordinator_address='host:port'``,
    ``num_processes`` and this process's ``process_id``.

    ``local_device_count`` (CPU only) forces N virtual local devices per
    process — used by the 2-process CPU tests; must be set before the
    first JAX backend initialization.

    Call once per process, before building meshes. Safe to call on a
    single-process setup with no arguments only on TPU; for single-process
    CPU runs just skip it (``jax.distributed.initialize`` requires a
    coordinator otherwise).
    """
    if local_device_count is not None:
        import re

        flags = os.environ.get("XLA_FLAGS", "")
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       flags).strip()
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{local_device_count}").strip()
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def process_info() -> Tuple[int, int]:
    """(process_index, process_count) of this process in the global mesh."""
    return jax.process_index(), jax.process_count()


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the first ``n_devices`` devices.

    ``model_parallel`` splits off a TP axis; with the default 1 the mesh is
    pure data-parallel. Axis order places the model axis innermost so TP
    collectives ride the fastest ICI links.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _param_spec(path: str, ndim: int) -> P:
    """Tensor-parallel PartitionSpec for one recognizer parameter.

    Sharding rules (megatron-style, over the 'model' axis):
    * FFN lin1 [D, FF] -> shard FF (columns); lin2 [FF, D] -> shard FF (rows)
    * attention wq/wk/wv [D, D] -> shard output (head) dim; wo -> input dim
    * vocab heads [D, V] -> shard V
    * everything else (LN, conv stem, embeddings, biases of row-sharded
      layers) replicated.
    """
    if ndim == 0:
        return P()
    if ".ffn.lin1.w" in path:
        return P(None, MODEL_AXIS)
    if ".ffn.lin1.b" in path:
        return P(MODEL_AXIS)
    if ".ffn.lin2.w" in path:
        return P(MODEL_AXIS, None)
    for proj in (".wq.", ".wk.", ".wv."):
        if proj in path:
            return P(None, MODEL_AXIS) if path.endswith(".w") else P(MODEL_AXIS)
    if ".wo.w" in path:
        return P(MODEL_AXIS, None)
    if path.endswith(("ctc_head.proj.w", "dec_head.w", "lm_head.w")):
        return P(None, MODEL_AXIS)
    if path.endswith(("ctc_head.proj.b", "dec_head.b", "lm_head.b")):
        return P(MODEL_AXIS)
    return P(*([None] * ndim))


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return ".".join(parts)


def variable_shardings(variables: Dict[str, Any], mesh: Mesh):
    """NamedSharding pytree matching the recognizer variable tree.

    Dims not divisible by their mesh axis (e.g. vocab-sized head outputs)
    fall back to replication — sharding here is an optimization, never a
    correctness requirement.
    """

    def spec_for(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        spec = _param_spec(_path_str(path), ndim)
        shape = getattr(leaf, "shape", ())
        fixed = []
        for d, axis in enumerate(spec):
            if axis is not None and shape[d] % mesh.shape[axis] != 0:
                axis = None
            fixed.append(axis)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(spec_for, variables)


def shard_variables(variables: Dict[str, Any], mesh: Mesh):
    """Place a variable tree onto the mesh per ``variable_shardings``."""
    shardings = variable_shardings(variables, mesh)
    return jax.tree.map(jax.device_put, variables, shardings)


def batch_shardings(batch: Dict[str, Any], mesh: Mesh):
    """Shard every leaf's leading (batch) dim over the data axis."""

    def spec_for(leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    return jax.tree.map(spec_for, batch)


def shard_batch(batch: Dict[str, Any], mesh: Mesh):
    return jax.tree.map(jax.device_put, batch, batch_shardings(batch, mesh))


def local_batch_slice(n_global: int) -> Tuple[int, int]:
    """This process's contiguous row range [lo, hi) of a global batch.

    ``make_mesh`` reshapes ``jax.devices()`` — which orders devices by
    process — into (data, model), so with the model axis contained inside a
    process the data axis maps processes to contiguous global-row blocks.
    ``n_global`` must be divisible by process_count (pad first via
    ``pad_batch_to_devices``).
    """
    pid, pc = process_info()
    if n_global % pc != 0:
        raise ValueError(f"global batch {n_global} not divisible by "
                         f"process_count {pc}")
    per = n_global // pc
    return pid * per, (pid + 1) * per


def shard_batch_global(batch: Dict[str, Any], mesh: Mesh):
    """Multi-process batch placement: every process passes the SAME global
    batch (host numpy); each contributes only its local rows and the result
    is a global jax.Array sharded over the mesh's data axis.

    Single-process meshes degrade to plain ``shard_batch``, so callers can
    use this unconditionally.
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    n = jax.tree.leaves(batch)[0].shape[0]
    lo, hi = local_batch_slice(n)
    shardings = batch_shardings(batch, mesh)

    def place(x, s):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.make_array_from_process_local_data(s, x)
        return jax.make_array_from_process_local_data(s, x[lo:hi])

    return jax.tree.map(place, batch, shardings)


def pad_batch_to_devices(batch: Dict[str, Any], mesh: Mesh):
    """Zero-pad the batch dim to a multiple of the data-axis size.

    Returns (padded_batch, n_valid). Loss masking uses ctc/dec lengths, so
    zero rows contribute nothing.
    """
    dp = mesh.shape[DATA_AXIS]
    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0]
    rem = (-n) % dp
    if rem == 0:
        return batch, n
    padded = jax.tree.map(
        lambda x: np.concatenate(
            [x, np.zeros((rem,) + x.shape[1:], x.dtype)], axis=0),
        batch)
    return padded, n
