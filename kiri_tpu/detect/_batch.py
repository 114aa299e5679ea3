"""Shared grouped-batch dispatch for multi-page detector forwards.

Both CNN detector backends (DB, CRAFT) run multi-page detection the same
way: bucket same-canvas pages into batched forwards (one upload + one
compiled call per (canvas shape, batch bucket) group instead of a link
round-trip per page), slice bucket padding off on device before the
fetch, start every group's host copy async, then yield groups in
dispatch order so the caller's per-page CPU postproc overlaps the
remaining wire transfers. This module is the single implementation both
backends drive with their own forward fn and output pytree.
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np

#: Batch-size buckets: pages of the same canvas shape share one compiled
#: program per bucket size.
BATCH_BUCKETS: Tuple[int, ...] = (1, 2, 4, 8)


def iter_grouped_batches(canvases: Sequence[np.ndarray],
                         fwd: Callable,
                         buckets: Tuple[int, ...] = BATCH_BUCKETS):
    """Yield ``(page_indices, numpy output pytree)`` per dispatched group.

    ``fwd`` maps a stacked uint8 canvas batch ``[nb, H, W]`` to any pytree
    of device arrays with a leading batch axis. Bucket padding rows are
    sliced off ON DEVICE before the fetch (ghost pages must not ride the
    link), and all groups' host copies start async before the first yield
    so the caller's per-page work runs under the remaining transfers.
    """
    import jax

    groups = {}
    for i, c in enumerate(canvases):
        groups.setdefault(c.shape, []).append(i)
    max_b = buckets[-1]
    pending: List = []
    for shape in sorted(groups):
        idxs = groups[shape]
        for s in range(0, len(idxs), max_b):
            chunk = idxs[s: s + max_b]
            nb = next(b for b in buckets if b >= len(chunk))
            arr = np.stack([canvases[i] for i in chunk]
                           + [canvases[chunk[-1]]] * (nb - len(chunk)))
            out = fwd(arr)
            out = jax.tree_util.tree_map(lambda a: a[:len(chunk)], out)
            pending.append((chunk, out))
    for _, out in pending:
        for leaf in jax.tree_util.tree_leaves(out):
            try:
                leaf.copy_to_host_async()
            except Exception:  # pragma: no cover - backend without async
                pass
    for chunk, out in pending:
        yield chunk, jax.tree_util.tree_map(np.asarray, out)
