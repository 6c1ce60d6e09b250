"""Multi-host (multi-process) seam: distributed init + per-process data.

A single TPU slice is driven by one process per host; `jax.devices()` is
GLOBAL after `jax.distributed.initialize`, while each process can only
address its local chips. Two consequences for the training stack, both
handled here:

  * the mesh must be built over global devices (``make_mesh`` already
    uses ``jax.devices()`` — it needs no change once ``
    initialize_distributed`` has run);
  * no process can materialize the full global batch on its own devices —
    each host feeds ONLY the rows its addressable devices own, stitched
    into a global `jax.Array` via `jax.make_array_from_process_local_data`
    (`data/loader.py::BatchIterator` switches to this path automatically
    when `jax.process_count() > 1`).

Per-epoch metrics (host-side AUC) use `process_allgather` so every
process computes identical metrics from its local prob/label rows.

Validated by a 2-process CPU smoke test (`tests/test_multihost.py`) —
real multi-host TPU hardware is not available in this environment, but the
code path is identical (Gloo stands in for ICI/DCN collectives).

The reference has no multi-device story at all (single process, single
GPU — SURVEY §2.2); this seam is TPU-native scale-out beyond it.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """`jax.distributed.initialize` with env fallbacks; returns True if a
    multi-process runtime was initialized.

    Resolution order per argument: explicit parameter →
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars →
    None (on TPU VMs, `jax.distributed.initialize()` with no arguments
    auto-detects all three from the TPU metadata; on CPU/GPU it requires
    them). A no-op when none are provided off-TPU, or when the runtime is
    already initialized — safe to call unconditionally at entry points.
    """
    coordinator_address = (
        coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # Must not touch the backend (jax.devices / process_count) before
    # jax.distributed.initialize — probe the distributed client directly.
    try:
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return jax.process_count() > 1
    except Exception:
        pass
    on_tpu_vm = os.environ.get("TPU_WORKER_HOSTNAMES") is not None
    if coordinator_address is None and not on_tpu_vm:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def local_batch_rows(batch_sharding, global_batch: int) -> np.ndarray:
    """Global row indices (sorted) of the batch-axis shards this process's
    addressable devices own under `batch_sharding` (P('data') over the
    leading axis). The per-process local batch slice is
    `global_batch_rows → host arrays → make_array_from_process_local_data`.
    """
    # The batch partition along the leading axis is rank-independent:
    # compute it on a 1-D view of the batch dimension.
    index_map = batch_sharding.devices_indices_map((global_batch,))
    spans = set()
    for d in jax.local_devices():
        sl = index_map[d][0]
        spans.add((sl.start or 0, sl.stop if sl.stop is not None
                   else global_batch))
    rows = np.concatenate(
        [np.arange(a, b) for a, b in sorted(spans)]
    ) if spans else np.arange(0)
    return rows


def global_from_local(sharding, local_data: np.ndarray) -> jax.Array:
    """This process's rows → one global `jax.Array` under `sharding`."""
    return jax.make_array_from_process_local_data(sharding, local_data)


def local_shards_np(x) -> np.ndarray:
    """A (possibly non-fully-addressable) jax.Array → this process's rows
    as one numpy array, ordered by global index. Plain numpy / fully
    replicated input passes through unchanged."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_replicated:
        return np.asarray(x)
    shards = sorted(
        x.addressable_shards,
        key=lambda s: (s.index[0].start or 0) if s.index else 0,
    )
    seen = set()
    parts = []
    for s in shards:
        key = (s.index[0].start or 0) if s.index else 0
        if key in seen:          # replicated over a second mesh axis
            continue
        seen.add(key)
        parts.append(np.asarray(s.data))
    return np.concatenate(parts) if parts else np.zeros((0,), x.dtype)


def allgather_rows(x: np.ndarray) -> np.ndarray:
    """Concatenate per-process row blocks across all processes (identical
    result everywhere). Identity in single-process runs."""
    if not is_multiprocess():
        return x
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
