"""Multi-host (pod-slice) initialization and per-process input glue.

The reference has no distributed backend (SURVEY.md §2.3); this is the
TPU-native design: ``jax.distributed.initialize()`` connects the hosts over
DCN, the mesh spans all global devices, each host loads only its shard of
the batch, and :func:`global_batch_from_local` assembles the global array
from per-process shards (``jax.make_array_from_process_local_data``). XLA
collectives over ICI handle everything else.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize", "process_shard", "global_batch_from_local"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Dict[str, int]:
    """Initialize multi-host JAX when launched on a pod slice.

    Single-process environments (one host, or tests) are a no-op. Returns
    ``{"process_index", "process_count", "local_devices", "global_devices"}``.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def process_shard() -> tuple:
    """(shard_id, num_shards) for the DataLoader's index slicing."""
    return jax.process_index(), jax.process_count()


def global_batch_from_local(local_batch: Dict[str, np.ndarray], mesh: Mesh):
    """Assemble a globally-sharded batch from this process's local rows.

    Each process passes its own ``global_batch_size / process_count`` rows;
    the result is a global jax.Array sharded over the mesh's 'data' axis.
    """
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return {k: put(v) for k, v in local_batch.items()}
