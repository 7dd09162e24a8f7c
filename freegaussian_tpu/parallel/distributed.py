"""Multi-host (pod-slice) initialization and process-level utilities.

The reference's multi-GPU story is nerfstudio spawning one torch-DDP process
per GPU with NCCL (SURVEY §2.3). The TPU-native equivalent:

  - `jax.distributed.initialize()` on every host of the slice (coordinator
    resolved from the TPU environment automatically on Cloud TPU)
  - a global mesh over all devices; each host feeds its local shard of the
    frame list (FullImageDatamanager's shard_index/num_shards)
  - XLA collectives ride ICI within the slice and DCN across slices — no
    custom transport.

For tests and single-host dev, `ensure_distributed()` is a no-op when only
one process exists.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax


def ensure_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed if needed; returns (process_index,
    process_count)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return jax.process_index(), jax.process_count()


def host_shard_info() -> Tuple[int, int]:
    """(shard_index, num_shards) for the per-host data shard."""
    return jax.process_index(), jax.process_count()


def local_device_count() -> int:
    return jax.local_device_count()
