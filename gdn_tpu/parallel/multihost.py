"""Multi-host (multi-process) scaffolding.

The minimum scope is single-host multi-chip DP over ICI (SURVEY.md
§2.11: "DCN only if ever multi-host — out of minimum scope").  This
module is the thin, real entry point for when a deployment does span
hosts: initialize the JAX distributed runtime, then the existing
mesh/sharding code works unchanged because ``jax.devices()`` becomes
the global device list and `shard_batch` shards the *global* batch.

Per-host input pipelines should feed only their local shard; use
``local_batch_slice`` to carve each process's slice of the global
batch indices (loaders can then skip decoding the rest).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-process configuration is
    present (explicit args or the standard JAX_COORDINATOR_ADDRESS /
    cluster auto-detection).  Returns True if distributed mode is on.

    Safe to call unconditionally: with no configuration it is a no-op
    single-process setup.
    """
    import os

    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    if num_processes is not None or process_id is not None:
        # explicit multi-process topology without a coordinator would
        # otherwise silently degrade to N independent full-batch runs
        raise ValueError(
            "num_processes/process_id given but no coordinator_address "
            "(or JAX_COORDINATOR_ADDRESS) to initialize against"
        )
    return jax.process_count() > 1


def local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """[start, end) of this process's rows in the global batch."""
    n = jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} must divide across {n} processes"
    )
    per = global_batch // n
    i = jax.process_index()
    return i * per, (i + 1) * per
