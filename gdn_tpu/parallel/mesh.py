"""Device mesh and sharding for data- and spatially-partitioned training.

The reference's only parallelism is single-process multi-GPU
``nn.DataParallel`` (scatter/replicate/gather each step — SURVEY.md
§2.10/§3.5).  The TPU-native replacement is a ``jax.sharding.Mesh``
over all chips: the global batch is sharded along the "data" axis,
parameters are replicated, and the jitted train step's gradient
reduction lowers to an XLA all-reduce (psum) over ICI — no per-step
host round-trips, no gather to a master chip (SURVEY.md §2.11).

Beyond the reference, the mesh can carry a second **"spatial" axis**
(SURVEY.md §2.10's SP row): the image height dimension of every batch
leaf (B, H, W, C) is sharded across it and the whole train step runs
under XLA's SPMD partitioner, which inserts the conv halo exchanges
and the GroupNorm/loss statistic all-reduces itself — the TPU-idiomatic
form of spatial partitioning (no hand-written ppermute ring; the
compiler owns the collective schedule).  This is how conv nets scale
past per-chip memory on inputs too LARGE to fit even at batch 1 —
orthogonal to data parallelism and composable with it
(mesh shape = (data, spatial)).

The same code runs on N virtual CPU devices
(``--xla_force_host_platform_device_count=N``) for tests and the
driver's multichip dry-run.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def create_mesh(
    num_devices: int = 0,
    axis_name: str = DATA_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
    spatial: int = 1,
) -> Mesh:
    """Mesh over the first `num_devices` devices (0 = all).

    ``spatial=1`` (default): the 1-D data-parallel mesh.  ``spatial=S``:
    a 2-D (data, spatial) mesh — S must divide the device count; the
    data extent is ``n // S``.  On real hardware the trailing mesh dim
    maps to the fastest-varying (nearest-neighbor) chips, which is what
    the halo exchanges ride.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    if spatial <= 1:
        return Mesh(np.asarray(devs), (axis_name,))
    if len(devs) % spatial:
        raise ValueError(
            f"spatial={spatial} does not divide {len(devs)} devices"
        )
    grid = np.asarray(devs).reshape(len(devs) // spatial, spatial)
    return Mesh(grid, (axis_name, SPATIAL_AXIS))


def spatial_size(mesh: Optional[Mesh]) -> int:
    """Extent of the spatial axis (1 when absent / no mesh)."""
    if mesh is None or SPATIAL_AXIS not in mesh.axis_names:
        return 1
    return mesh.shape[SPATIAL_AXIS]


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for parameters/opt state: fully replicated."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding for batches: leading (batch) dim split on "data"; with a
    spatial mesh the second (height) dim additionally splits on
    "spatial"."""
    if spatial_size(mesh) > 1:
        return NamedSharding(mesh, P(axis_name, SPATIAL_AXIS))
    return NamedSharding(mesh, P(axis_name))


def stacked_batch_sharding(
    mesh: Mesh, axis_name: str = DATA_AXIS
) -> NamedSharding:
    """Sharding for multistep (lax.scan) batches {k: (S, B, H, ...)}:
    scan axis replicated, batch axis split on "data" (+ height on
    "spatial" when present)."""
    if spatial_size(mesh) > 1:
        return NamedSharding(mesh, P(None, axis_name, SPATIAL_AXIS))
    return NamedSharding(mesh, P(None, axis_name))


def _shard_tree(batch: Any, mesh: Mesh, sharding: NamedSharding) -> Any:
    spec = sharding.spec

    def _put(x):
        for dim, axes in enumerate(spec):
            if axes is None or dim >= x.ndim:
                continue
            for ax in (axes,) if isinstance(axes, str) else axes:
                assert x.shape[dim] % mesh.shape[ax] == 0, (
                    f"batch dim {dim} ({x.shape[dim]}) not divisible by "
                    f"mesh axis {ax!r} ({mesh.shape[ax]})"
                )
        s = getattr(x, "sharding", None)
        if s is not None and s.is_equivalent_to(sharding, x.ndim):
            return x  # already placed by the prefetch pipeline
        return jax.device_put(x, sharding)

    return jax.tree.map(_put, batch)


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Place a host batch pytree onto the mesh, batch-dim sharded (and
    height-dim sharded on spatial meshes).

    Global batch size must divide the mesh's data extent (and H its
    spatial extent).
    """
    return _shard_tree(batch, mesh, batch_sharding(mesh, axis_name))


def shard_stacked_batch(
    batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS
) -> Any:
    """Place a stacked multistep batch {k: (S, B, ...)} onto the mesh
    with the batch axis (dim 1) sharded.  Without this, the K>1 path's
    transfer is one unsharded host->device0 copy + in-jit reshard on
    real multi-chip hardware (VERDICT r2 weak item 6)."""
    return _shard_tree(batch, mesh, stacked_batch_sharding(mesh, axis_name))
