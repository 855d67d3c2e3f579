"""Device-resident dataset cache: the corpus lives in HBM, batches are
device-side gathers, and per-step host->device traffic shrinks to the
index array.

Motivation (BASELINE.md round 4, "disk-fed pipeline"): with the host
decode cache in place, disk-fed training is H2D-bound — each B=128
wire batch is 34.1 MB, and on the remote-TPU tunnel (4-51 MB/s) that
caps the pipeline at ~155 imgs/sec against a 2165 imgs/sec chip.  Small
corpora fit HBM outright (1500 KITTI-shaped pairs = 400 MB of wire
dtypes against 16 GB), so the TPU-native fix is to upload the decoded
wire corpus ONCE and slice batches on device: the gather is
HBM-bandwidth work (~34 MB/step, >100 GB/s), and the only per-step
upload is (B,) int32 indices.

Semantics are EXACTLY the wrapped loader's: same shuffle order (the
wrapper drives the loader's own SeekableLoaderMixin index machinery),
same seek() resume contract, same wire dtypes (the resident arrays are
the loader's `_decode_wire` output), same padded-tail handling
(loop=False tails zero their depth counts, so the on-device mask
derivation excludes them).

Memory gate: ``fits`` estimates the resident bytes; callers refuse
corpora beyond ``max_bytes`` (default 2 GB — generous headroom next to
model + optimizer + activations on a 16 GB chip) rather than OOM-ing
mid-train.
"""

from __future__ import annotations

import itertools
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gdn_tpu.data.batching import iter_batch_indices


def resident_bytes(n: int, h: int, w: int) -> int:
    """uint8 RGB + uint16 depth counts per sample."""
    return n * (h * w * 3 + h * w * 2)


def _decode_corpus(loader, n: int, h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Decode the loader's whole corpus to wire-dtype arrays — THROUGH
    the host decode cache when one is configured (warm mmaps skip the
    PNG decode, and misses decoded here warm it for later runs)."""
    rgb = np.empty((n, h, w, 3), np.uint8)
    depth = np.empty((n, h, w), np.uint16)
    host_cache = getattr(loader, "_cache", None)
    step = max(1, loader.batch_size)
    for s in range(0, n, step):
        idx = np.arange(s, min(s + step, n))
        if host_cache is not None:
            hit, miss = host_cache.split_hits(idx)
            if len(hit):
                rgb[idx[hit]], depth[idx[hit]] = host_cache.read(idx[hit])
            if len(miss):
                mr, md = loader._decode_wire(idx[miss])
                rgb[idx[miss]], depth[idx[miss]] = mr, md
                host_cache.write(idx[miss], mr, md)
        else:
            rgb[idx], depth[idx] = loader._decode_wire(idx)
    return rgb, depth


def _check_wire_loader(loader) -> None:
    if not getattr(loader, "_wire", False):
        raise ValueError(
            "device_cache requires the wire-format loader path "
            "(train_wire='auto')"
        )


class DeviceResidentDataset:
    """Wraps a wire-format train loader (KittiTrainDataset /
    NyuTrainDataset) into a device-resident iterator."""

    def __init__(self, loader, mesh=None, max_bytes: int = 2 << 30):
        n = len(loader.entries)
        h, w = loader.size
        need = resident_bytes(n, h, w)
        if need > max_bytes:
            raise ValueError(
                f"device_cache: corpus needs {need / 2**30:.2f} GiB resident "
                f"(> {max_bytes / 2**30:.2f} GiB gate) — use --decode_cache "
                "(host mmap) for corpora that exceed HBM headroom"
            )
        _check_wire_loader(loader)
        self._loader = loader
        self.wire_depth_scale = loader.wire_depth_scale
        self.batch_size = loader.batch_size

        # Decode the whole corpus once, then upload it in ONE transfer
        # per tensor.
        rgb, depth = _decode_corpus(loader, n, h, w)

        if mesh is not None:
            from gdn_tpu.parallel.mesh import batch_sharding, replicated

            rep = replicated(mesh)
            self._out = batch_sharding(mesh)
            self.rgb = jax.device_put(rgb, rep)
            self.depth = jax.device_put(depth, rep)
        else:
            self._out = None
            self.rgb = jax.device_put(rgb)
            self.depth = jax.device_put(depth)

        def gather(r, d, i, n_pad):
            b = {"rgb": r[i], "depth": d[i][..., None]}
            if n_pad:
                # zeroed counts decode to mask=0 on device (the wire
                # loaders' own padded-tail convention)
                keep = (jnp.arange(i.shape[0]) < i.shape[0] - n_pad)
                b["depth"] = b["depth"] * keep[:, None, None, None].astype(
                    b["depth"].dtype)
            return b

        kw = {"out_shardings": self._out} if self._out is not None else {}
        self._gather = jax.jit(gather, static_argnums=(3,), **kw)

    def __len__(self) -> int:
        return len(self._loader.entries)

    def seek(self, n_batches: int) -> None:
        self._loader.seek(n_batches)

    def __iter__(self) -> Iterator[Dict[str, jnp.ndarray]]:
        ld = self._loader
        skip, ld._skip = ld._skip, 0
        for idx, n_pad in ld._index_iter():
            if skip:
                skip -= 1
                continue
            yield self._gather(
                self.rgb, self.depth, jnp.asarray(idx, jnp.int32), n_pad
            )


class ShardedDeviceDataset:
    """Corpus-SHARDED device cache: each data-parallel device holds a
    contiguous 1/D slice of the wire corpus and gathers its own batch
    shard LOCALLY (``jax.shard_map``), so the resident-memory gate
    scales with the mesh's data extent — an 8-chip v5e mesh holds 8x
    the corpus ``DeviceResidentDataset`` can (real KITTI's ~40k pairs
    = 10.6 GiB fits at D>=6 where the replicated cache refuses it).
    Per-step host->device traffic stays the (B,) int32 index array.

    Order semantics differ from the wrapped loader BY DESIGN and match
    the multihost input pipeline (`parallel/multihost.py`): each shard
    shuffles and samples ITS OWN slice independently (RNG derived from
    ``(seed, shard)``), and global batch b is the concatenation of the
    D per-shard sub-batches of size B/D.  The stream remains a pure
    function of (seed, batch index), so ``seek()`` resume replays
    exactly.  With a 1-device mesh the index stream IS the wrapped
    loader's own stream (shard 0 reuses the loader's seed), so batches
    are bit-identical to ``DeviceResidentDataset`` apart from padded
    tail rows, which here are all-zero samples (mask 0 on device, the
    same wire padded-tail convention).

    Each shard carries one extra all-zero PAD row; partial tails index
    it instead of repeating real samples, so padding needs no per-step
    static argument (no recompiles) and decodes to mask=0 downstream.
    """

    def __init__(self, loader, mesh, max_bytes_per_device: int = 2 << 30):
        from gdn_tpu.parallel.mesh import (
            DATA_AXIS, batch_sharding, spatial_size,
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        if mesh is None:
            raise ValueError("ShardedDeviceDataset requires a mesh")
        if spatial_size(mesh) > 1:
            raise ValueError(
                "sharded device cache supports 1-D data meshes only "
                "(a spatial mesh shards batch HEIGHT; use "
                "DeviceResidentDataset / --decode_cache there)"
            )
        _check_wire_loader(loader)
        d = int(mesh.shape[DATA_AXIS])
        if loader.batch_size % d:
            raise ValueError(
                f"batch_size {loader.batch_size} not divisible by the "
                f"mesh data extent {d}"
            )
        n = len(loader.entries)
        h, w = loader.size
        n_local = -(-n // d)  # ceil
        need = resident_bytes(n_local + 1, h, w)
        if need > max_bytes_per_device:
            raise ValueError(
                f"sharded device_cache: each of {d} devices needs "
                f"{need / 2**30:.2f} GiB resident "
                f"(> {max_bytes_per_device / 2**30:.2f} GiB gate) — use "
                "--decode_cache (host mmap) instead"
            )
        self._loader = loader
        self._d = d
        self._n_local = n_local
        self._bl = loader.batch_size // d
        self._counts = [
            max(0, min(n - s * n_local, n_local)) for s in range(d)
        ]
        self.wire_depth_scale = loader.wire_depth_scale
        self.batch_size = loader.batch_size
        if loader.loop and min(self._counts) < self._bl:
            raise ValueError(
                f"smallest corpus shard has {min(self._counts)} samples < "
                f"per-device batch {self._bl}; a looping sharded cache "
                "would starve that device (shrink the mesh or batch size)"
            )

        rgb, depth = _decode_corpus(loader, n, h, w)
        # (D, n_local+1, ...) with one trailing all-zero pad row per
        # shard, flattened so axis 0 shards evenly over "data".
        rgb_s = np.zeros((d, n_local + 1, h, w, 3), np.uint8)
        dep_s = np.zeros((d, n_local + 1, h, w), np.uint16)
        for s in range(d):
            c = self._counts[s]
            rgb_s[s, :c] = rgb[s * n_local : s * n_local + c]
            dep_s[s, :c] = depth[s * n_local : s * n_local + c]
        shard = NamedSharding(mesh, P(DATA_AXIS))
        self.rgb = jax.device_put(rgb_s.reshape(-1, h, w, 3), shard)
        self.depth = jax.device_put(dep_s.reshape(-1, h, w), shard)

        def local_gather(r, dep, i):
            # Runs per device on its (n_local+1, ...) block with LOCAL
            # indices — no cross-device collective is ever emitted.
            return {"rgb": r[i], "depth": dep[i][..., None]}

        self._gather = jax.jit(
            jax.shard_map(
                local_gather,
                mesh=mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
            )
        )
        assert batch_sharding(mesh).spec == P(DATA_AXIS)
        self._skip = 0

    def __len__(self) -> int:
        return len(self._loader.entries)

    def seek(self, n_batches: int) -> None:
        self._skip = int(n_batches)

    def _shard_stream(self, s: int) -> Iterator[Tuple[np.ndarray, int]]:
        ld = self._loader
        # Shard 0 reuses the loader's own seed so a 1-device mesh
        # reproduces the wrapped loader's exact stream.
        rng = np.random.default_rng(
            ld._seed if s == 0 else [ld._seed, s]
        )
        order = np.arange(self._counts[s])
        while True:
            if ld.shuffle:
                rng.shuffle(order)
            yield from iter_batch_indices(order, self._bl, ld.loop)
            if not ld.loop:
                break

    def _index_iter(self) -> Iterator[np.ndarray]:
        """Global (B,) LOCAL-index batches; pad rows -> the pad slot."""
        pad = self._n_local
        fill = (np.full((self._bl,), pad, np.int64), 0)
        streams = [self._shard_stream(s) for s in range(self._d)]
        zipped = (
            zip(*streams) if self._loader.loop
            else itertools.zip_longest(*streams, fillvalue=fill)
        )
        for subs in zipped:
            out = np.empty((self.batch_size,), np.int32)
            for s, (idx, n_pad) in enumerate(subs):
                blk = idx.astype(np.int32, copy=True)
                if n_pad:
                    blk[-n_pad:] = pad
                out[s * self._bl : (s + 1) * self._bl] = blk
            yield out

    def __iter__(self) -> Iterator[Dict[str, jnp.ndarray]]:
        skip, self._skip = self._skip, 0
        for idx in self._index_iter():
            if skip:
                skip -= 1
                continue
            yield self._gather(self.rgb, self.depth, jnp.asarray(idx))
