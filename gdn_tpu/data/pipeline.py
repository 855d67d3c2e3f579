"""Host->device input pipeline glue.

The reference overlaps loading with compute via torch DataLoader worker
processes (SURVEY.md §2.1/§3.1).  The TPU-native equivalent:

  host decode (threads)  ->  prefetch queue  ->  device_put (sharded)
                                             ->  on-device jitted aug

``prefetch_to_device`` runs the host iterator in a background thread
and keeps `size` batches already transferred (and mesh-sharded) ahead
of the consumer, so H2D transfer overlaps the train step.
``make_train_pipeline`` composes loader + prefetch + augmentation.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp

from gdn_tpu.config import Config
from gdn_tpu.data.augment import augment_batch, decode_wire_batch
from gdn_tpu.parallel.mesh import shard_batch


def prefetch_to_device(
    iterator: Iterable[Dict[str, Any]],
    size: int = 2,
    mesh=None,
) -> Iterator[Dict[str, Any]]:
    """Background-thread prefetch; batches arrive already on device
    (sharded over `mesh` when given).

    Cancellation-safe: a consumer that abandons the generator (early
    exit, exception upstream) releases the producer via ``stop`` —
    otherwise the thread would block forever on the full queue, pinning
    device-resident batches for the process lifetime."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    stop = threading.Event()
    err: list = []

    def producer():
        try:
            for batch in iterator:
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                else:
                    batch = jax.device_put(batch)
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except Exception as e:  # propagate to consumer
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.2)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


def make_train_pipeline(
    cfg: Config,
    loader: Iterable[Dict[str, Any]],
    mesh=None,
    augment: bool = True,
    seed: Optional[int] = None,
    skip: int = 0,
) -> Iterator[Dict[str, Any]]:
    """loader -> device prefetch -> on-device augmentation.

    ``skip``: number of batches already consumed by a resumed run; the
    augmentation key chain is fast-forwarded by that many splits so the
    resumed stream is bit-identical to an uninterrupted one (the loader
    itself must be ``seek(skip)``-ed by the caller — scripts/train.py).
    """
    key = jax.random.PRNGKey(cfg.train.seed if seed is None else seed)
    for _ in range(skip):
        key, _ = jax.random.split(key)
    # Wire-format batches (uint8 RGB / uint16 depth counts,
    # DataConfig.train_wire="auto") decode on device; the counts->meters
    # scale is the loader's encoding (256 KITTI, 1000 NYU-mm).
    depth_scale = float(getattr(loader, "wire_depth_scale", 256.0))
    max_depth = float(cfg.model.max_depth)
    for batch in prefetch_to_device(loader, cfg.data.prefetch, mesh):
        if batch["rgb"].dtype == jnp.uint8 or batch["depth"].dtype == jnp.uint16:
            batch = decode_wire_batch(
                batch, max_depth=max_depth, depth_scale=depth_scale
            )
        if augment:
            key, sub = jax.random.split(key)
            batch = augment_batch(sub, batch, cfg.data)
        yield batch


class CachedSampleIterable:
    """Host-side memoization of a (re-)iterable sample stream.

    In-training evaluation (``--eval_every``) re-reads the SAME eval
    split every few epochs; for disk-backed splits that re-pays the
    full decode each time.  This wrapper materializes the samples on
    the first pass (up to ``max_bytes`` — oversized splits fall back to
    re-iteration, never OOM the host) and replays the cached list on
    every later pass.  ``max_items`` bounds the pass itself (mirrors
    evaluate()'s ``max_images`` so no unused tail is decoded or held).
    """

    def __init__(self, factory, max_items: Optional[int] = None,
                 max_bytes: int = 1 << 30):
        self._factory = factory
        self._max_items = max_items
        self._max_bytes = max_bytes
        self._samples: Optional[list] = None
        self._too_big = False

    def __call__(self) -> Iterator[Dict[str, Any]]:
        if self._samples is not None:
            return iter(self._samples)
        if self._too_big:
            return iter(self._factory())
        return self._fill()

    def _fill(self) -> Iterator[Dict[str, Any]]:
        acc: list = []
        nbytes = 0
        for i, s in enumerate(self._factory()):
            if self._max_items is not None and i >= self._max_items:
                break
            if acc is not None:
                nbytes += sum(
                    getattr(v, "nbytes", 0) for v in s.values()
                )
                if nbytes > self._max_bytes:
                    self._too_big = True
                    acc = None
                else:
                    acc.append(s)
            yield s
        if acc is not None:
            self._samples = acc


def make_loader(cfg: Config, split: str = "train"):
    """Construct the host loader named by cfg.data.dataset (the
    reference's --dataset flag surface, SURVEY.md §2.13)."""
    h, w = cfg.model.image_size
    d = cfg.data
    if d.dataset == "synthetic":
        if d.loader == "grain":
            raise ValueError(
                "--loader grain needs an on-disk dataset (kitti or nyu); "
                "synthetic data is generated on device"
            )
        from gdn_tpu.data.synthetic import (
            SyntheticDataset, SyntheticEvalDataset,
        )

        if split == "eval":
            return SyntheticEvalDataset(
                height=h, width=w, max_depth=cfg.model.max_depth,
            )
        return SyntheticDataset(
            batch_size=d.batch_size, height=h, width=w,
            max_depth=cfg.model.max_depth, seed=cfg.train.seed,
        )
    if d.dataset == "kitti":
        from gdn_tpu.data.kitti import KittiEvalDataset, KittiTrainDataset

        if split == "train":
            if d.loader == "grain":
                if d.decode_cache:
                    raise ValueError(
                        "--decode_cache supports the native loader only "
                        "(grain owns its own worker-side transform chain)"
                    )
                from gdn_tpu.data.grain_loader import GrainKittiDataset

                # grain_workers=0 (in-process) is the 1-CPU-container
                # default; multiprocess resume is exact either way via
                # the checkpointed iterator state (state_dict_at).
                return GrainKittiDataset(
                    d.data_path, d.train_list, (h, w), d.batch_size,
                    seed=cfg.train.seed, max_depth=cfg.model.max_depth,
                    worker_count=d.grain_workers, wire=d.train_wire,
                )
            return KittiTrainDataset(
                d.data_path, d.train_list, (h, w), d.batch_size,
                seed=cfg.train.seed, max_depth=cfg.model.max_depth,
                wire=d.train_wire, cache_dir=d.decode_cache,
            )
        return KittiEvalDataset(
            d.data_path, d.val_list, (h, w),
            calib_dir=d.calib_dir or None,
        )
    if d.dataset == "nyu":
        from gdn_tpu.data.nyu import NyuEvalDataset, NyuTrainDataset

        if split == "train":
            if d.loader == "grain":
                if d.decode_cache:
                    raise ValueError(
                        "--decode_cache supports the native loader only "
                        "(grain owns its own worker-side transform chain)"
                    )
                from gdn_tpu.data.grain_loader import GrainKittiDataset

                return GrainKittiDataset(
                    d.data_path, d.train_list, (h, w), d.batch_size,
                    seed=cfg.train.seed, max_depth=cfg.model.max_depth,
                    worker_count=d.grain_workers, dataset="nyu",
                    wire=d.train_wire,
                )
            return NyuTrainDataset(
                d.data_path, d.train_list, (h, w), d.batch_size,
                seed=cfg.train.seed, max_depth=cfg.model.max_depth,
                wire=d.train_wire, cache_dir=d.decode_cache,
            )
        return NyuEvalDataset(d.data_path, d.val_list, (h, w))
    raise ValueError(f"unknown dataset {d.dataset!r}")
