"""Grain-based host input pipeline (SURVEY.md §2.1 TPU-native plan:
"decode on host via grain/tf.data, then ... jitted JAX ops on device").

An alternative to the thread/native-C++ loaders in data/kitti.py —
grain gives deterministic index-based sampling, multiprocess decode
workers, and ITERATOR CHECKPOINTING (get_state/set_state), which is
the strongest form of the data-order-resume contract
(data/batching.SeekableLoaderMixin): the exact mid-epoch cursor
round-trips through the orbax payload as a small JSON blob.

The loader yields the same host batches as KittiTrainDataset
({'rgb' (B,H,W,3), 'depth' (B,H,W,1), 'mask' (B,H,W,1)}), so it drops
into make_train_pipeline / the trainers unchanged.  Select it with
``DataConfig.loader = "grain"``.

NOTE on workers: this container has ONE cpu, so worker_count defaults
to 0 (in-process); on real hosts raise DataConfig.num_workers.
"""

from __future__ import annotations

import collections
import json
import os
import threading
from typing import Dict, Iterator, Optional, Tuple

import numpy as np


class _PairSource:
    """grain RandomAccessDataSource over '<rgb> <depth>' list entries;
    decodes one UNBATCHED sample per index (grain batches downstream).

    ``wire=True`` (DataConfig.train_wire="auto"): samples ride as uint8
    RGB + uint16 depth counts (counts = round(depth * wire_scale)) and
    the device pipeline decodes — same contract as the native loaders
    (data/kitti.py)."""

    wire_scale = 256.0  # KITTI 16-bit-PNG counts-per-meter

    def __init__(self, data_path: str, entries, size: Tuple[int, int],
                 max_depth: float, wire: bool = False):
        self.data_path = data_path
        self.entries = entries
        self.size = size
        self.max_depth = max_depth
        self.wire = wire

    def __repr__(self) -> str:
        # Stable across instances: grain validates repr(data_source) on
        # set_state, and the default repr embeds the object address.
        return (
            f"_PairSource(path={self.data_path!r}, n={len(self.entries)}, "
            f"size={tuple(self.size)}, max_depth={self.max_depth}, "
            f"wire={self.wire})"
        )

    def __len__(self) -> int:
        return len(self.entries)

    def _decode(self, rgb_path: str, d_path: str):
        """-> (uint8 rgb, float depth in meters); the uint8 RGB is the
        exact PIL wire form (load_rgb == this array / 255)."""
        from gdn_tpu.data.kitti import load_depth, load_rgb_u8

        return load_rgb_u8(rgb_path, self.size), load_depth(d_path, self.size)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        rgb_rel, d_rel = self.entries[i]
        rgb, depth = self._decode(
            os.path.join(self.data_path, rgb_rel),
            os.path.join(self.data_path, d_rel),
        )
        depth = depth[..., None]
        if self.wire:
            d16 = np.clip(
                np.round(depth * self.wire_scale), 0, 65535
            ).astype(np.uint16)
            return {"rgb": rgb, "depth": d16}
        mask = ((depth > 0.0) & (depth < self.max_depth)).astype(np.float32)
        return {
            "rgb": rgb.astype(np.float32) / 255.0,
            "depth": np.clip(depth, 0.0, self.max_depth).astype(np.float32),
            "mask": mask,
        }


class _NyuPairSource(_PairSource):
    """NYU decode semantics (data/nyu.py): center-crop the white border
    before resizing; depth png is millimeters."""

    wire_scale = 1000.0  # NYU mm-PNG counts-per-meter

    def __repr__(self) -> str:
        return "Nyu" + super().__repr__()

    def _decode(self, rgb_path: str, d_path: str):
        from gdn_tpu.data.kitti import load_rgb_u8
        from gdn_tpu.data.nyu import center_crop_nyu, load_nyu_depth

        rgb = center_crop_nyu(load_rgb_u8(rgb_path))
        if rgb.shape[:2] != tuple(self.size):
            from PIL import Image

            rgb = np.asarray(
                Image.fromarray(rgb).resize(
                    (self.size[1], self.size[0]), Image.BILINEAR
                ),
                dtype=np.uint8,
            )
        return rgb, load_nyu_depth(d_path, self.size)


class GrainKittiDataset:
    """KITTI train loader on grain: deterministic shuffled sampling,
    optional worker processes, checkpointable iterator.

    Interface parity with KittiTrainDataset: iterate for batches;
    ``state_dict()`` / ``load_state_dict()`` capture/restore the exact
    stream position (finer than seek(n): grain tracks per-index state).
    ``seek(n)`` is provided for the shared resume contract and is
    implemented via grain's native state (no decoding replay).
    """

    def __init__(
        self,
        data_path: str,
        list_file: str,
        size: Tuple[int, int] = (128, 416),
        batch_size: int = 32,
        shuffle: bool = True,
        seed: int = 0,
        max_depth: float = 80.0,
        num_epochs: Optional[int] = None,
        worker_count: int = 0,
        dataset: str = "kitti",
        wire: str = "auto",
    ):
        import grain.python as pg

        from gdn_tpu.data.kitti import parse_list

        entries = parse_list(os.path.join(data_path, list_file))
        if not entries:
            raise ValueError(f"empty list file {list_file}")
        for e in entries:
            if len(e) != 2:
                raise ValueError(
                    f"train list lines must be '<rgb> <depth>', got {e!r}"
                )
        self.batch_size = batch_size
        src_cls = _NyuPairSource if dataset == "nyu" else _PairSource
        self._source = src_cls(
            data_path, entries, size, max_depth, wire=wire == "auto"
        )
        # make_train_pipeline's device-side decode scale (see kitti.py)
        self.wire_depth_scale = src_cls.wire_scale
        self._loader = pg.DataLoader(
            data_source=self._source,
            sampler=pg.IndexSampler(
                num_records=len(entries),
                shuffle=shuffle,
                seed=seed,
                num_epochs=num_epochs,
                shard_options=pg.NoSharding(),
            ),
            operations=[pg.Batch(batch_size, drop_remainder=True)],
            worker_count=worker_count,
        )
        self._it = None
        # Consumption-aligned state log: (produced_count, state) after
        # each yielded batch, PLUS a base entry for the current rebase
        # point (iterator creation / load_state_dict / seek).  A
        # prefetch queue between this loader and the trainer means the
        # raw cursor runs up to prefetch-depth batches AHEAD of what was
        # trained on; state_dict_at(step) returns the state matching the
        # trainer's actual position.  The log is the ONLY source
        # state_dict_at reads: grain iterators are not documented safe
        # for cross-thread access racing next(), so EVERY iterator
        # touch (next / get_state / set_state) happens under
        # _state_lock — including the producer's next(), so a
        # load_state_dict/seek rebase can never interleave with an
        # in-flight batch (ADVICE rounds 4+5).
        self._produced = 0
        self._state_log: collections.deque = collections.deque(maxlen=64)
        # The producer (prefetch thread) appends while the trainer
        # thread reads state_dict_at at checkpoint time — guard both,
        # plus the produced counter and lazy iterator creation.
        self._state_lock = threading.Lock()

    def __len__(self) -> int:
        return len(self._source)

    def _iterator(self):
        with self._state_lock:
            if self._it is None:
                self._it = iter(self._loader)
                # Seed the log so state_dict_at(rebase point) is served
                # from producer-written entries even before any batch.
                if not self._state_log:
                    self._state_log.append(
                        (self._produced, self._it.get_state())
                    )
            return self._it

    # -- checkpointable stream position ---------------------------------
    def state_dict(self) -> str:
        """JSON state of the RAW stream position (grain get_state; bytes
        in grain 0.2.x) — small enough to ride in the orbax payload.
        With a prefetch queue downstream, checkpoint
        :meth:`state_dict_at` instead (this cursor includes batches that
        were produced but never consumed by the trainer).  Call only
        from the thread driving the iterator: get_state() racing a
        concurrent next() is undefined (state_dict_at is the
        thread-safe form — it reads producer-written log entries)."""
        it = self._iterator()
        with self._state_lock:
            return it.get_state().decode()

    def state_dict_at(self, consumed: int) -> str:
        """Stream state as of ``consumed`` produced batches — the
        checkpoint-correct form when a prefetch queue sits between this
        loader and the trainer (scripts/train.py passes the trainer's
        step count, which counts data batches consumed).  Works for any
        worker_count: grain's get_state captures the multiprocess
        cursor, unlike seek() (single index stream only)."""
        self._iterator()  # ensure the log holds its base entry
        with self._state_lock:
            for n, s in self._state_log:
                if n == consumed:
                    return s.decode() if isinstance(s, bytes) else s
        raise ValueError(
            f"no recorded loader state for batch {consumed} "
            f"(produced={self._produced}, log window="
            f"{len(self._state_log)}/{self._state_log.maxlen}); states "
            f"are recorded per produced batch and the log keeps the "
            f"most recent {self._state_log.maxlen}"
        )

    def load_state_dict(self, state: str, produced: int = 0) -> None:
        """Restore a state_dict()/state_dict_at() position.  ``produced``
        re-bases the batch counter so later state_dict_at(step) calls
        line up with the trainer's absolute step count."""
        it = self._iterator()
        with self._state_lock:
            it.set_state(state.encode())
            self._produced = produced
            self._state_log.clear()
            self._state_log.append((produced, state))

    def seek(self, n_batches: int) -> None:
        """Shared resume contract (SeekableLoaderMixin): position the
        stream at batch ``n_batches`` by advancing grain's index state —
        sampling only, no image decode.  Supports worker_count=0 (one
        index stream); multiprocess loaders should round-trip
        state_dict()/load_state_dict() instead."""
        it = self._iterator()
        with self._state_lock:
            obj = json.loads(it.get_state().decode())
            last = obj.get("last_seen_indices")
            if last is None or len(last) != 1:
                raise NotImplementedError(
                    "seek() supports worker_count=0; use state_dict()/"
                    "load_state_dict() for multiprocess loaders"
                )
            # worker 0 sees consecutive indices; batch n starts at record
            # n*batch_size, so the last seen index is one before that.
            key = next(iter(last))
            obj["last_seen_indices"][key] = n_batches * self.batch_size - 1
            new_state = json.dumps(obj)
            it.set_state(new_state.encode())
            self._produced = n_batches
            self._state_log.clear()
            self._state_log.append((n_batches, new_state))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        it = self._iterator()
        while True:
            # next() + the state capture run as ONE critical section:
            # a checkpoint-time state_dict_at blocks for at most one
            # batch decode, and a rebase (load_state_dict/seek) can
            # never mutate the cursor mid-next().  Raw bytes:
            # get_state() is paid per batch (the checkpoint may ask for
            # ANY recent batch); the str decode is deferred to the
            # once-per-epoch read.
            with self._state_lock:
                try:
                    batch = next(it)
                except StopIteration:
                    return
                self._produced += 1
                self._state_log.append((self._produced, it.get_state()))
            yield batch


# The class predates NYU support; the generic alias is the public name
# for non-KITTI use (dataset="nyu" selects _NyuPairSource decode).
GrainPairDataset = GrainKittiDataset
