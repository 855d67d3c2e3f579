"""KITTI loaders (SURVEY.md §2.1).

Host side does only decode + resize-to-train-size; all augmentation is
the jitted on-device graph (data/augment.py).  Two loaders mirror the
reference's surfaces:

- ``KittiTrainDataset``: SfMLearner-style prepared training data at
  128x416 — a list file whose lines are ``<rgb_path> <depth_path>``
  (paths relative to ``data_path``); depth may be ``.npy`` (float32
  meters) or 16-bit PNG (KITTI depth-annotation convention, value/256 m).
- ``KittiEvalDataset``: Eigen test split (697 images) — yields the RGB
  resized to train resolution plus the *raw-resolution* GT depth map
  (from .npy/.png, or projected from velodyne via data/velodyne.py),
  matching the protocol of upsampling predictions to GT size before
  scoring (SURVEY.md §2.7/§3.3).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def parse_list(path: str) -> List[List[str]]:
    """Parse a list file into per-line token lists; '#' comments allowed."""
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            entries.append(line.split())
    return entries


def _png_bit_depth(path: str) -> int:
    """PNG bit depth from the IHDR header (offset 24: 8-byte signature
    + 4 length + 'IHDR' + 4 width + 4 height); 0 if unreadable."""
    try:
        with open(path, "rb") as f:
            head = f.read(25)
        if len(head) == 25 and head[:8] == b"\x89PNG\r\n\x1a\n":
            return head[24]
    except OSError:
        pass
    return 0


def load_rgb(path: str, size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Decode an RGB image to float32 [0,1], optionally resized (H, W)
    with bilinear interpolation (matches ops/resize semantics)."""
    return load_rgb_u8(path, size).astype(np.float32) / 255.0


def load_rgb_u8(path: str, size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Decode an RGB image to uint8, optionally resized (H, W).

    PIL resizes in the uint8 domain, so this is the EXACT wire form of
    ``load_rgb`` (which is this array / 255) — the uint8 H2D wire for
    DataConfig.train_wire="auto" is lossless on the PIL path."""
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size[1], size[0]), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


def load_depth(path: str, size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Load a depth map in meters.

    ``.npy``: float32 meters.  ``.png``: 16-bit KITTI depth annotation
    (uint16 / 256.0 m; 0 = invalid).  Resize (if any) uses NEAREST so
    sparse LiDAR points are not smeared into neighbors.
    """
    if path.endswith(".npy"):
        depth = np.load(path).astype(np.float32)
    else:
        img = Image.open(path)
        arr = np.asarray(img)
        if arr.dtype == np.uint16:
            depth = arr.astype(np.float32) / 256.0
        else:
            depth = arr.astype(np.float32)
    if size is not None and depth.shape != tuple(size):
        img = Image.fromarray(depth)
        img = img.resize((size[1], size[0]), Image.NEAREST)
        depth = np.asarray(img, dtype=np.float32)
    return depth


from gdn_tpu.data.batching import SeekableLoaderMixin


class KittiTrainDataset(SeekableLoaderMixin):
    """Batched iterator over prepared KITTI training pairs.

    Yields host batches {'rgb' (B,H,W,3), 'depth' (B,H,W,1),
    'mask' (B,H,W,1)} ready for device transfer + on-device augmentation.
    ``seek(n)`` (SeekableLoaderMixin) resumes the data order at batch n.
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
        loop: bool = True,
        use_native: bool = True,
        wire: str = "auto",
        cache_dir: str = "",
    ):
        self.data_path = data_path
        self.entries = parse_list(os.path.join(data_path, list_file))
        if not self.entries:
            raise ValueError(f"empty list file {list_file}")
        for e in self.entries:
            if len(e) != 2:
                raise ValueError(
                    f"train list lines must be '<rgb> <depth>', got {e!r}"
                )
        self.size = size
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.max_depth = max_depth
        self.loop = loop
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        # Native C++ threaded decode (native/gdn_io.cpp) when the .so is
        # built and the depth files are 16-bit PNGs; PIL otherwise.
        # The native path applies the KITTI uint16/256-m convention
        # unconditionally, while load_depth treats non-uint16 PNGs as
        # raw meters — so the gate must check the actual PNG bit depth
        # (first entry; the annotation archives are homogeneous), not
        # just the extension, or the two paths would silently train on
        # depths 256x apart.
        if use_native:
            from gdn_tpu.data import native_io

            self._native = (
                native_io.available()
                and all(e[1].endswith(".png") for e in self.entries)
                and _png_bit_depth(
                    os.path.join(data_path, self.entries[0][1])
                ) == 16
            )
        else:
            self._native = False
        # H2D wire format (DataConfig.train_wire): "auto" ships uint8
        # RGB + uint16 depth counts and the on-device pipeline decodes
        # (data/augment.decode_wire_batch) — lossless on the PIL RGB
        # path and for 16-bit-PNG depth; the native decoder's
        # antialiased float RGB quantizes by <=1/510.
        self._wire = wire == "auto"
        self.wire_depth_scale = 256.0
        # Decoded-sample cache (data/cache.py): epoch 1 decodes + fills,
        # later epochs serve wire-dtype samples at memcpy speed.  The
        # cached form IS the wire form (uint8 RGB / uint16 counts), so
        # wire="auto" batches are bit-identical to uncached ones; the
        # f32 path converts on read (RGB quantized <=1/510 vs the
        # native decoder's float output — same delta as the wire path).
        self._cache = None
        if cache_dir:
            from gdn_tpu.data.cache import DecodedSampleCache, corpus_key

            self._cache = DecodedSampleCache(
                cache_dir, len(self.entries), size, 256.0,
                corpus_key(self.entries, size, 256.0),
            )

    def __len__(self) -> int:
        return len(self.entries)

    def _load_pair(self, entry: Sequence[str]):
        rgb = load_rgb_u8(os.path.join(self.data_path, entry[0]), self.size)
        depth = load_depth(os.path.join(self.data_path, entry[1]), self.size)
        return rgb, depth

    def _decode_wire(self, idx) -> Tuple[np.ndarray, np.ndarray]:
        """Canonical wire-dtype decode of the given entry indices:
        (B,H,W,3) uint8 RGB + (B,H,W) uint16 /256-m depth counts
        (exact for 16-bit-PNG sources; .npy float sources quantize by
        <=1/512 m — the documented train_wire="auto" semantics)."""
        if self._native:
            from gdn_tpu.data import native_io

            rgb_paths = [
                os.path.join(self.data_path, self.entries[i][0]) for i in idx
            ]
            d_paths = [
                os.path.join(self.data_path, self.entries[i][1]) for i in idx
            ]
            rgb = native_io.decode_rgb_batch(rgb_paths, *self.size)
            rgb = np.clip(np.round(rgb * 255.0), 0, 255).astype(np.uint8)
            depth = native_io.decode_depth_batch(d_paths, *self.size)
        else:
            rgbs, depths = zip(*(self._load_pair(self.entries[i]) for i in idx))
            rgb = np.stack(rgbs)
            depth = np.stack(depths)
        depth16 = np.clip(np.round(depth * 256.0), 0, 65535).astype(np.uint16)
        return rgb, depth16

    def _make_batch(self, idx) -> Dict[str, np.ndarray]:
        idx = np.asarray(idx)
        if self._cache is not None:
            hit, miss = self._cache.split_hits(idx)
            if len(miss) == 0:
                rgb, depth16 = self._cache.read(idx)
            else:
                h, w = self.size
                rgb = np.empty((len(idx), h, w, 3), np.uint8)
                depth16 = np.empty((len(idx), h, w), np.uint16)
                if len(hit):
                    rgb[hit], depth16[hit] = self._cache.read(idx[hit])
                mr, md = self._decode_wire(idx[miss])
                rgb[miss], depth16[miss] = mr, md
                self._cache.write(idx[miss], mr, md)
            depth16 = depth16[..., None]
            if self._wire:
                return {"rgb": rgb, "depth": depth16}
            depth = depth16.astype(np.float32) / 256.0
            mask = ((depth > 0.0) & (depth < self.max_depth)).astype(
                np.float32)
            return {
                "rgb": rgb.astype(np.float32) / 255.0,
                "depth": np.clip(depth, 0.0, self.max_depth),
                "mask": mask,
            }
        if self._wire:
            rgb, depth16 = self._decode_wire(idx)
            return {"rgb": rgb, "depth": depth16[..., None]}
        if self._native:
            from gdn_tpu.data import native_io

            rgb = native_io.decode_rgb_batch(
                [os.path.join(self.data_path, self.entries[i][0])
                 for i in idx], *self.size,
            )
            depth = native_io.decode_depth_batch(
                [os.path.join(self.data_path, self.entries[i][1])
                 for i in idx], *self.size,
            )[..., None]
        else:
            rgbs, depths = zip(*(self._load_pair(self.entries[i]) for i in idx))
            rgb = np.stack(rgbs).astype(np.float32) / 255.0
            depth = np.stack(depths)[..., None]
        mask = ((depth > 0.0) & (depth < self.max_depth)).astype(np.float32)
        return {
            "rgb": rgb,
            "depth": np.clip(depth, 0.0, self.max_depth),
            "mask": mask,
        }

    # __iter__ comes from SeekableLoaderMixin (index replay + seek).


class KittiEvalDataset:
    """Eigen-split eval iterator: {'rgb' (1,H,W,3), 'gt' (1,Hg,Wg)}.

    List lines: ``<rgb_path> <gt_source>`` where gt_source is a depth
    .npy/.png, or a velodyne ``.bin`` (then ``calib_dir`` must hold the
    KITTI calibration files and projection runs via data/velodyne.py).
    """

    def __init__(
        self,
        data_path: str,
        list_file: str,
        size: Tuple[int, int] = (128, 416),
        calib_dir: Optional[str] = None,
    ):
        self.data_path = data_path
        self.entries = parse_list(os.path.join(data_path, list_file))
        self.size = size
        self.calib_dir = calib_dir

    def __len__(self) -> int:
        return len(self.entries)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for entry in self.entries:
            rgb_path, gt_path = entry[0], entry[1]
            rgb = load_rgb(os.path.join(self.data_path, rgb_path), self.size)
            full = os.path.join(self.data_path, gt_path)
            if gt_path.endswith(".bin"):
                from gdn_tpu.data.velodyne import depth_from_velodyne_files

                raw_shape = np.asarray(
                    Image.open(os.path.join(self.data_path, rgb_path))
                ).shape[:2]
                gt = depth_from_velodyne_files(full, self.calib_dir, raw_shape)
            else:
                gt = load_depth(full)
            yield {"rgb": rgb[None], "gt": gt[None].astype(np.float32)}
