"""NYU Depth v2 loaders (SURVEY.md §2.1): indoor RGB-D pairs at
228x304, 10 m cap, standard 654-image test split.

Two on-disk formats are supported:
- pair lists like KITTI (``<rgb> <depth>`` per line; depth .npy meters
  or 16-bit png in millimeters — the common NYU png convention), and
- the official ``nyu_depth_v2_labeled.mat`` (h5) when h5py is present.

The NYU protocol center-crops the 640x480 frames to the white-border-
free region before resizing; ``center_crop_nyu`` implements the
standard (45:471, 41:601) crop.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from gdn_tpu.data.kitti import load_rgb, parse_list

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

# Standard NYU crop of the valid projection region on 480x640 frames.
NYU_CROP = (45, 471, 41, 601)


def center_crop_nyu(arr: np.ndarray) -> np.ndarray:
    if arr.shape[0] == 480 and arr.shape[1] == 640:
        t, b, l, r = NYU_CROP
        return arr[t:b, l:r]
    return arr


def load_nyu_depth(path: str, size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Depth in meters from .npy (meters) or 16-bit png (millimeters)."""
    if path.endswith(".npy"):
        depth = np.load(path).astype(np.float32)
    else:
        arr = np.asarray(Image.open(path))
        depth = arr.astype(np.float32)
        if arr.dtype == np.uint16:
            depth /= 1000.0  # mm -> m
    depth = center_crop_nyu(depth)
    if size is not None and depth.shape != tuple(size):
        img = Image.fromarray(depth)
        depth = np.asarray(
            img.resize((size[1], size[0]), Image.NEAREST), dtype=np.float32
        )
    return depth


from gdn_tpu.data.batching import SeekableLoaderMixin


class NyuTrainDataset(SeekableLoaderMixin):
    """Same batch contract as KittiTrainDataset, at 228x304 / 10 m;
    ``seek(n)`` (SeekableLoaderMixin) resumes the data order at batch n."""

    def __init__(
        self,
        data_path: str,
        list_file: str,
        size: Tuple[int, int] = (228, 304),
        batch_size: int = 32,
        shuffle: bool = True,
        seed: int = 0,
        max_depth: float = 10.0,
        loop: bool = True,
        wire: str = "auto",
        cache_dir: str = "",
    ):
        self.data_path = data_path
        self.entries = parse_list(os.path.join(data_path, list_file))
        if not self.entries:
            raise ValueError(f"empty list file {list_file}")
        self.size = size
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.max_depth = max_depth
        self.loop = loop
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        # uint8 RGB + uint16 mm-count depth wire (see kitti.py /
        # DataConfig.train_wire); mm counts are the NYU png convention,
        # so png-sourced depth rides losslessly (scale 1000).
        self._wire = wire == "auto"
        self.wire_depth_scale = 1000.0
        # Decoded-sample cache (data/cache.py, see KittiTrainDataset):
        # cached form = wire form (uint8 RGB / uint16 mm counts).
        self._cache = None
        if cache_dir:
            from gdn_tpu.data.cache import DecodedSampleCache, corpus_key

            self._cache = DecodedSampleCache(
                cache_dir, len(self.entries), size, 1000.0,
                corpus_key(self.entries, size, 1000.0),
            )

    def __len__(self) -> int:
        return len(self.entries)

    def _decode_raw(self, idx):
        """Shared per-entry decode: (B,H,W,3) uint8 RGB (cropped +
        resized) and (B,H,W) float32 depth meters — the single place
        the NYU crop/resize geometry lives (wire and f32 paths both
        consume it)."""
        from gdn_tpu.data.kitti import load_rgb_u8

        rgbs, depths = [], []
        for i in idx:
            rgb_rel, d_rel = self.entries[i][:2]
            rgb = load_rgb_u8(os.path.join(self.data_path, rgb_rel))
            rgb = center_crop_nyu(rgb)
            if rgb.shape[:2] != self.size:
                rgb = np.asarray(
                    Image.fromarray(rgb).resize(
                        (self.size[1], self.size[0]), Image.BILINEAR
                    ),
                    dtype=np.uint8,
                )
            rgbs.append(rgb)
            depths.append(
                load_nyu_depth(os.path.join(self.data_path, d_rel), self.size)
            )
        return np.stack(rgbs), np.stack(depths)

    def _decode_wire(self, idx):
        """(B,H,W,3) uint8 RGB + (B,H,W) uint16 mm counts (exact for
        NYU mm-PNG sources; float .npy quantizes by <=0.5 mm)."""
        rgb, depth = self._decode_raw(idx)
        depth16 = np.clip(
            np.round(depth * 1000.0), 0, 65535
        ).astype(np.uint16)
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
        elif self._wire:
            rgb, depth16 = self._decode_wire(idx)
            return {"rgb": rgb, "depth": depth16[..., None]}
        else:
            # Uncached f32 path: full-precision float depth (no mm
            # quantization for .npy sources).
            rgb, depth = self._decode_raw(idx)
            depth = depth[..., None]
            mask = ((depth > 0.0) & (depth < self.max_depth)).astype(
                np.float32)
            return {
                "rgb": rgb.astype(np.float32) / 255.0,
                "depth": np.clip(depth, 0.0, self.max_depth),
                "mask": mask,
            }
        depth16 = depth16[..., None]
        if self._wire:
            return {"rgb": rgb, "depth": depth16}
        depth = depth16.astype(np.float32) / 1000.0
        mask = ((depth > 0.0) & (depth < self.max_depth)).astype(np.float32)
        return {
            "rgb": rgb.astype(np.float32) / 255.0,
            "depth": np.clip(depth, 0.0, self.max_depth),
            "mask": mask,
        }

    # __iter__ comes from SeekableLoaderMixin (index replay + seek).


class NyuLabeledMatDataset:
    """Reader for the official ``nyu_depth_v2_labeled.mat`` (HDF5):
    1449 aligned RGB-D frames, 'images' (N,3,640,480) uint8 and
    'depths' (N,640,480) float32 meters, stored transposed (W, H).

    ``split`` selects frames by index list (the standard 654-image test
    split indices can be passed directly).  Yields the same eval
    contract as NyuEvalDataset.
    """

    def __init__(
        self,
        mat_path: str,
        size: Tuple[int, int] = (228, 304),
        indices: Optional[list] = None,
        batch_mode: str = "eval",  # "eval" -> rgb+raw gt; "train" -> pairs
    ):
        import h5py

        self._h5 = h5py.File(mat_path, "r")
        self.size = size
        n = self._h5["images"].shape[0]
        self.indices = list(indices) if indices is not None else list(range(n))
        self.batch_mode = batch_mode

    def __len__(self) -> int:
        return len(self.indices)

    def _frame(self, i: int):
        # stored as (3, W, H) / (W, H): transpose to (H, W, .)
        rgb = np.asarray(self._h5["images"][i]).transpose(2, 1, 0)
        depth = np.asarray(self._h5["depths"][i]).transpose(1, 0)
        return rgb.astype(np.float32) / 255.0, depth.astype(np.float32)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for i in self.indices:
            rgb, depth = self._frame(i)
            rgb = center_crop_nyu(rgb)
            depth = center_crop_nyu(depth)
            img = Image.fromarray((rgb * 255).astype(np.uint8))
            rgb_small = (
                np.asarray(
                    img.resize((self.size[1], self.size[0]), Image.BILINEAR),
                    dtype=np.float32,
                )
                / 255.0
            )
            yield {"rgb": rgb_small[None], "gt": depth[None]}


class NyuEvalDataset:
    """Eval iterator: {'rgb' (1,228,304,3), 'gt' (1,Hg,Wg)} with GT at
    the cropped native resolution (426x560)."""

    def __init__(
        self,
        data_path: str,
        list_file: str,
        size: Tuple[int, int] = (228, 304),
    ):
        self.data_path = data_path
        self.entries = parse_list(os.path.join(data_path, list_file))
        self.size = size

    def __len__(self) -> int:
        return len(self.entries)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for entry in self.entries:
            rgb = load_rgb(os.path.join(self.data_path, entry[0]))
            rgb = center_crop_nyu(rgb)
            img = Image.fromarray((rgb * 255).astype(np.uint8))
            rgb = (
                np.asarray(
                    img.resize((self.size[1], self.size[0]), Image.BILINEAR),
                    dtype=np.float32,
                )
                / 255.0
            )
            gt = load_nyu_depth(os.path.join(self.data_path, entry[1]))
            yield {"rgb": rgb[None], "gt": gt[None].astype(np.float32)}
