"""Memmap-backed decoded-sample cache for the train loaders.

Image decode dominates the host side of disk-fed training on small
hosts: measured on the 1-CPU container, the native loader sustains
~168-257 imgs/sec decoding 128x416 PNGs while the chip consumes 2165
imgs/sec (BASELINE.md round 4, "disk-fed pipeline").  For corpora that
fit local disk, decoding the same PNG every epoch is pure waste — the
standard fix (tf.data ``.cache()`` analogue) is to persist the decoded
samples once and serve every later epoch from a flat mmap at memcpy
speed.

Layout under ``cache_dir`` (one cache per (list, resolution) pair):

- ``manifest.json`` — ``{n, height, width, depth_scale, key}``; ``key``
  fingerprints the entry list + decode geometry, so a stale cache
  (different corpus, size, or scale) is detected and rebuilt, never
  silently served.
- ``rgb.u8``    — (N, H, W, 3) uint8 memmap.
- ``depth.u16`` — (N, H, W) uint16 depth-count memmap (value/scale m —
  the loaders' own wire convention: exact for 16-bit-PNG sources,
  <=1/(2*scale) m quantization for float .npy sources, identical to
  the default ``train_wire="auto"`` H2D path).
- ``valid.u8``  — (N,) per-sample populated flags: the cache fills
  lazily as the first epoch decodes, so there is no separate warmup
  pass and a partially-built cache is always correct.

The stored dtypes ARE the wire dtypes, so a cache hit is
decode-AND-quantize-free; the f32 path converts on read.
"""

from __future__ import annotations

import fcntl
import hashlib
import json
import os
import threading
from typing import Sequence, Tuple

import numpy as np

_MANIFEST = "manifest.json"
_LOCKFILE = "lock"

# flock handles this process holds, keyed by realpath(cache_dir): the
# lock is exclusive ACROSS processes but shared WITHIN one (reopening a
# dataset on the same cache dir — the persistence tests' pattern — is
# single-writer by construction under the GIL).  Held for the process
# lifetime; the OS releases them at exit.
_HELD_LOCKS: dict = {}
_HELD_LOCKS_GUARD = threading.Lock()


def _acquire_dir_lock(cache_dir: str) -> None:
    """Exclusive cross-process flock on ``cache_dir`` (ADVICE round 4):
    the cache fills lazily for a whole epoch, so a second PROCESS on the
    same directory could interleave a mode="w+" truncating rebuild with
    this process's live r+ memmaps — torn reads behind already-set
    valid flags.  Taken BEFORE the fresh/rebuild decision; a held lock
    is a loud refusal, never silent corruption."""
    key = os.path.realpath(cache_dir)
    with _HELD_LOCKS_GUARD:
        if key in _HELD_LOCKS:
            return
        f = open(os.path.join(cache_dir, _LOCKFILE), "w")
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            f.close()
            raise RuntimeError(
                f"decode cache {cache_dir!r} is locked by another "
                f"process — each concurrent run needs its own "
                f"--decode_cache directory (or wait for the holder to "
                f"exit)"
            ) from None
        _HELD_LOCKS[key] = f


def corpus_key(entries, size: Tuple[int, int], depth_scale: float) -> str:
    """Fingerprint of the decode geometry + entry list."""
    h = hashlib.sha1()
    h.update(f"{size[0]}x{size[1]}@{depth_scale}".encode())
    for e in entries:
        h.update(" ".join(e).encode())
        h.update(b"\n")
    return h.hexdigest()


class DecodedSampleCache:
    """Lazily-populated mmap cache of decoded (rgb_u8, depth_count)
    samples at train resolution."""

    def __init__(
        self,
        cache_dir: str,
        n: int,
        size: Tuple[int, int],
        depth_scale: float,
        key: str,
    ):
        self.dir = cache_dir
        h, w = size
        os.makedirs(cache_dir, exist_ok=True)
        _acquire_dir_lock(cache_dir)
        manifest = {
            "n": n, "height": h, "width": w,
            "depth_scale": depth_scale, "key": key,
        }
        mpath = os.path.join(cache_dir, _MANIFEST)
        fresh = True
        if os.path.exists(mpath):
            try:
                with open(mpath) as f:
                    fresh = json.load(f) != manifest
            except (OSError, ValueError):
                fresh = True
        if not fresh:
            # the manifest alone isn't proof: deleted/truncated array
            # files behind a surviving manifest must rebuild, not crash
            # np.memmap(mode="r+") at construction
            sizes = {"rgb.u8": n * h * w * 3, "depth.u16": n * h * w * 2,
                     "valid.u8": n}
            for fname, want in sizes.items():
                fp = os.path.join(cache_dir, fname)
                if not os.path.exists(fp) or os.path.getsize(fp) < want:
                    fresh = True
                    break
        mode = "w+" if fresh else "r+"
        self.rgb = np.memmap(
            os.path.join(cache_dir, "rgb.u8"), np.uint8, mode,
            shape=(n, h, w, 3),
        )
        self.depth = np.memmap(
            os.path.join(cache_dir, "depth.u16"), np.uint16, mode,
            shape=(n, h, w),
        )
        self.valid = np.memmap(
            os.path.join(cache_dir, "valid.u8"), np.uint8, mode, shape=(n,),
        )
        if fresh:
            self.valid[:] = 0
            with open(mpath, "w") as f:
                json.dump(manifest, f)

    def split_hits(self, idx: Sequence[int]):
        """Partition batch indices into (hit_positions, miss_positions)
        relative to the batch."""
        flags = self.valid[np.asarray(idx)]
        pos = np.arange(len(idx))
        return pos[flags > 0], pos[flags == 0]

    def read(self, idx: Sequence[int]):
        """(B,H,W,3) uint8 + (B,H,W) uint16 copies for cached indices."""
        a = np.asarray(idx)
        return self.rgb[a], self.depth[a]

    def write(self, idx: Sequence[int], rgb_u8: np.ndarray,
              depth16: np.ndarray) -> None:
        for j, i in enumerate(idx):
            self.rgb[i] = rgb_u8[j]
            self.depth[i] = depth16[j]
        # flag last: a crash mid-write leaves the sample "missing", not
        # half-written-but-trusted
        self.valid[np.asarray(idx)] = 1
