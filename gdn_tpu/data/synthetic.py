"""Synthetic RGB-D data fixture (SURVEY.md §7 step 3).

Generates procedural scenes with a *learnable* RGB<->depth relationship
so integration tests and benchmarks exercise the full pipeline without
KITTI on disk: depth is a smooth "ground plane + boxes" field; RGB is a
deterministic shading of that depth plus texture noise.  Entirely
jittable — batches can be generated on-device, which also makes it a
zero-IO benchmark source.
"""

from __future__ import annotations

from typing import Dict, Iterator

import jax
import jax.numpy as jnp
from functools import partial


@partial(jax.jit, static_argnames=("batch_size", "height", "width", "max_depth"))
def synthetic_batch(
    key: jax.Array,
    batch_size: int = 4,
    height: int = 128,
    width: int = 416,
    max_depth: float = 80.0,
) -> Dict[str, jnp.ndarray]:
    """One synthetic batch: {'rgb','depth','mask'}.

    Depth: a road-like vertical gradient (near at bottom, far at top)
    with K random frontal rectangles ("obstacles") at random depths.
    RGB: channels derived from normalized depth (inverse shading +
    horizontal position) + noise, so a network can regress depth from
    RGB but not trivially copy a channel.
    Mask: ~95% of pixels valid (random dropout mimics sparse LiDAR GT).
    """
    keys = jax.random.split(key, 5)
    b, h, w = batch_size, height, width

    rows = jnp.linspace(1.0, 0.12, h).reshape(1, h, 1)  # top far, bottom near
    base = rows * max_depth * jax.random.uniform(
        keys[0], (b, 1, 1), minval=0.6, maxval=1.0
    )

    # K random boxes per image, each at a constant depth.
    K = 6
    bk = jax.random.split(keys[1], 4)
    cy = jax.random.uniform(bk[0], (b, K, 1, 1), minval=0.2, maxval=0.9)
    cx = jax.random.uniform(bk[1], (b, K, 1, 1), minval=0.05, maxval=0.95)
    sz = jax.random.uniform(bk[2], (b, K, 1, 1), minval=0.04, maxval=0.18)
    bd = jax.random.uniform(bk[3], (b, K, 1, 1), minval=0.05, maxval=0.7)

    yy = jnp.linspace(0.0, 1.0, h).reshape(1, 1, h, 1)
    xx = jnp.linspace(0.0, 1.0, w).reshape(1, 1, 1, w)
    inside = (
        (jnp.abs(yy - cy) < sz) & (jnp.abs(xx - cx) < sz * 1.5)
    ).astype(jnp.float32)  # (b, K, h, w)
    box_depth = bd * max_depth
    # nearest (minimum) box depth wins where boxes overlap
    cand = jnp.where(inside > 0, box_depth * jnp.ones_like(inside), jnp.inf)
    nearest_box = jnp.min(cand, axis=1)  # (b, h, w)
    depth = jnp.minimum(base, nearest_box)
    depth = jnp.clip(depth, 0.5, max_depth)

    nd = depth / max_depth
    shade = 1.0 / (0.25 + 0.75 * nd)  # near = bright
    shade = shade / shade.max()
    tex = 0.1 * jax.random.normal(keys[2], (b, h, w))
    r = jnp.clip(shade + tex, 0.0, 1.0)
    g = jnp.clip(0.8 * (1.0 - nd) + 0.2 * xx[:, 0] + tex, 0.0, 1.0)
    bch = jnp.clip(0.3 + 0.5 * nd + tex, 0.0, 1.0)
    rgb = jnp.stack([r, g, bch], axis=-1)

    mask = (jax.random.uniform(keys[3], (b, h, w)) > 0.05).astype(jnp.float32)

    return {
        "rgb": rgb.astype(jnp.float32),
        "depth": depth[..., None].astype(jnp.float32),
        "mask": mask[..., None],
    }


class SyntheticEvalDataset:
    """Bounded eval-split facade matching the KITTI/NYU eval loader
    interface: yields per-image {'rgb' (1,H,W,3), 'gt' (1,H,W)} so the
    full eval protocol (evaluate.py: upsample->crop/cap->metric table)
    runs end-to-end without data on disk (scripts/eval.py --dataset
    synthetic; exercised by tests/test_cli_integration.py)."""

    def __init__(
        self,
        n_images: int = 32,
        height: int = 128,
        width: int = 416,
        max_depth: float = 80.0,
        seed: int = 999,
    ):
        self.n_images = n_images
        self.height = height
        self.width = width
        self.max_depth = max_depth
        self.seed = seed

    def __len__(self) -> int:
        return self.n_images

    def __iter__(self) -> Iterator[Dict[str, jnp.ndarray]]:
        import numpy as np

        key = jax.random.PRNGKey(self.seed)
        for _ in range(self.n_images):
            key, sub = jax.random.split(key)
            b = synthetic_batch(sub, 1, self.height, self.width,
                                self.max_depth)
            yield {
                "rgb": np.asarray(b["rgb"]),
                "gt": np.asarray(b["depth"])[..., 0],
            }


class SyntheticDataset:
    """Iterator facade matching the KITTI/NYU loader interface."""

    def __init__(
        self,
        batch_size: int = 4,
        height: int = 128,
        width: int = 416,
        max_depth: float = 80.0,
        seed: int = 0,
    ):
        self.batch_size = batch_size
        self.height = height
        self.width = width
        self.max_depth = max_depth
        self._key = jax.random.PRNGKey(seed)
        self._skip = 0

    def seek(self, n_batches: int) -> None:
        """Resume the batch stream at batch ``n_batches`` (deterministic
        key replay; same contract as data/batching.SeekableLoaderMixin)."""
        self._skip = int(n_batches)

    def __iter__(self) -> Iterator[Dict[str, jnp.ndarray]]:
        key = self._key
        skip, self._skip = self._skip, 0
        for _ in range(skip):
            key, _ = jax.random.split(key)
        while True:
            key, sub = jax.random.split(key)
            yield synthetic_batch(
                sub, self.batch_size, self.height, self.width, self.max_depth
            )
