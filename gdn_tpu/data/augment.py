"""On-device augmentation graph (SURVEY.md §2.1 TPU-native plan).

The reference augments per-sample on host CPU workers (PIL/cv2 resize,
crop, flip, color jitter).  Here the whole augmentation is ONE jitted
XLA program over the batch, so the host only decodes; everything else
runs on-chip and overlaps with the train step.

Static-shape design (TPU requirement): per-sample random *scale* is
implemented as an affine warp — a fixed (H, W) sampling grid per sample
with per-sample scale/offset — instead of a dynamic-shape resize+crop.

The warp is SEPARABLE (zoom + translation + flip act per-axis), so it
is evaluated as two per-sample interpolation-matrix matmuls on the MXU
(rows then columns) — the same band-matrix trick as the SSIM blurs —
NOT as per-pixel gathers: 2-D dynamic gathers measured 528 ms per
B=128 batch on TPU (8x the train step!) while the matmul form is
~100x cheaper.  Nearest-neighbor matrices are one-hot, so depth/mask
values are copied exactly (matmuls at HIGHEST precision), keeping
sparse-LiDAR validity crisp.

Geometric ops are applied identically to RGB, depth and mask ("depth-gt
alignment"); zooming by s divides depth by s (a zoom-in shortens the
effective focal distance; standard supervised-depth practice), and
nearest sampling keeps sparse-LiDAR validity masks crisp.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from gdn_tpu.config import DataConfig


def _sample_bilinear(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Gather-based reference (tests only — 2-D gathers are ~100x
    slower than the matrix path on TPU).  img (H, W, C); ys/xs (H', W')
    float pixel coords -> (H', W', C)."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i, y1i, x0i, x1i = (a.astype(jnp.int32) for a in (y0, y1, x0, x1))
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def _sample_nearest(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Gather-based reference (tests only); see _sample_bilinear."""
    h, w = img.shape[0], img.shape[1]
    yi = jnp.clip(jnp.round(ys), 0, h - 1).astype(jnp.int32)
    xi = jnp.clip(jnp.round(xs), 0, w - 1).astype(jnp.int32)
    return img[yi, xi]


def _interp_matrix(coords: jnp.ndarray, n: int, nearest: bool) -> jnp.ndarray:
    """(m, n) interpolation matrix M with (M @ v)[i] = v sampled at
    ``coords[i]`` — bilinear (two taps, matching _sample_bilinear's
    clip-then-weight edge semantics incl. its slight edge
    extrapolation) or nearest (one-hot: values copied exactly)."""
    idx = jnp.arange(n, dtype=jnp.float32)[None, :]
    if nearest:
        sel = jnp.clip(jnp.round(coords), 0, n - 1)[:, None]
        return (idx == sel).astype(jnp.float32)
    c0 = jnp.clip(jnp.floor(coords), 0, n - 1)
    c1 = jnp.clip(c0 + 1, 0, n - 1)
    w = (coords - c0)[:, None]
    m = (idx == c0[:, None]).astype(jnp.float32) * (1.0 - w)
    m = m + (idx == c1[:, None]).astype(jnp.float32) * w
    return m


def _warp_separable(img, ys, xs, nearest: bool):
    """img (H, W, C) warped at separable coords ys (H,), xs (W,) via two
    MXU matmuls.  HIGHEST precision: one-hot/2-tap weights make the
    products exact, so nearest mode copies depth/mask values bit-close
    (bf16-mantissa default passes would round 80 m depths by ~0.25)."""
    h, w = img.shape[0], img.shape[1]
    my = _interp_matrix(ys, h, nearest)  # (H, H)
    mx = _interp_matrix(xs, w, nearest)  # (W, W)
    out = jnp.einsum("ij,jwc->iwc", my, img,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("xw,iwc->ixc", mx, out,
                      precision=jax.lax.Precision.HIGHEST)


def _augment_one(
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    scale_min: float,
    scale_max: float,
    do_flip: bool,
    do_crop: bool,
    do_jitter: bool,
    jitter: float,
):
    h, w = rgb.shape[0], rgb.shape[1]
    k = jax.random.split(key, 6)

    # --- geometric: zoom-in by s with random crop window -------------
    if do_crop:
        s = jax.random.uniform(k[0], (), minval=scale_min, maxval=scale_max)
    else:
        s = jnp.float32(1.0)
    # source window size h/s x w/s, random top-left inside the image
    max_oy = h - h / s
    max_ox = w - w / s
    oy = jax.random.uniform(k[1], ()) * max_oy
    ox = jax.random.uniform(k[2], ()) * max_ox
    ys = oy + (jnp.arange(h, dtype=jnp.float32) + 0.5) / s - 0.5
    xs = ox + (jnp.arange(w, dtype=jnp.float32) + 0.5) / s - 0.5

    # --- horizontal flip (applied to the 1-D sampling coords) --------
    if do_flip:
        flip = jax.random.bernoulli(k[3])
        xs = jnp.where(flip, (w - 1.0) - xs, xs)

    rgb = _warp_separable(rgb, ys, xs, nearest=False)
    depth = _warp_separable(depth, ys, xs, nearest=True) / s  # zoom-in -> nearer
    mask = _warp_separable(mask, ys, xs, nearest=True)

    # --- photometric (RGB only) --------------------------------------
    if do_jitter:
        jk = jax.random.split(k[4], 3)
        brightness = jax.random.uniform(
            jk[0], (), minval=1.0 - jitter, maxval=1.0 + jitter
        )
        contrast = jax.random.uniform(
            jk[1], (), minval=1.0 - jitter, maxval=1.0 + jitter
        )
        saturation = jax.random.uniform(
            jk[2], (), minval=1.0 - jitter, maxval=1.0 + jitter
        )
        rgb = rgb * brightness
        mean = jnp.mean(rgb, axis=(0, 1), keepdims=True)
        rgb = (rgb - mean) * contrast + mean
        gray = jnp.mean(rgb, axis=-1, keepdims=True)
        rgb = (rgb - gray) * saturation + gray
        rgb = jnp.clip(rgb, 0.0, 1.0)

    return rgb, depth, mask


@partial(
    jax.jit,
    static_argnames=(
        "scale_min", "scale_max", "do_flip", "do_crop", "do_jitter", "jitter"
    ),
)
def _augment_jit(key, rgb, depth, mask, scale_min, scale_max, do_flip,
                 do_crop, do_jitter, jitter):
    keys = jax.random.split(key, rgb.shape[0])
    fn = partial(
        _augment_one,
        scale_min=scale_min, scale_max=scale_max, do_flip=do_flip,
        do_crop=do_crop, do_jitter=do_jitter, jitter=jitter,
    )
    return jax.vmap(fn)(rgb, depth, mask, keys)


@partial(jax.jit, static_argnames=("max_depth", "depth_scale"))
def decode_wire_batch(
    batch: Dict[str, jnp.ndarray], *, max_depth: float,
    depth_scale: float = 256.0,
) -> Dict[str, jnp.ndarray]:
    """Device-side decode of a wire-format train batch
    (DataConfig.train_wire="auto"): uint8 RGB -> float32 [0,1], uint16
    depth counts -> clipped float32 meters + the validity mask the host
    used to compute (mask = 0 < d < max_depth, so host-zeroed padded
    rows stay masked out).  Already-float leaves pass through, making
    this a no-op on "f32"-wire batches."""
    out = dict(batch)
    rgb = batch["rgb"]
    if rgb.dtype == jnp.uint8:
        out["rgb"] = rgb.astype(jnp.float32) / 255.0
    depth = batch["depth"]
    if depth.dtype == jnp.uint16:
        d = depth.astype(jnp.float32) * (1.0 / depth_scale)
        out["mask"] = ((d > 0.0) & (d < max_depth)).astype(jnp.float32)
        out["depth"] = jnp.clip(d, 0.0, max_depth)
    return out


def augment_batch(
    key: jax.Array, batch: Dict[str, jnp.ndarray], cfg: DataConfig
) -> Dict[str, jnp.ndarray]:
    """Jitted on-device augmentation of {'rgb','depth','mask'}.

    rgb (B,H,W,3) in [0,1]; depth (B,H,W,1) meters; mask (B,H,W,1).
    """
    rgb, depth, mask = _augment_jit(
        key, batch["rgb"], batch["depth"], batch["mask"],
        scale_min=cfg.scale_range[0], scale_max=cfg.scale_range[1],
        do_flip=cfg.random_flip, do_crop=cfg.random_crop,
        do_jitter=cfg.color_jitter, jitter=cfg.jitter_strength,
    )
    out = dict(batch)
    out.update(rgb=rgb, depth=depth, mask=mask)
    return out
