"""Resize ops with pinned interpolation semantics.

SURVEY.md §7 flags fp32 bit-comparable eval as a hard part because
resize kernels differ between PIL/cv2 and jax.image.  We pin the exact
semantics here and use these helpers everywhere (eval upsampling to GT
resolution, resize-conv upsample blocks, augmentation) so the whole
framework agrees on one interpolation:

- bilinear: ``jax.image.resize(method="bilinear")`` == cv2
  ``INTER_LINEAR`` with half-pixel centers (verified by the torch
  oracle in tests/test_ops.py against
  ``torch.nn.functional.interpolate(align_corners=False)``).
- nearest: floor-based nearest with half-pixel centers.

All resizes run in float32 on device regardless of the compute dtype.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _resize(
    x: jnp.ndarray, size: Tuple[int, int], method: str, precise: bool = True
) -> jnp.ndarray:
    """Resize the (H, W) axes of (..., H, W, C) or (H, W) arrays.

    precise=True (default) computes in float32 regardless of input
    dtype — the eval-protocol contract.  precise=False keeps the input
    dtype (bf16 feature maps inside the network: full-res f32
    intermediates were a measurable HBM-traffic cost).
    """
    orig_dtype = x.dtype
    xc = x.astype(jnp.float32) if precise else x
    if x.ndim == 2:
        out = jax.image.resize(xc, size, method=method)
    else:
        shape = (*x.shape[:-3], size[0], size[1], x.shape[-1])
        out = jax.image.resize(xc, shape, method=method)
    return out.astype(orig_dtype)


def resize_bilinear(
    x: jnp.ndarray, size: Tuple[int, int], precise: bool = True
) -> jnp.ndarray:
    return _resize(x, size, "bilinear", precise)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    return _resize(x, size, "nearest")


def compose_bilinear_deconv_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """Compose a 3x3 conv kernel with the exact-2x bilinear upsample into
    ONE (6, 6, cin, cout) stride-2 ``conv_transpose`` kernel.

    With ``lax.conv_transpose(x, W6, strides=(2, 2), padding="SAME")``
    the result equals ``conv3x3_SAME(resize_bilinear(x, 2x))`` on all
    interior output pixels (verified to float rounding in
    tests/test_models.py); only the outer ring differs (zero padding vs
    the resize's edge clamp).  Used as the ``deconv_init="bilinear"``
    initializer so the deconv decoder starts as the SAME function as
    the resize_conv decoder — removing the init confound (checkerboard
    artifacts) from the deconv-vs-resize_conv convergence comparison
    while keeping deconv's single-op throughput.
    """
    b = jnp.asarray([0.25, 0.75, 0.75, 0.25], k3.dtype)
    b2 = b[:, None] * b[None, :]  # (4, 4) separable bilinear taps
    w = jnp.zeros((6, 6, *k3.shape[2:]), k3.dtype)
    for dy in range(3):
        for dx in range(3):
            w = w.at[dy:dy + 4, dx:dx + 4].add(
                b2[:, :, None, None] * k3[dy, dx][None, None]
            )
    return w


def _up_v(x: jnp.ndarray) -> jnp.ndarray:
    """Vertical exact-2x bilinear (half-pixel centers, edge clamp) of
    (B, H, W, C) via shifts/interleave — rows 2i = 0.25·x[i-1]+0.75·x[i],
    rows 2i+1 = 0.75·x[i]+0.25·x[i+1], clamped at the ends."""
    b, h, w, c = x.shape
    x_up = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    x_dn = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    r0 = 0.25 * x_up + 0.75 * x
    r1 = 0.75 * x + 0.25 * x_dn
    return jnp.stack([r0, r1], axis=2).reshape(b, 2 * h, w, c)


def _up_h(x: jnp.ndarray) -> jnp.ndarray:
    """Horizontal counterpart of :func:`_up_v`."""
    b, h, w, c = x.shape
    x_lf = jnp.concatenate([x[:, :, :1], x[:, :, :-1]], axis=2)
    x_rt = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
    c0 = 0.25 * x_lf + 0.75 * x
    c1 = 0.75 * x + 0.25 * x_rt
    return jnp.stack([c0, c1], axis=3).reshape(b, h, 2 * w, c)


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-2x bilinear upsample of (B, H, W, C), half-pixel centers,
    edge clamp — bit-identical to ``resize_bilinear(x, (2H, 2W))`` in
    the input dtype, but built from shifts/concats/interleaves only.

    Why it exists: ``jax.image.resize`` lowers to per-axis dot_generals
    that transpose the resized axis to the front — at decoder shapes
    this produced chains of ~109 MB relayout copies per resize (fwd and
    bwd, both nets), a dominant share of the train step's HBM traffic.
    This formulation is layout-preserving and fuses into neighbors.
    """
    return _up_h(_up_v(x))


_DN = ("NHWC", "HWIO", "NHWC")


def composed_resize_conv2x(x: jnp.ndarray, k3: jnp.ndarray) -> jnp.ndarray:
    """``conv3x3_SAME(resize_bilinear(x, 2x))`` computed WITHOUT ever
    materializing the 2x-resized tensor — exact everywhere, including
    the boundary (float-rounding level: fwd ~3e-6, grads ~5e-7
    relative; tests/test_ops.py).

    The two ops are linear, so their composition is ONE stride-2
    ``conv_transpose`` with the 6x6 kernel
    :func:`compose_bilinear_deconv_kernel`\\ (k3) — recomputed from the
    SAME (3,3,cin,cout) parameter every call, so the trained function
    space (and checkpoints) stay exactly resize_conv's while the bulk
    of the compute runs at the deconv branch's speed (no 4x-resized
    intermediate: ~7 GB/step less HBM traffic at B=128, BASELINE.md
    round 4).  The composed kernel only matches on interior pixels
    (the resize's edge CLAMP vs the transpose conv's zero padding), so
    the outer 2 output rows/cols are recomputed exactly via the
    reference path on thin input slabs (2 input rows/cols each) and
    stitched in with concats — O(boundary) extra work.

    Requires H >= 2 and W >= 2 (callers fall back to the unfused path
    otherwise, models/blocks.py UpBlock).
    """
    b, h, w, cin = x.shape
    w6 = compose_bilinear_deconv_kernel(k3)
    y = jax.lax.conv_transpose(x, w6, (2, 2), "SAME",
                               dimension_numbers=_DN)

    def conv(u, pad_h, pad_w):
        return jax.lax.conv_general_dilated(
            u, k3, (1, 1), (pad_h, pad_w), dimension_numbers=_DN)

    zrow = jnp.zeros((b, 1, 2 * w, cin), x.dtype)
    zcol = jnp.zeros((b, 2 * h - 2, 1, cin), x.dtype)
    # top: output rows 0..1 need U rows 0..2 (from x rows 0..1) plus the
    # conv's zero row above; conv VALID vertically, SAME horizontally.
    ut = _up_h(_up_v(x[:, 0:2])[:, 0:3])
    top = conv(jnp.concatenate([zrow, ut], axis=1), (0, 0), (1, 1))
    # bottom: U rows 2h-3..2h-1 from x rows h-2..h-1; zero row below.
    ub = _up_h(_up_v(x[:, h - 2:])[:, 1:4])
    bot = conv(jnp.concatenate([ub, zrow], axis=1), (0, 0), (1, 1))
    # left: output rows 2..2h-3, cols 0..1 need U rows 1..2h-2 x cols
    # 0..2 (from x cols 0..1); zero col at the left, VALID both ways.
    ul = _up_h(_up_v(x[:, :, 0:2])[:, 1:2 * h - 1])[:, :, 0:3]
    left = conv(jnp.concatenate([zcol, ul], axis=2), (0, 0), (0, 0))
    # right: mirror.
    ur = _up_h(_up_v(x[:, :, w - 2:])[:, 1:2 * h - 1])[:, :, 1:4]
    right = conv(jnp.concatenate([ur, zcol], axis=2), (0, 0), (0, 0))

    mid = jnp.concatenate([left, y[:, 2:-2, 2:-2], right], axis=2)
    return jnp.concatenate([top, mid, bot], axis=1)
