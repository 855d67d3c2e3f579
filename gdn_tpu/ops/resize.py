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
    b, h, w, c = x.shape
    x_up = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    x_dn = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    r0 = 0.25 * x_up + 0.75 * x
    r1 = 0.75 * x + 0.25 * x_dn
    y = jnp.stack([r0, r1], axis=2).reshape(b, 2 * h, w, c)
    y_lf = jnp.concatenate([y[:, :, :1], y[:, :, :-1]], axis=2)
    y_rt = jnp.concatenate([y[:, :, 1:], y[:, :, -1:]], axis=2)
    c0 = 0.25 * y_lf + 0.75 * y
    c1 = 0.75 * y + 0.25 * y_rt
    return jnp.stack([c0, c1], axis=3).reshape(b, 2 * h, 2 * w, c)
