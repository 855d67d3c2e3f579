"""Windowed SSIM on depth maps, TPU-first.

The reference computes SSIM loss with framework conv ops (SURVEY.md
§2.4).  Here the Gaussian window is applied as two *matmuls* instead of
a depthwise conv: blurring H×W maps along an axis is a band-matrix
product, which XLA lowers straight onto the MXU — the same trick the
fused Pallas loss kernel (kernels/fused_loss.py) uses, so the two paths
are numerically identical by construction.

Layout: NHWC with C=1 squeezed away internally; inputs are (B, H, W)
or (B, H, W, 1) float32 depth maps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(window: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Normalized 1-D Gaussian, matching the standard SSIM window."""
    half = (window - 1) / 2.0
    x = np.arange(window, dtype=np.float64) - half
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def blur_matrix(size: int, window: int = 11, sigma: float = 1.5) -> np.ndarray:
    """(size, size) band matrix M with M @ x = gaussian-blur of x along
    axis 0, using reflect ('symmetric'-style, edge-exclusive) padding.

    Dense on purpose: at eval/train resolutions (<=512) a dense matmul
    on the MXU beats a gather-based band product, and the matrix is
    built once at trace time as a constant.
    """
    g = gaussian_kernel_1d(window, sigma).astype(np.float64)
    half = window // 2
    m = np.zeros((size, size), dtype=np.float64)
    for i in range(size):
        for t in range(window):
            j = i + t - half
            # reflect padding (cv2 BORDER_REFLECT_101 / np 'reflect')
            if j < 0:
                j = -j
            elif j >= size:
                j = 2 * size - 2 - j
            m[i, j] += g[t]
    return m.astype(np.float32)


def gaussian_window(window: int = 11, sigma: float = 1.5) -> np.ndarray:
    """2-D separable window (window, window), sums to 1."""
    g = gaussian_kernel_1d(window, sigma)
    return np.outer(g, g)


PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _blur(
    x: jnp.ndarray, my: jnp.ndarray, mx: jnp.ndarray, precision
) -> jnp.ndarray:
    """Separable Gaussian blur of (B, H, W) via two MXU matmuls.

    precision: TPU fp32 matmuls default to bf16-mantissa passes; the
    later variance cancellation (E[x^2] - mu^2) then carries absolute
    errors comparable to SSIM's c2 stabilizer at metric-depth scales
    (which flipped denominators negative and NaN'd training before the
    [0,1] normalization + clamps landed).  The caller picks the
    speed/accuracy point; losses.py exposes it as LossConfig.ssim_precision.
    """
    # (B,H,W): blur rows: my @ x  -> einsum over H; blur cols: x @ mx^T.
    x = jnp.einsum("hk,bkw->bhw", my, x, preferred_element_type=jnp.float32,
                   precision=precision)
    x = jnp.einsum("bhk,wk->bhw", x, mx, preferred_element_type=jnp.float32,
                   precision=precision)
    return x


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    max_val: float = 1.0,
    window: int = 11,
    sigma: float = 1.5,
    mean: bool = True,
    precision: str = "highest",
) -> jnp.ndarray:
    """SSIM between depth maps.

    Args:
      pred/target: (B, H, W) or (B, H, W, 1), float32, values in
        [0, max_val].
      max_val: dynamic range L of the inputs.
      mean: if True return scalar mean SSIM, else the (B, H, W) map.
    """
    if pred.ndim == 4:
        pred = pred[..., 0]
        target = target[..., 0]
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    h, w = pred.shape[-2], pred.shape[-1]
    my = jnp.asarray(blur_matrix(h, window, sigma))
    mx = jnp.asarray(blur_matrix(w, window, sigma))

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    prec = PRECISIONS[precision]

    mu_x = _blur(pred, my, mx, prec)
    mu_y = _blur(target, my, mx, prec)
    mu_xx = _blur(pred * pred, my, mx, prec)
    mu_yy = _blur(target * target, my, mx, prec)
    mu_xy = _blur(pred * target, my, mx, prec)

    # clamp: exact-math non-negative, but float cancellation can dip
    # below zero and destabilize the denominator
    sigma_x = jnp.maximum(mu_xx - mu_x * mu_x, 0.0)
    sigma_y = jnp.maximum(mu_yy - mu_y * mu_y, 0.0)
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2.0 * mu_x * mu_y + c1) * (2.0 * sigma_xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    ssim_map = num / den
    if mean:
        return jnp.mean(ssim_map)
    return ssim_map
