"""Single fused Pallas TPU kernel for the depth training loss.

The reference computes L1 + gradient + SSIM losses as a chain of
framework ops (SURVEY.md §2.4); the BASELINE north-star asks for them
to "compile into a single fused reduction kernel".  This kernel does
one pass over each image in VMEM and emits all partial sums at once:

  [ Σ|p−g|·m,  Σm,  Σ|∂x p−∂x g|·m∂x,  Σm∂x,
    Σ|∂y p−∂y g|·m∂y,  Σm∂y,  Σ SSIM(p,g),  HW ]

so HBM traffic is exactly one read of pred/gt/mask per step instead of
one per loss term.  The SSIM Gaussian window is applied as two dense
band-matrix matmuls (rows then cols) that run on the MXU — the same
formulation as ops/ssim.py, so the two paths agree to float tolerance.

The backward pass is an analytic custom-VJP Pallas kernel (see
`_bwd_kernel`): sign fields for the L1/gradient terms and the closed-
form SSIM adjoint (3 transposed-blur applications), again one VMEM
pass per image.

Grid: one program per batch image; a 128x416 fp32 image plus its ~8
working maps is ~2.5 MB — comfortably inside the ~16 MB VMEM budget.

Use `fused_loss_terms(...)`; equivalence with the pure-jnp path is
enforced by tests/test_kernels.py (values and gradients).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdn_tpu.ops.ssim import PRECISIONS as _JNP_PRECISIONS, blur_matrix

# Mosaic's dot lowering implements DEFAULT (1 bf16-mantissa MXU pass)
# and HIGHEST (6 passes ≈ fp32) but NOT HIGH — map "high" up to HIGHEST
# inside kernels (the jnp path in ops/ssim.py still honors true HIGH).
PRECISIONS = dict(_JNP_PRECISIONS, high=_JNP_PRECISIONS["highest"])

# Output column layout of the forward kernel.
_L1, _NM, _GX, _NGX, _GY, _NGY, _SSIM, _NPIX = range(8)
_NOUT = 8


def _ssim_stats(p, g, my, mx, c1, c2, prec):
    """Blurred moments + SSIM map pieces; all (H, W) fp32, MXU matmuls."""

    def blur(x):
        # prec: see ops/ssim._blur — inputs are normalized to [0,1] here
        # so variance-cancellation error is bounded by the clamps/c2
        # rather than scaling with (metric depth)^2; the precision knob
        # trades residual SSIM error against MXU passes (bf16 mantissa
        # x1/x3/x6 for DEFAULT/HIGH/HIGHEST).
        x = jnp.dot(my, x, preferred_element_type=jnp.float32,
                    precision=prec)
        return jnp.dot(x, mx, preferred_element_type=jnp.float32,
                       precision=prec)

    mu_x = blur(p)
    mu_y = blur(g)
    # clamped: non-negative in exact math
    sxx = jnp.maximum(blur(p * p) - mu_x * mu_x, 0.0)
    syy = jnp.maximum(blur(g * g) - mu_y * mu_y, 0.0)
    sxy = blur(p * g) - mu_x * mu_y
    n1 = 2.0 * mu_x * mu_y + c1
    n2 = 2.0 * sxy + c2
    d1 = mu_x * mu_x + mu_y * mu_y + c1
    d2 = sxx + syy + c2
    return mu_x, mu_y, n1, n2, d1, d2


def _fwd_kernel(pred_ref, gt_ref, mask_ref, my_ref, mx_ref, out_ref,
                *, c1, c2, inv_max, prec):
    # out_ref is the full (B, 8) array (small tiles are not legal TPU
    # blocks); each program writes its own row.
    b = pl.program_id(0)
    p = pred_ref[0].astype(jnp.float32)
    g = gt_ref[0].astype(jnp.float32)
    m = mask_ref[0].astype(jnp.float32)

    # L1 term
    out_ref[b, _L1] = jnp.sum(jnp.abs(p - g) * m)
    out_ref[b, _NM] = jnp.sum(m)

    # gradient terms (forward differences; pair-valid masks)
    dxp = p[:, 1:] - p[:, :-1]
    dxg = g[:, 1:] - g[:, :-1]
    mdx = m[:, 1:] * m[:, :-1]
    out_ref[b, _GX] = jnp.sum(jnp.abs(dxp - dxg) * mdx)
    out_ref[b, _NGX] = jnp.sum(mdx)
    dyp = p[1:, :] - p[:-1, :]
    dyg = g[1:, :] - g[:-1, :]
    mdy = m[1:, :] * m[:-1, :]
    out_ref[b, _GY] = jnp.sum(jnp.abs(dyp - dyg) * mdy)
    out_ref[b, _NGY] = jnp.sum(mdy)

    # SSIM term: blur via MXU matmuls (mx is passed pre-transposed so
    # in-kernel it is a plain right-multiply).  Inputs are normalized
    # to [0,1] here (SSIM is scale invariant): even if a backend runs
    # the blur at bf16-mantissa precision, the variance-cancellation
    # error then stays below the clamps/c2 instead of scaling with
    # (metric depth)^2.
    my = my_ref[:].astype(jnp.float32)
    mx = mx_ref[:].astype(jnp.float32)
    _, _, n1, n2, d1, d2 = _ssim_stats(
        p * inv_max, g * inv_max, my, mx, c1, c2, prec
    )
    out_ref[b, _SSIM] = jnp.sum((n1 * n2) / (d1 * d2))
    out_ref[b, _NPIX] = jnp.float32(p.shape[0] * p.shape[1])


def _bwd_kernel(
    pred_ref, gt_ref, mask_ref, my_ref, mx_ref, myt_ref, mxt_ref, ct_ref,
    dpred_ref, *, c1, c2, inv_max, prec,
):
    """dL/dpred for upstream cotangents ct = (ct_l1, ct_gx, ct_gy,
    ct_ssim) given per-image (already normalized by the caller)."""
    b = pl.program_id(0)
    p = pred_ref[0].astype(jnp.float32)
    g = gt_ref[0].astype(jnp.float32)
    m = mask_ref[0].astype(jnp.float32)
    ct_l1 = ct_ref[b, 0]
    ct_gx = ct_ref[b, 1]
    ct_gy = ct_ref[b, 2]
    ct_ssim = ct_ref[b, 3]

    # L1 adjoint
    grad = ct_l1 * jnp.sign(p - g) * m

    # gradient-term adjoint: s = sign(dx p - dx g) * mdx; forward
    # difference adjoint scatters -s at i and +s at i+1 (zero-padded).
    mdx = m[:, 1:] * m[:, :-1]
    sx = jnp.sign((p[:, 1:] - p[:, :-1]) - (g[:, 1:] - g[:, :-1])) * mdx
    zx = jnp.zeros((p.shape[0], 1), jnp.float32)
    grad += ct_gx * (
        jnp.concatenate([zx, sx], axis=1) - jnp.concatenate([sx, zx], axis=1)
    )
    mdy = m[1:, :] * m[:-1, :]
    sy = jnp.sign((p[1:, :] - p[:-1, :]) - (g[1:, :] - g[:-1, :])) * mdy
    zy = jnp.zeros((1, p.shape[1]), jnp.float32)
    grad += ct_gy * (
        jnp.concatenate([zy, sy], axis=0) - jnp.concatenate([sy, zy], axis=0)
    )

    # SSIM adjoint (closed form).  S = (n1 n2)/(d1 d2); only the
    # pred-dependent stats (mu_x, sxx, sxy) contribute.
    my = my_ref[:].astype(jnp.float32)
    mx = mx_ref[:].astype(jnp.float32)
    myt = myt_ref[:].astype(jnp.float32)
    mxt = mxt_ref[:].astype(jnp.float32)
    # normalized space (see _fwd_kernel); d/d(raw pred) = inv_max * d/d(pn)
    pn = p * inv_max
    gn_ = g * inv_max
    mu_x, mu_y, n1, n2, d1, d2 = _ssim_stats(pn, gn_, my, mx, c1, c2, prec)
    s = (n1 * n2) / (d1 * d2)
    a1 = 2.0 * mu_y * n2 / (d1 * d2) - s * 2.0 * mu_x / d1  # dS/dmu_x
    a3 = -s / d2                                            # dS/dsxx
    a5 = 2.0 * n1 / (d1 * d2)                               # dS/dsxy

    def blur_t(x):
        x = jnp.dot(myt, x, preferred_element_type=jnp.float32,
                    precision=prec)
        return jnp.dot(x, mxt, preferred_element_type=jnp.float32,
                       precision=prec)

    # dL/dpn = ct*[ W^T(a1 - 2 mu a3 - mu_y a5) + 2 pn W^T(a3) + gn W^T(a5) ];
    # chain rule back to raw pred multiplies by inv_max.
    grad += (ct_ssim * inv_max) * (
        blur_t(a1 - 2.0 * mu_x * a3 - mu_y * a5)
        + 2.0 * pn * blur_t(a3)
        + gn_ * blur_t(a5)
    )
    dpred_ref[0] = grad


def _call_fwd(pred, gt, mask, my, mx, c1, c2, inv_max, interpret, prec):
    b, h, w = pred.shape
    kernel = functools.partial(
        _fwd_kernel, c1=c1, c2=c2, inv_max=inv_max, prec=PRECISIONS[prec]
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            # SMEM: the outputs are scalar sums; VMEM disallows scalar
            # stores and 8-wide tiles.
            (b, _NOUT), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, _NOUT), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * (5 * 2 * (h * h * w + h * w * w) + 40 * h * w),
            bytes_accessed=b * h * w * 4 * 4,
            transcendentals=0,
        ),
    )(pred, gt, mask, my, mx)


def _call_bwd(
    pred, gt, mask, my, mx, myt, mxt, cts, c1, c2, inv_max, interpret, prec
):
    b, h, w = pred.shape
    kernel = functools.partial(
        _bwd_kernel, c1=c1, c2=c2, inv_max=inv_max, prec=PRECISIONS[prec]
    )
    img = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            img, img, img,
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * (8 * 2 * (h * h * w + h * w * w) + 80 * h * w),
            bytes_accessed=b * h * w * 4 * 5,
            transcendentals=0,
        ),
    )(pred, gt, mask, my, mx, myt, mxt, cts)


def _blur_mats(h: int, w: int, window: int, sigma: float):
    my = jnp.asarray(blur_matrix(h, window, sigma))
    mxt = jnp.asarray(blur_matrix(w, window, sigma))  # right-multiply form
    return my, mxt.T, my.T, mxt


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8)
)
def _fused_terms(
    pred, gt, mask, max_val, window, sigma, interpret, hw, prec
):
    """Returns normalized loss terms (recon, grad_x+grad_y, ssim_mean)."""
    sums = _fused_terms_fwd(
        pred, gt, mask, max_val, window, sigma, interpret, hw, prec
    )[0]
    return sums


def _normalize(raw):
    """(B, 8) partial sums -> scalar terms dict.

    SSIM is unmasked per pixel, so whole images with NO valid pixels
    (pad-and-mask rows from loop=False loaders) are dropped from its
    mean via a per-image validity weight — matching the jnp path's
    ``image_weights`` contract (losses.ssim_loss)."""
    tot = jnp.sum(raw, axis=0)
    recon = tot[_L1] / jnp.maximum(tot[_NM], 1.0)
    grad = tot[_GX] / jnp.maximum(tot[_NGX], 1.0) + tot[_GY] / jnp.maximum(
        tot[_NGY], 1.0
    )
    valid = (raw[:, _NM] > 0).astype(jnp.float32)  # (B,)
    ssim_mean = jnp.sum(raw[:, _SSIM] * valid) / jnp.maximum(
        jnp.sum(raw[:, _NPIX] * valid), 1.0
    )
    return recon, grad, ssim_mean


def _fused_terms_fwd(
    pred, gt, mask, max_val, window, sigma, interpret, hw, prec
):
    h, w = hw
    my, mx, myt, mxt = _blur_mats(h, w, window, sigma)
    # SSIM runs on in-kernel-normalized inputs -> constants at L=1
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    raw = _call_fwd(
        pred, gt, mask, my, mx, c1, c2, 1.0 / max_val, interpret, prec
    )
    recon, grad, ssim_mean = _normalize(raw)
    out = jnp.stack([recon, grad, ssim_mean])
    residuals = (pred, gt, mask, raw)
    return out, residuals


def _fused_terms_bwd(
    max_val, window, sigma, interpret, hw, prec, residuals, ct
):
    pred, gt, mask, raw = residuals
    h, w = hw
    b = pred.shape[0]
    my, mx, myt, mxt = _blur_mats(h, w, window, sigma)
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    tot = jnp.sum(raw, axis=0)
    # chain rule through the normalizations (counts are non-diff)
    ct_l1 = ct[0] / jnp.maximum(tot[_NM], 1.0)
    ct_gx = ct[1] / jnp.maximum(tot[_NGX], 1.0)
    ct_gy = ct[1] / jnp.maximum(tot[_NGY], 1.0)
    # per-image SSIM cotangent: invalid (all-masked) images get zero,
    # mirroring _normalize's validity weighting
    valid = (raw[:, _NM] > 0).astype(jnp.float32)  # (B,)
    denom = jnp.maximum(jnp.sum(raw[:, _NPIX] * valid), 1.0)
    ct_ssim_i = ct[2] * valid / denom  # (B,)
    cts = jnp.concatenate(
        [
            jnp.broadcast_to(
                jnp.stack([ct_l1, ct_gx, ct_gy])[None, :], (b, 3)
            ),
            ct_ssim_i[:, None],
        ],
        axis=1,
    ).astype(jnp.float32)
    dpred = _call_bwd(
        pred, gt, mask, my, mx, myt, mxt, cts, c1, c2, 1.0 / max_val,
        interpret, prec,
    )
    return dpred, None, None


_fused_terms.defvjp(_fused_terms_fwd, _fused_terms_bwd)


def fused_loss_terms(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    max_val: float,
    window: int = 11,
    sigma: float = 1.5,
    interpret: bool = False,
    precision: str = "highest",
) -> Dict[str, jnp.ndarray]:
    """Fused (recon, grad-scale-0, ssim) losses from one kernel pass.

    Args mirror losses.masked_l1/gradient_loss/ssim_loss semantics:
      pred/gt/mask: (B, H, W) or (B, H, W, 1) float; max_val = max depth.
    Returns {'recon', 'grad0', 'ssim'} where ssim = (1 - mean SSIM)/2.
    Differentiable w.r.t. pred (analytic Pallas backward).
    """
    if pred.ndim == 4:
        pred, gt, mask = pred[..., 0], gt[..., 0], mask[..., 0]
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    hw = (pred.shape[1], pred.shape[2])
    out = _fused_terms(pred, gt, mask, float(max_val), int(window),
                       float(sigma), bool(interpret), hw, str(precision))
    return {
        "recon": out[0],
        "grad0": out[1],
        "ssim": (1.0 - out[2]) / 2.0,
    }
