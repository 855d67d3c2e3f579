"""Training losses for the two-stage guided depth pipeline.

Implements the reference's loss surface (SURVEY.md §2.4):
  - masked L1 depth reconstruction,
  - image-gradient L1 loss (multi-scale),
  - SSIM structural loss,
  - stage-2 latent/guidance feature-matching.

All terms are pure jnp and differentiable; ``total_loss`` composes them
with the LossConfig weights.  When ``LossConfig.use_pallas`` is set and
we are on TPU, the recon+grad elementwise/reduction work is dispatched
to the single fused Pallas kernel in kernels/fused_loss.py (equivalence
is tested in tests/test_kernels.py); the jnp path below is the always-
available XLA fallback and the autodiff reference.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from gdn_tpu.config import LossConfig
from gdn_tpu.ops.ssim import ssim


def masked_l1(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean |pred - gt| over valid pixels.  Shapes (B, H, W[, 1])."""
    mask = mask.astype(jnp.float32)
    diff = jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32)) * mask
    return jnp.sum(diff) / jnp.maximum(jnp.sum(mask), 1.0)


def _grads(x: jnp.ndarray):
    """Forward-difference spatial gradients of (B, H, W)."""
    dx = x[:, :, 1:] - x[:, :, :-1]
    dy = x[:, 1:, :] - x[:, :-1, :]
    return dx, dy


def _gradient_scale_losses(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    num_scales: int,
    skip_first: bool = False,
):
    """Per-scale gradient L1 terms (list of scalars), fine to coarse.

    With ``skip_first`` the scale-0 term is omitted (computed instead by
    the fused Pallas kernel) but the pooling chain is identical, so the
    two backends sum to the same multi-scale loss.
    """
    terms = []
    for s in range(num_scales):
        if s > 0:
            pred = _avgpool2(pred)
            gt_w = _avgpool2(gt * mask)
            m_w = _avgpool2(mask)
            gt = gt_w / jnp.maximum(m_w, 1e-6)
            # All-4-children-valid rule.  NOTE (documented behavior, not
            # a bug): on sparse LiDAR GT (~5% dense KITTI) coarse scales
            # rarely have fully-valid 2x2 blocks, so scales 1..N-1
            # contribute ~0 and the fixed /num_scales divisor in
            # gradient_loss weights the surviving scale-0 term at 1/N —
            # i.e. w_grad is effectively weaker on sparse GT than on
            # dense GT.  Kept as-is: the per-scale validity rule is the
            # conservative choice (no gradient supervision across
            # interpolated holes) and the λ weights are unpinned
            # assumptions (PARITY.md "known deltas") tuned WITH this
            # semantics; changing it would silently retune the loss.
            mask = (m_w > 0.999).astype(jnp.float32)  # all 4 children valid
        if s == 0 and skip_first:
            continue
        pdx, pdy = _grads(pred)
        gdx, gdy = _grads(gt)
        mdx = mask[:, :, 1:] * mask[:, :, :-1]
        mdy = mask[:, 1:, :] * mask[:, :-1, :]
        nx = jnp.maximum(jnp.sum(mdx), 1.0)
        ny = jnp.maximum(jnp.sum(mdy), 1.0)
        terms.append(
            jnp.sum(jnp.abs(pdx - gdx) * mdx) / nx
            + jnp.sum(jnp.abs(pdy - gdy) * mdy) / ny
        )
    return terms


def gradient_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    num_scales: int = 4,
) -> jnp.ndarray:
    """Multi-scale L1 on spatial gradients of pred vs gt.

    A gradient pixel is valid only when *both* pixels of the finite
    difference are valid.  Scales are built by 2x2 average-pooling the
    (masked) maps — matching the common multi-scale gradient-matching
    formulation; single-scale (num_scales=1) recovers the plain version.
    """
    pred = _squeeze(pred).astype(jnp.float32)
    gt = _squeeze(gt).astype(jnp.float32)
    mask = _squeeze(mask).astype(jnp.float32)
    terms = _gradient_scale_losses(pred, gt, mask, num_scales)
    return sum(terms) / num_scales


def ssim_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    max_depth: float,
    window: int = 11,
    sigma: float = 1.5,
    precision: str = "highest",
    image_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(1 - SSIM)/2 on depth normalized by max_depth.

    SSIM itself is unmasked (windowed structure needs dense maps), but
    ``image_weights`` (B,) drops whole images from the mean — images
    with an all-zero validity mask (e.g. the pad-and-mask rows emitted
    by loop=False loaders, data/batching.py) must contribute nothing.
    """
    p = _squeeze(pred).astype(jnp.float32) / max_depth
    g = _squeeze(gt).astype(jnp.float32) / max_depth
    s_map = ssim(p, g, max_val=1.0, window=window, sigma=sigma,
                 precision=precision, mean=False)
    if image_weights is None:
        s = jnp.mean(s_map)
    else:
        w = image_weights.astype(jnp.float32)
        per_image = jnp.mean(s_map, axis=(1, 2))
        s = jnp.sum(per_image * w) / jnp.maximum(jnp.sum(w), 1.0)
    return (1.0 - s) / 2.0


def multiscale_depth_loss(
    scale_preds: Sequence[jnp.ndarray],
    gt: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Masked L1 supervision of the coarse decoder heads
    (ModelConfig.multiscale_heads; SURVEY §2.3 multi-scale outputs).

    ``scale_preds`` are ordered coarse->fine; scale j gets weight
    0.5^(n-1-j) (the standard DispNet-style decay — the finest coarse
    head is weighted highest, the deepest lowest).  GT/mask are
    downsampled with NEAREST so sparse-LiDAR validity is preserved
    (bilinear would smear invalid zeros into neighbors)."""
    from gdn_tpu.ops.resize import resize_nearest

    gt3 = _squeeze(gt).astype(jnp.float32)
    m3 = _squeeze(mask).astype(jnp.float32)
    n = len(scale_preds)
    total = jnp.float32(0.0)
    wsum = 0.0
    for j, p in enumerate(scale_preds):
        p3 = _squeeze(p).astype(jnp.float32)
        hw = tuple(p3.shape[1:3])
        # resize operates on (..., H, W, C): give (B, H, W) an explicit
        # channel dim so the batch axis is not resized
        g = resize_nearest(gt3[..., None], hw)[..., 0]
        m = resize_nearest(m3[..., None], hw)[..., 0]
        w = 0.5 ** (n - 1 - j)
        total = total + w * masked_l1(p3, g, m)
        wsum += w
    return total / wsum


def latent_loss(
    feats_a: Sequence[jnp.ndarray], feats_b: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """Guidance feature-matching: mean L1 between feature pyramids.

    Stage 2 trains the G-net latent (and optionally decoder features)
    to match the frozen D-net's depth-domain features (SURVEY.md §2.3,
    §3.2).  `feats_b` is treated as the (stop-gradient) target by the
    caller.
    """
    if len(feats_a) != len(feats_b):
        raise ValueError(
            f"feature pyramids differ in depth: {len(feats_a)} vs "
            f"{len(feats_b)} (zip would silently truncate while the "
            "mean divides by the full length)"
        )
    total = jnp.float32(0.0)
    for a, b in zip(feats_a, feats_b):
        total = total + jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    return total / max(len(feats_a), 1)


def total_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: LossConfig,
    max_depth: float,
    pred_latents: Sequence[jnp.ndarray] = (),
    target_latents: Sequence[jnp.ndarray] = (),
    scale_preds: Sequence[jnp.ndarray] = (),
) -> Dict[str, jnp.ndarray]:
    """Composite loss; returns dict with 'total' plus each term.

    When ``cfg.use_pallas`` and running on TPU, the recon + scale-0
    gradient + SSIM work comes from the single fused Pallas kernel
    (kernels/fused_loss.py); the cheap coarser gradient scales (4x/16x
    fewer pixels) stay on the jnp path.  Both backends are numerically
    equivalent (tests/test_kernels.py).
    """
    if cfg.use_pallas and jax.default_backend() == "tpu":
        from gdn_tpu.kernels.fused_loss import fused_loss_terms

        # The kernel weights each image's SSIM by whether it has any
        # valid pixels (same contract as the jnp path's image_weights).
        fused = fused_loss_terms(
            pred, gt, mask, max_depth, cfg.ssim_window, cfg.ssim_sigma,
            precision=cfg.ssim_precision,
        )
        p3 = _squeeze(pred).astype(jnp.float32)
        g3 = _squeeze(gt).astype(jnp.float32)
        m3 = _squeeze(mask).astype(jnp.float32)
        coarse = _gradient_scale_losses(
            p3, g3, m3, cfg.grad_scales, skip_first=True
        )
        terms = {
            "recon": fused["recon"],
            "grad": (fused["grad0"] + sum(coarse)) / cfg.grad_scales,
            "ssim": fused["ssim"],
        }
    else:
        valid_images = (
            jnp.sum(_squeeze(mask).astype(jnp.float32), axis=(1, 2)) > 0
        ).astype(jnp.float32)
        terms = {
            "recon": masked_l1(pred, gt, mask),
            "grad": gradient_loss(pred, gt, mask, cfg.grad_scales),
            "ssim": ssim_loss(
                pred, gt, max_depth, cfg.ssim_window, cfg.ssim_sigma,
                precision=cfg.ssim_precision,
                image_weights=valid_images,
            ),
        }
    total = (
        cfg.w_recon * terms["recon"]
        + cfg.w_grad * terms["grad"]
        + cfg.w_ssim * terms["ssim"]
    )
    if pred_latents and target_latents:
        terms["latent"] = latent_loss(pred_latents, target_latents)
        total = total + cfg.w_latent * terms["latent"]
    if scale_preds:
        terms["scales"] = multiscale_depth_loss(scale_preds, gt, mask)
        total = total + cfg.w_scales * terms["scales"]
    terms["total"] = total
    return terms


def _squeeze(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., 0] if x.ndim == 4 else x


def _avgpool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool of (B, H, W); truncates odd trailing row/col."""
    b, h, w = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : h2 * 2, : w2 * 2].reshape(b, h2, 2, w2, 2)
    return x.mean(axis=(2, 4))
