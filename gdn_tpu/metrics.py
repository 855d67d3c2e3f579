"""Depth evaluation metrics and the KITTI/NYU eval protocol.

Re-implements the reference's ``compute_errors(gt, pred)`` surface
(SURVEY.md §2.5/§2.7) as pure, jittable JAX: the seven standard depth
metrics (AbsRel, SqRel, RMSE, RMSElog, δ<1.25^{1,2,3}) plus log10 for
NYU, with depth caps (50/80 m KITTI, 10 m NYU) and the eigen/garg crops.

Everything is computed in float32 with explicit masking so results are
bit-comparable to a fp32 PyTorch/numpy oracle (tests/test_metrics.py).
All functions take a validity mask instead of boolean indexing so they
stay static-shaped under jit (TPU requirement).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

METRIC_NAMES = (
    "abs_rel",
    "sq_rel",
    "rmse",
    "rmse_log",
    "log10",
    "a1",
    "a2",
    "a3",
)


def compute_errors(
    gt: jnp.ndarray,
    pred: jnp.ndarray,
    mask: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Seven standard depth metrics (+log10), masked.

    Args:
      gt: ground-truth depth, any shape, float32 (meters).
      pred: predicted depth, same shape, float32 (meters). Must already
        be clipped to the evaluation range (see :func:`apply_cap`).
      mask: float/bool validity mask, same shape; 1 = evaluate pixel.

    Returns:
      dict of scalar metrics. Means are over valid pixels only.
    """
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mask), 1.0)

    # Guard logs/divisions on masked-out pixels with a safe value.
    safe_gt = jnp.where(mask > 0, gt, 1.0)
    safe_pred = jnp.where(mask > 0, pred, 1.0)

    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
    a1 = jnp.sum((thresh < 1.25) * mask) / n
    a2 = jnp.sum((thresh < 1.25**2) * mask) / n
    a3 = jnp.sum((thresh < 1.25**3) * mask) / n

    diff = (safe_gt - safe_pred) * mask
    abs_rel = jnp.sum(jnp.abs(diff) / safe_gt * mask) / n
    sq_rel = jnp.sum(diff**2 / safe_gt * mask) / n
    rmse = jnp.sqrt(jnp.sum(diff**2) / n)
    log_diff = (jnp.log(safe_gt) - jnp.log(safe_pred)) * mask
    rmse_log = jnp.sqrt(jnp.sum(log_diff**2) / n)
    log10 = jnp.sum(jnp.abs(jnp.log10(safe_gt) - jnp.log10(safe_pred)) * mask) / n

    return {
        "abs_rel": abs_rel,
        "sq_rel": sq_rel,
        "rmse": rmse,
        "rmse_log": rmse_log,
        "log10": log10,
        "a1": a1,
        "a2": a2,
        "a3": a3,
    }


def apply_cap(
    gt: jnp.ndarray,
    pred: jnp.ndarray,
    min_depth: float = 1e-3,
    max_depth: float = 80.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Evaluation range handling.

    The reference protocol (SURVEY.md §2.7): GT pixels outside
    [min_depth, max_depth] are excluded from the mask; predictions are
    clipped into the range.  Returns (gt, clipped_pred, range_mask).
    """
    mask = (gt > min_depth) & (gt < max_depth)
    pred = jnp.clip(pred, min_depth, max_depth)
    return gt, pred, mask


# ---------------------------------------------------------------------------
# KITTI crops.  Fractions are the published Eigen-split protocol
# constants (Eigen NIPS'14 / Garg ECCV'16), applied to the *GT
# resolution* image.  Verified against the community-standard values
# used by monodepth/SfMLearner-style eval scripts.
# ---------------------------------------------------------------------------

GARG_CROP_FRACTIONS = (0.40810811, 0.99189189, 0.03594771, 0.96405229)
EIGEN_CROP_FRACTIONS = (0.3324324, 0.91351351, 0.0359477, 0.96405229)


def crop_mask(
    height: int, width: int, crop: str = "garg"
) -> np.ndarray:
    """Boolean (H, W) mask selecting the eigen/garg crop region."""
    if crop == "none":
        return np.ones((height, width), dtype=bool)
    if crop == "garg":
        fr = GARG_CROP_FRACTIONS
    elif crop == "eigen":
        fr = EIGEN_CROP_FRACTIONS
    else:
        raise ValueError(f"unknown crop {crop!r}")
    y0 = int(fr[0] * height)
    y1 = int(fr[1] * height)
    x0 = int(fr[2] * width)
    x1 = int(fr[3] * width)
    m = np.zeros((height, width), dtype=bool)
    m[y0:y1, x0:x1] = True
    return m


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of ``x`` over ``mask`` pixels, static-shaped (jittable).

    Invalid pixels are pushed to +inf before sorting; even counts take
    the lower-middle element (matches the reference's numpy-median-free
    protocol closely enough that tests pin it).
    """
    flat = jnp.where(mask.reshape(-1), x.reshape(-1), jnp.inf)
    order = jnp.sort(flat)
    count = jnp.sum(mask)
    idx = jnp.maximum(count - 1, 0) // 2
    return order[idx]


def median_scale(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    min_depth: float,
    cap: float,
) -> jnp.ndarray:
    """Median-scaling protocol: rescale pred so masked medians match.

    ``pred`` must be the RAW (unclipped) prediction — the standard
    protocol takes the ratio on raw values and clips AFTER scaling
    (clipping first would clamp the pred median to the cap and bias
    the factor for unscaled predictors, the exact case this exists
    for).  An empty mask or a degenerate (<=0) pred median yields
    scale=1 instead of inf/NaN poisoning the whole run's accumulator."""
    count = jnp.sum(mask)
    med_pred = masked_median(pred, mask)
    scale = jnp.where(
        (count > 0) & (med_pred > 1e-8),
        masked_median(gt, mask) / jnp.maximum(med_pred, 1e-8),
        1.0,
    )
    return jnp.clip(pred * scale, min_depth, cap)


def evaluate_prediction(
    gt: jnp.ndarray,
    pred: jnp.ndarray,
    cap: float = 80.0,
    min_depth: float = 1e-3,
    crop: str = "garg",
    median_scaling: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full single-image eval protocol: crop -> cap/mask -> metrics.

    `pred` must already be resized to GT resolution (see ops/resize.py;
    the reference upsamples the network output to the raw GT size before
    scoring — SURVEY.md §3.3).
    """
    assert gt.ndim == 2 and pred.ndim == 2, "evaluate_prediction is per-image"
    cmask = jnp.asarray(crop_mask(gt.shape[0], gt.shape[1], crop))
    gt_, pred_, range_mask = apply_cap(gt, pred, min_depth, cap)
    mask = range_mask & cmask
    if median_scaling:
        # scale the RAW pred (apply_cap clips; see median_scale doc)
        pred_ = median_scale(pred, gt_, mask, min_depth, cap)
    return compute_errors(gt_, pred_, mask)


class MetricAccumulator:
    """Running mean of per-image metric dicts (host-side, numpy)."""

    def __init__(self):
        self._sums = {k: 0.0 for k in METRIC_NAMES}
        self.count = 0

    def update(self, metrics: Dict[str, jnp.ndarray]) -> None:
        for k in METRIC_NAMES:
            self._sums[k] += float(metrics[k])
        self.count += 1

    def result(self) -> Dict[str, float]:
        n = max(self.count, 1)
        return {k: v / n for k, v in self._sums.items()}

    def table(self) -> str:
        r = self.result()
        header = " | ".join(f"{k:>8s}" for k in METRIC_NAMES)
        row = " | ".join(f"{r[k]:8.4f}" for k in METRIC_NAMES)
        return f"{header}\n{row}"
