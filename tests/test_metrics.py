"""Metrics vs a hand-rolled numpy/torch oracle.

The oracle re-implements the reference's compute_errors math (the
community-standard formulation, SURVEY.md §2.5) with numpy boolean
indexing — structurally different from our masked static-shape JAX
version, so agreement is meaningful.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gdn_tpu import metrics


def oracle_compute_errors(gt, pred):
    """Classic monodepth-style compute_errors on pre-masked 1-D arrays."""
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25**2).mean()
    a3 = (thresh < 1.25**3).mean()
    rmse = np.sqrt(((gt - pred) ** 2).mean())
    rmse_log = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())
    abs_rel = (np.abs(gt - pred) / gt).mean()
    sq_rel = (((gt - pred) ** 2) / gt).mean()
    log10 = np.abs(np.log10(gt) - np.log10(pred)).mean()
    return dict(
        abs_rel=abs_rel, sq_rel=sq_rel, rmse=rmse, rmse_log=rmse_log,
        log10=log10, a1=a1, a2=a2, a3=a3,
    )


def test_compute_errors_matches_oracle(rng):
    gt = rng.uniform(1.0, 80.0, size=(4, 32, 64)).astype(np.float32)
    pred = (gt * rng.uniform(0.7, 1.4, size=gt.shape)).astype(np.float32)
    mask = (rng.uniform(size=gt.shape) > 0.3).astype(np.float32)

    ours = {k: float(v) for k, v in metrics.compute_errors(gt, pred, mask).items()}
    sel = mask > 0
    ref = oracle_compute_errors(gt[sel].astype(np.float64), pred[sel].astype(np.float64))
    for k, v in ref.items():
        assert ours[k] == pytest.approx(v, rel=1e-5), k


def test_apply_cap():
    gt = np.array([[0.0, 0.5, 10.0, 90.0]], dtype=np.float32)
    pred = np.array([[5.0, 200.0, 0.0001, 12.0]], dtype=np.float32)
    g, p, m = metrics.apply_cap(gt, pred, min_depth=1e-3, max_depth=80.0)
    np.testing.assert_array_equal(np.asarray(m), [[False, True, True, False]])
    assert float(np.max(p)) <= 80.0 and float(np.min(p)) >= 1e-3


def test_crop_masks_protocol_constants():
    # Garg crop on a 375x1242 KITTI raw image -> published pixel bounds.
    m = metrics.crop_mask(375, 1242, "garg")
    rows = np.where(m.any(axis=1))[0]
    cols = np.where(m.any(axis=0))[0]
    assert rows[0] == int(0.40810811 * 375) and rows[-1] == int(0.99189189 * 375) - 1
    assert cols[0] == int(0.03594771 * 1242) and cols[-1] == int(0.96405229 * 1242) - 1
    e = metrics.crop_mask(375, 1242, "eigen")
    e_rows = np.where(e.any(axis=1))[0]
    assert e_rows[0] == int(0.3324324 * 375)  # offset differs from garg
    assert e_rows[0] != rows[0]
    assert metrics.crop_mask(10, 10, "none").all()


def test_evaluate_prediction_perfect_pred():
    gt = np.random.default_rng(0).uniform(2.0, 40.0, size=(64, 128)).astype(np.float32)
    r = metrics.evaluate_prediction(gt, gt, cap=80.0, crop="garg")
    assert float(r["abs_rel"]) == 0.0
    assert float(r["a1"]) == 1.0
    assert float(r["rmse"]) == 0.0


def test_median_scaling():
    gt = np.random.default_rng(1).uniform(2.0, 40.0, size=(64, 128)).astype(np.float32)
    pred = gt * 2.0  # uniformly mis-scaled
    r = metrics.evaluate_prediction(gt, pred, cap=80.0, crop="none", median_scaling=True)
    assert float(r["abs_rel"]) < 1e-3


def test_accumulator():
    acc = metrics.MetricAccumulator()
    acc.update({k: 1.0 for k in metrics.METRIC_NAMES})
    acc.update({k: 3.0 for k in metrics.METRIC_NAMES})
    assert acc.result()["rmse"] == 2.0
    assert "abs_rel" in acc.table()


def test_full_eval_protocol_parity_with_torch(rng):
    """End-to-end fp32 parity of the eval protocol (SURVEY.md §2.7
    'bit-comparable at fp32'): network-res prediction -> antialiased
    bilinear upsample to GT res -> garg crop -> 80 m cap -> metrics,
    implemented independently in torch/numpy."""
    import torch
    import torch.nn.functional as F

    from gdn_tpu.ops.resize import resize_bilinear

    gt = rng.uniform(0.5, 85.0, size=(375, 1242)).astype(np.float32)
    pred_small = rng.uniform(1.0, 79.0, size=(128, 416)).astype(np.float32)

    # ours (jax)
    pred_up = np.asarray(resize_bilinear(pred_small, (375, 1242)))
    ours = {
        k: float(v)
        for k, v in metrics.evaluate_prediction(
            gt, pred_up, cap=80.0, min_depth=1e-3, crop="garg"
        ).items()
    }

    # torch/numpy oracle
    t_pred = F.interpolate(
        torch.from_numpy(pred_small)[None, None], size=(375, 1242),
        mode="bilinear", align_corners=False, antialias=True,
    )[0, 0].numpy()
    t_pred = np.clip(t_pred, 1e-3, 80.0)
    mask = (gt > 1e-3) & (gt < 80.0)
    cm = metrics.crop_mask(375, 1242, "garg")
    sel = mask & cm
    ref = oracle_compute_errors(
        gt[sel].astype(np.float64), t_pred[sel].astype(np.float64)
    )
    for k, v in ref.items():
        assert ours[k] == pytest.approx(v, rel=2e-4), k


def test_median_scaling_uses_raw_pred():
    """The scale ratio must come from the RAW prediction: clipping
    first clamps the pred median to the cap and biases the factor for
    unscaled predictors (review finding)."""
    rng = np.random.default_rng(0)
    gt = rng.uniform(5, 20, (40, 60)).astype(np.float32)
    # unscaled predictor: correct structure, 10x too large (median >> cap)
    pred = gt * 10.0
    out = metrics.evaluate_prediction(
        jnp.asarray(gt), jnp.asarray(pred), cap=80.0, crop="none",
        median_scaling=True,
    )
    # raw-ratio scaling recovers gt exactly -> near-perfect metrics
    assert float(out["abs_rel"]) < 1e-5
    assert float(out["a1"]) > 0.999


def test_median_scaling_empty_mask_is_finite():
    """An all-invalid image must not poison the accumulator with NaNs
    (masked_median returns +inf on empty masks; review finding)."""
    gt = np.zeros((20, 30), np.float32)  # all pixels invalid (<= min)
    pred = np.full((20, 30), 5.0, np.float32)
    out = metrics.evaluate_prediction(
        jnp.asarray(gt), jnp.asarray(pred), cap=80.0, crop="none",
        median_scaling=True,
    )
    for k, v in out.items():
        assert np.isfinite(float(v)), k
