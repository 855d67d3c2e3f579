"""End-to-end eval-protocol parity vs the torch twin (VERDICT r3
missing item 3; SURVEY §7 hard part 1).

The north star demands the KITTI eval protocol be reproduced
"bit-comparably at fp32".  Losses/metrics have per-function oracles
elsewhere; THIS file runs the full `evaluate()` protocol — pred ->
GT-res bilinear resize (the interpolation-kernel parity risk), crop,
cap, median scaling, all 8 metrics — against an independent torch
implementation (tests/torch_twin.py::eval_protocol_t) on synthetic
raw-resolution pairs, including NON-integer scale factors that pin the
resize kernel's half-pixel-center semantics.

fp32 on CPU; tolerance 1e-5 absolute on every per-image metric.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gdn_tpu.config import (
    Config, DataConfig, EvalConfig, LossConfig, ModelConfig, TrainConfig,
)
from gdn_tpu.evaluate import evaluate, make_eval_step
from gdn_tpu import metrics as M

from torch_twin import eval_protocol_t

TRAIN_RES = (32, 104)
ATOL = 1e-5


def _cfg(**eval_kw) -> Config:
    return Config(
        model=ModelConfig(image_size=TRAIN_RES, dtype="float32",
                          use_pallas=False),
        loss=LossConfig(use_pallas=False),
        data=DataConfig(dataset="synthetic", batch_size=2),
        train=TrainConfig(ckpt_dir=""),
        eval=EvalConfig(batch_size=2, **eval_kw),
    )


def _forward(params, rgb):
    """Deterministic analytic 'model': smooth positive depth from the
    RGB — the protocol, not the network, is under test (training-time
    model parity lives in test_parity_training.py)."""
    d = 2.0 + 60.0 * jax.nn.sigmoid(
        3.0 * jnp.mean(rgb, axis=-1, keepdims=True) - 1.0
    )
    return d


def _pairs(rng, n, gt_shape, cap):
    """Synthetic (rgb at train res, gt at raw res) pairs.  GT includes
    invalid (0) pixels and values beyond the cap so the range mask has
    real work to do."""
    h, w = TRAIN_RES
    out = []
    for _ in range(n):
        rgb = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
        gt = rng.uniform(0, cap * 1.3, (1, *gt_shape)).astype(np.float32)
        gt[rng.uniform(size=gt.shape) < 0.15] = 0.0  # invalid pixels
        out.append({"rgb": rgb, "gt": gt})
    return out


# (93, 311) is a NON-integer scale from (32, 104): 2.906x / 2.990x —
# the case that pins the resize kernel (SURVEY §7 hard part 1).
@pytest.mark.parametrize("gt_shape,eval_kw", [
    ((93, 311), dict(cap=80.0, crop="garg")),
    ((64, 208), dict(cap=80.0, crop="eigen")),          # exact 2x
    ((93, 311), dict(cap=80.0, crop="garg", median_scaling=True)),
    ((75, 100), dict(cap=10.0, crop="none")),           # NYU-style
])
def test_eval_step_per_image_parity(rng, gt_shape, eval_kw):
    """Per-image metric columns from the real jitted eval step match
    the torch protocol to 1e-5 at fp32."""
    cfg = _cfg(**eval_kw)
    samples = _pairs(rng, 2, gt_shape, cfg.eval.cap)
    rgb = np.concatenate([s["rgb"] for s in samples])
    gt = np.concatenate([s["gt"] for s in samples])

    step = make_eval_step(cfg, _forward, gt_shape)
    stacked = np.asarray(step({}, jnp.asarray(rgb), jnp.asarray(gt)))
    assert stacked.shape == (len(M.METRIC_NAMES), 2)

    pred_small = np.asarray(_forward({}, jnp.asarray(rgb)))[..., 0]
    for i in range(2):
        want = eval_protocol_t(
            torch.from_numpy(pred_small[i]), torch.from_numpy(gt[i]),
            cap=cfg.eval.cap, min_depth=cfg.model.min_depth,
            crop=cfg.eval.crop, median_scaling=cfg.eval.median_scaling,
        )
        for j, k in enumerate(M.METRIC_NAMES):
            np.testing.assert_allclose(
                stacked[j, i], want[k], atol=ATOL, rtol=1e-5,
                err_msg=f"image {i} metric {k}",
            )


def test_evaluate_harness_aggregate_parity(rng):
    """The full evaluate() harness (batching, prefetch thread, padded
    partial batches, accumulator) reproduces the torch-twin protocol
    mean to 1e-5 on a mixed 5-image split (odd count exercises the
    pad-with-last-sample path)."""
    gt_shape = (93, 311)
    cfg = _cfg(cap=80.0, crop="garg")
    samples = _pairs(rng, 5, gt_shape, cfg.eval.cap)

    got = evaluate(cfg, {}, _forward, iter(samples), verbose=False)

    sums = {k: 0.0 for k in M.METRIC_NAMES}
    for s in samples:
        pred_small = np.asarray(_forward({}, jnp.asarray(s["rgb"])))[0, ..., 0]
        want = eval_protocol_t(
            torch.from_numpy(pred_small), torch.from_numpy(s["gt"][0]),
            cap=cfg.eval.cap, min_depth=cfg.model.min_depth,
            crop=cfg.eval.crop,
        )
        for k in M.METRIC_NAMES:
            sums[k] += want[k]
    for k in M.METRIC_NAMES:
        np.testing.assert_allclose(
            got[k], sums[k] / len(samples), atol=ATOL, rtol=1e-5,
            err_msg=f"aggregate {k}",
        )
