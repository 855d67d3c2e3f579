"""Evaluator: persistent compiled eval steps + device-resident split
(round 5).

The in-training eval path pays one Evaluator for the whole run —
compiled steps survive across run() calls and the split lives in HBM
(host path: rebuild + re-upload every epoch).  These tests pin:

- device-cached passes reproduce the host-fed protocol bit-for-bit
  (same jitted steps, same math — only the feeding changes);
- one Evaluator reused across passes neither recompiles nor drifts;
- the HBM byte gate refuses loudly instead of silently spilling;
- save_preds names files by dataset order from cached batches too
  (mixed-resolution splits interleave batches out of order);
- the mesh (data-parallel) eval path composes with the cache.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gdn_tpu.config import (
    Config, DataConfig, EvalConfig, LossConfig, ModelConfig, TrainConfig,
)
from gdn_tpu.evaluate import Evaluator, evaluate
from gdn_tpu import metrics as M

TRAIN_RES = (32, 104)


def _cfg(bs=2, **eval_kw) -> Config:
    return Config(
        model=ModelConfig(image_size=TRAIN_RES, dtype="float32",
                          use_pallas=False),
        loss=LossConfig(use_pallas=False),
        data=DataConfig(dataset="synthetic", batch_size=2),
        train=TrainConfig(ckpt_dir=""),
        eval=EvalConfig(batch_size=bs, **eval_kw),
    )


def _forward(params, rgb):
    return 2.0 + 60.0 * jax.nn.sigmoid(
        3.0 * jnp.mean(rgb, axis=-1, keepdims=True) - 1.0
    )


def _pairs(rng, n, gt_shape, cap=80.0):
    h, w = TRAIN_RES
    out = []
    for _ in range(n):
        rgb = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
        gt = rng.uniform(0, cap * 1.2, (1, *gt_shape)).astype(np.float32)
        gt[rng.uniform(size=gt.shape) < 0.15] = 0.0
        out.append({"rgb": rgb, "gt": gt})
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_device_cache_matches_host(rng):
    """Mixed GT resolutions + an odd count (pad-with-last path): the
    device-cached pass equals the host-fed pass exactly."""
    cfg = _cfg()
    samples = _pairs(rng, 3, (48, 120)) + _pairs(rng, 2, (64, 208))
    rng.shuffle(samples)

    host = evaluate(cfg, {}, _forward, iter(samples), verbose=False)
    dev = evaluate(cfg, {}, _forward, iter(samples), verbose=False,
                   device_cache=True)
    for k in M.METRIC_NAMES:
        np.testing.assert_array_equal(host[k], dev[k], err_msg=k)


def test_evaluator_reuse_no_recompile_no_drift(rng):
    """Two runs on one Evaluator: identical metrics, no new compiled
    steps after the first pass (the in-training eval contract)."""
    cfg = _cfg()
    samples = _pairs(rng, 4, (48, 120))
    ev = Evaluator(cfg, _forward)
    ev.cache_dataset(iter(samples))
    assert ev.cached_images == 4

    r1 = ev.run({}, verbose=False)
    n_steps = len(ev._steps)
    r2 = ev.run({}, verbose=False)
    assert len(ev._steps) == n_steps == 1
    for k in M.METRIC_NAMES:
        np.testing.assert_array_equal(r1[k], r2[k], err_msg=k)


def test_cache_byte_gate(rng):
    cfg = _cfg()
    ev = Evaluator(cfg, _forward)
    with pytest.raises(ValueError, match="device cache exceeds"):
        ev.cache_dataset(iter(_pairs(rng, 4, (48, 120))), max_bytes=1)


def test_run_without_cache_raises(rng):
    ev = Evaluator(_cfg(), _forward)
    with pytest.raises(ValueError, match="cache_dataset"):
        ev.run({}, verbose=False)


def test_device_cache_save_preds_dataset_order(rng, tmp_path):
    """save_preds from cached batches writes the same per-index files
    as the host-fed path on a mixed-resolution (interleaving) split."""
    cfg = _cfg()
    samples = _pairs(rng, 3, (48, 120)) + _pairs(rng, 2, (64, 208))
    rng.shuffle(samples)

    d_host = tmp_path / "host"
    d_dev = tmp_path / "dev"
    evaluate(cfg, {}, _forward, iter(samples), verbose=False,
             save_preds=str(d_host))
    evaluate(cfg, {}, _forward, iter(samples), verbose=False,
             save_preds=str(d_dev), device_cache=True)

    host_files = sorted(p.name for p in d_host.iterdir())
    assert host_files == sorted(p.name for p in d_dev.iterdir())
    assert len(host_files) == len(samples)
    for name in host_files:
        np.testing.assert_array_equal(
            np.load(d_host / name), np.load(d_dev / name), err_msg=name
        )


def test_device_cache_with_mesh(rng):
    """Data-parallel eval (batch sharded over "data") composes with the
    device cache: same metrics as the single-device host-fed pass."""
    from gdn_tpu.parallel.mesh import create_mesh

    cfg = _cfg(bs=4)
    mesh = create_mesh(4)
    samples = _pairs(rng, 8, (48, 120))

    single = evaluate(_cfg(bs=4), {}, _forward, iter(samples),
                      verbose=False)
    meshed = evaluate(cfg, {}, _forward, iter(samples), verbose=False,
                      mesh=mesh, device_cache=True)
    for k in M.METRIC_NAMES:
        np.testing.assert_allclose(
            single[k], meshed[k], rtol=1e-6, atol=1e-6, err_msg=k
        )


def test_u16_wire_cache_matches_host_u16(rng):
    """Wire encoding happens at cache build: a u16-wire cached pass
    equals the u16-wire host-fed pass exactly."""
    cfg = _cfg(gt_wire="u16")
    samples = _pairs(rng, 3, (48, 120))
    host = evaluate(cfg, {}, _forward, iter(samples), verbose=False)
    dev = evaluate(cfg, {}, _forward, iter(samples), verbose=False,
                   device_cache=True)
    for k in M.METRIC_NAMES:
        np.testing.assert_array_equal(host[k], dev[k], err_msg=k)
