"""Int8 post-training quantization (ops/quant.py): scheme correctness,
calibrate->apply machinery, serving/export integration, loud guards.

TPU speed evidence lives in BASELINE.md (probe: 1.5-2.9x per conv);
these tests pin the math and the plumbing on CPU.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdn_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig
from gdn_tpu.data.synthetic import synthetic_batch
from gdn_tpu.models import RtoDNet
from gdn_tpu.ops.quant import (
    calibrate_quant,
    conv2d_int8,
    quantize_weight_per_channel,
    synthetic_calibration_batches,
)
from gdn_tpu.train import create_state, make_eval_forward

M = ModelConfig(
    image_size=(32, 64), enc_channels=(8, 16), dec_channels=(16, 8),
    dtype="float32", max_depth=80.0,
)
MQ = dataclasses.replace(M, quant="int8")
TINY = Config(
    model=M, loss=LossConfig(grad_scales=2),
    data=DataConfig(dataset="synthetic", batch_size=8),
    train=TrainConfig(lr=1e-3, steps_per_epoch=10, ckpt_dir=""),
)


def _rgb(seed=0, b=4):
    return synthetic_batch(jax.random.PRNGKey(seed), b, 32, 64, 80.0)["rgb"]


@pytest.fixture(scope="module")
def trained_params():
    state = create_state(RtoDNet(cfg=M), (1, 32, 64, 3), TINY.train, 10)
    return state.params


def test_weight_quantization_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 8, 16)) * 0.3
    w8, scale = quantize_weight_per_channel(w)
    assert w8.dtype == jnp.int8 and scale.shape == (16,)
    deq = w8.astype(jnp.float32) * scale
    # symmetric rounding: error <= scale/2 per element, per channel
    err = jnp.max(jnp.abs(deq - w), axis=(0, 1, 2))
    assert bool(jnp.all(err <= scale * 0.5 + 1e-9))


def test_conv2d_int8_close_to_fp():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8))
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 16)) * 0.2
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    x_scale = jnp.max(jnp.abs(x)) / 127.0
    q = conv2d_int8(x, w, (1, 1), x_scale)
    rel = float(
        jnp.linalg.norm(q - ref) / (jnp.linalg.norm(ref) + 1e-9)
    )
    assert rel < 0.02, rel  # int8 rounding noise, not a math error


def test_calibrate_and_quantized_forward(trained_params):
    qmodel = RtoDNet(cfg=MQ)
    scales = calibrate_quant(qmodel, trained_params, [_rgb(0), _rgb(1)])
    leaves = jax.tree.leaves(scales)
    assert leaves and all(float(s) > 0 for s in leaves)

    rgb = _rgb(2)
    fp = RtoDNet(cfg=M).apply({"params": trained_params}, rgb)["depth"]
    q = qmodel.apply({"params": trained_params, "quant": scales}, rgb)["depth"]
    assert np.isfinite(np.asarray(q)).all()
    rel = float(jnp.mean(jnp.abs(q - fp)) / (jnp.mean(jnp.abs(fp)) + 1e-9))
    assert rel < 0.05, rel  # per-layer int8 noise through the ladder

    # out-of-calibration inputs must stay finite (clip saturates)
    q2 = qmodel.apply(
        {"params": trained_params, "quant": scales}, rgb * 3.0
    )["depth"]
    assert np.isfinite(np.asarray(q2)).all()


def test_quant_eval_forward_and_missing_scales(trained_params):
    cfgq = dataclasses.replace(TINY, model=MQ)
    qmodel = RtoDNet(cfg=MQ)
    scales = calibrate_quant(
        qmodel, trained_params, synthetic_calibration_batches(cfgq, 2, 4)
    )
    fwd = make_eval_forward(cfgq, qmodel, quant_scales=scales)
    out = fwd(trained_params, _rgb(3))
    assert out.shape == (4, 32, 64, 1)
    with pytest.raises(ValueError, match="calibrated activation scales"):
        make_eval_forward(cfgq, qmodel)


def test_quant_training_refused():
    from gdn_tpu.train import make_stage1_step

    cfgq = dataclasses.replace(TINY, model=MQ)
    with pytest.raises(ValueError, match="inference-only"):
        make_stage1_step(cfgq)


def test_quant_requires_group_norm(trained_params):
    bad = dataclasses.replace(MQ, norm="none")
    with pytest.raises(ValueError, match="norm='group'"):
        RtoDNet(cfg=bad).apply(
            {"params": trained_params, "quant": {}}, _rgb(0)
        )


def test_quantized_predictor_and_export(tmp_path, trained_params):
    from gdn_tpu.serving import BatchedPredictor, export_model, load_model

    cfgq = dataclasses.replace(TINY, model=MQ)
    qmodel = RtoDNet(cfg=MQ)
    scales = calibrate_quant(qmodel, trained_params, [_rgb(0)])
    pred = BatchedPredictor(
        cfgq, trained_params, batch_size=4, quant_scales=scales
    )
    d = pred.predict(np.asarray(_rgb(1, b=3)))
    assert d.shape == (3, 32, 64) and np.isfinite(d).all()

    # int8 bakes into the StableHLO artifact (scales become constants)
    path = str(tmp_path / "model_int8.bin")
    export_model(cfgq, trained_params, path, batch_size=2,
                 quant_scales=scales)
    fn = load_model(path)
    out = fn(jnp.asarray(_rgb(2, b=2)))
    ref = qmodel.apply(
        {"params": trained_params, "quant": scales}, _rgb(2, b=2)
    )["depth"]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_calibration_zero_sites_is_loud(trained_params):
    """quant_min_channels above every conv's input width must fail with
    a diagnosis, not a bare KeyError (flax omits the "quant" collection
    when no site created a scale variable)."""
    cfg_hi = dataclasses.replace(MQ, quant_min_channels=100000)
    with pytest.raises(ValueError, match="ZERO conv sites"):
        calibrate_quant(RtoDNet(cfg=cfg_hi), trained_params, [_rgb()])


def test_resolve_calibration_sources(tmp_path):
    """Shared calibration-source resolution (eval/serve/export all ride
    it): --calib_dir images > train split > synthetic scenes."""
    from PIL import Image

    from gdn_tpu.ops.quant import resolve_calibration_batches

    # synthetic dataset: the train-split preference falls through
    batches, label = resolve_calibration_batches(
        TINY, prefer_train_split=True
    )
    assert label == "synthetic"
    assert np.asarray(batches[0]).shape[1:] == (32, 64, 3)

    # a directory of real images wins; resized to model res in [0,1]
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.uniform(0, 255, (20, 40, 3)).astype(np.uint8)
        ).save(tmp_path / f"img{i}.png")
    batches, label = resolve_calibration_batches(
        TINY, calib_dir=str(tmp_path)
    )
    assert label == f"dir:{tmp_path}"
    (b,) = batches
    assert b.shape == (3, 32, 64, 3)
    assert float(b.min()) >= 0.0 and float(b.max()) <= 1.0


def test_train_split_calibration_batches(tmp_path):
    """Eval-time int8 calibrates on TRAIN-split images (wire-decoded to
    float [0,1]) — held-in data, so the scored eval images never leak
    into the activation scales."""
    import os as _os

    from PIL import Image

    from gdn_tpu.ops.quant import train_split_calibration_batches

    rng = np.random.default_rng(0)
    _os.makedirs(tmp_path / "scene")
    lines = []
    for i in range(4):
        Image.fromarray(
            rng.uniform(0, 255, (32, 64, 3)).astype(np.uint8)
        ).save(tmp_path / "scene" / f"{i}.png")
        Image.fromarray(
            (rng.uniform(0, 80, (32, 64)) * 256).astype(np.uint16)
        ).save(tmp_path / "scene" / f"{i}_d.png")
        lines.append(f"scene/{i}.png scene/{i}_d.png")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    cfg = dataclasses.replace(
        TINY,
        data=DataConfig(dataset="kitti", data_path=str(tmp_path)),
    )
    batches = train_split_calibration_batches(cfg, n_batches=2)
    assert len(batches) == 2
    for b in batches:
        b = np.asarray(b)
        assert b.dtype == np.float32 and b.shape[1:] == (32, 64, 3)
        assert float(b.min()) >= 0.0 and float(b.max()) <= 1.0
