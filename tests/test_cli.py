"""CLI config-building tests (the reference-mirroring flag surface)."""

import argparse

import pytest

from gdn_tpu.cli import add_common_args, add_eval_args, add_train_args, build_config


def _parse(extra, train=True, evalargs=False):
    p = argparse.ArgumentParser()
    add_common_args(p)
    if train:
        add_train_args(p)
    if evalargs:
        add_eval_args(p)
    return p.parse_args(extra)


def test_kitti_defaults():
    cfg = build_config(_parse([]))
    assert cfg.model.image_size == (128, 416)
    assert cfg.model.max_depth == 80.0
    assert cfg.eval.crop == "garg"


def test_nyu_defaults():
    cfg = build_config(_parse(["--dataset", "nyu"]))
    assert cfg.model.image_size == (228, 304)
    assert cfg.model.max_depth == 10.0
    assert cfg.eval.cap == 10.0
    assert cfg.eval.crop == "none"


def test_train_overrides():
    cfg = build_config(_parse([
        "--mode", "RtoD", "--epochs", "7", "--lr", "3e-4",
        "--batch_size", "16", "--height", "96", "--width", "320",
        "--no_freeze_decoder", "--num_devices", "4",
    ]))
    assert cfg.train.mode == "RtoD"
    assert cfg.train.epochs == 7
    assert cfg.train.lr == pytest.approx(3e-4)
    assert cfg.data.batch_size == 16
    assert cfg.model.image_size == (96, 320)
    assert cfg.train.freeze_decoder is False
    assert cfg.mesh.num_devices == 4


def test_eval_overrides():
    cfg = build_config(_parse(
        ["--cap", "50", "--crop", "eigen", "--median_scaling"],
        train=False, evalargs=True,
    ))
    assert cfg.eval.cap == 50.0
    assert cfg.eval.crop == "eigen"
    assert cfg.eval.median_scaling is True


def test_steps_per_call_and_ssim_precision_flags():
    cfg = build_config(_parse(["--steps_per_call", "4",
                               "--ssim_precision", "default"]))
    assert cfg.train.steps_per_call == 4
    assert cfg.loss.ssim_precision == "default"
    # unset: keep the LossConfig default
    cfg2 = build_config(_parse([]))
    assert cfg2.train.steps_per_call == 1
    from gdn_tpu.config import LossConfig

    assert cfg2.loss.ssim_precision == LossConfig().ssim_precision


def test_no_pallas_flag():
    cfg = build_config(_parse(["--no_pallas"]))
    assert cfg.model.use_pallas is False
    assert cfg.loss.use_pallas is False


def test_upsample_flag():
    cfg = build_config(_parse(["--upsample", "deconv"]))
    assert cfg.model.upsample == "deconv"
    assert build_config(_parse([])).model.upsample == "deconv"
    assert build_config(_parse([])).model.deconv_init == "bilinear"
    cfg = build_config(_parse(["--upsample", "resize_conv"]))
    assert cfg.model.upsample == "resize_conv"
    cfg = build_config(_parse(["--deconv_init", "lecun"]))
    assert cfg.model.deconv_init == "lecun"


def test_norm_flag():
    assert build_config(_parse([])).model.norm == "group"
    cfg = build_config(_parse(["--norm", "none"]))
    assert cfg.model.norm == "none"
