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


def test_train_eval_batch_default():
    """The train CLI sets a real in-training eval batch (the EvalConfig
    default of 1 made every --eval_every image its own dispatch+fetch
    round trip)."""
    assert build_config(_parse([])).eval.batch_size == 32
    assert build_config(
        _parse(["--eval_batch", "64"])
    ).eval.batch_size == 64


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
    # resize_conv won the full-res convergence protocol (round 4)
    assert build_config(_parse([])).model.upsample == "resize_conv"
    assert build_config(_parse([])).model.deconv_init == "bilinear"
    cfg = build_config(_parse(["--upsample", "resize_conv"]))
    assert cfg.model.upsample == "resize_conv"
    cfg = build_config(_parse(["--deconv_init", "lecun"]))
    assert cfg.model.deconv_init == "lecun"


def test_norm_flag():
    assert build_config(_parse([])).model.norm == "group"
    cfg = build_config(_parse(["--norm", "none"]))
    assert cfg.model.norm == "none"


def test_self_describing_checkpoint_config(tmp_path):
    """save_config/load_config round-trip + apply_saved_model_config:
    a resize_conv-era checkpoint evaluates correctly with NO flags
    (VERDICT r3 missing item 4), and explicit CLI flags still win."""
    import dataclasses

    from gdn_tpu.checkpoint import load_config, save_config
    from gdn_tpu.cli import apply_saved_model_config
    from gdn_tpu.config import kitti_config

    trained = kitti_config(**{
        "model.upsample": "resize_conv",
        "model.enc_channels": (8, 16),
        "model.dec_channels": (16, 8),
        "train.ema_decay": 0.999,
    })
    d = str(tmp_path / "ck" / "stage2")
    save_config(d, trained)
    assert load_config(d) == trained

    # no flags: the saved architecture is adopted wholesale
    cfg = apply_saved_model_config(kitti_config(), _parse([]), d)
    assert cfg.model == trained.model
    assert cfg.model.upsample == "resize_conv"

    # explicit flag: CLI wins over the saved value
    cfg = apply_saved_model_config(
        kitti_config(), _parse(["--upsample", "deconv"]), d
    )
    assert cfg.model.upsample == "deconv"
    assert cfg.model.enc_channels == (8, 16)  # rest still adopted

    # pre-round-4 checkpoint (no config.json): unchanged cfg
    base = kitti_config()
    assert apply_saved_model_config(
        base, _parse([]), str(tmp_path / "nothing")
    ) is base


def test_config_from_dict_ignores_unknown_keys(tmp_path, capsys):
    """A config.json written by a NEWER framework version must load
    (unknown knobs dropped loudly), not crash old code."""
    import json
    import os

    from gdn_tpu.checkpoint import load_config, save_config
    from gdn_tpu.config import kitti_config

    d = str(tmp_path / "ck")
    save_config(d, kitti_config())
    path = os.path.join(d, "config.json")
    with open(path) as f:
        payload = json.load(f)
    payload["model"]["knob_from_the_future"] = 7
    with open(path, "w") as f:
        json.dump(payload, f)
    assert load_config(d) == kitti_config()
    assert "knob_from_the_future" in capsys.readouterr().out


def test_saved_config_adopts_architecture_not_execution(tmp_path):
    """Execution-strategy fields (kernel backends, composed execution,
    compute dtype) must come from the CURRENT environment, not the
    checkpoint: a model trained with --no_pallas on CPU must not pin
    later TPU evals to the XLA fallback."""
    from gdn_tpu.checkpoint import save_config
    from gdn_tpu.cli import apply_saved_model_config
    from gdn_tpu.config import kitti_config

    trained = kitti_config(**{
        "model.enc_channels": (8, 16),
        "model.dec_channels": (16, 8),
        "model.use_pallas": False,          # CPU smoke-run environment
        "model.resize_conv_composed": False,
        "model.dtype": "float32",
    })
    d = str(tmp_path / "ck" / "stage2")
    save_config(d, trained)

    env = kitti_config()  # TPU defaults: pallas on, composed on, bf16
    cfg = apply_saved_model_config(env, _parse([]), d)
    # architecture adopted from the checkpoint
    assert cfg.model.enc_channels == (8, 16)
    assert cfg.model.dec_channels == (16, 8)
    # execution strategy stays the environment's
    assert cfg.model.use_pallas == env.model.use_pallas
    assert cfg.model.resize_conv_composed == env.model.resize_conv_composed
    assert cfg.model.dtype == env.model.dtype


def test_every_model_config_field_is_categorized():
    """apply_saved_model_config keeps execution-strategy fields from the
    environment and adopts everything else from the checkpoint.  The
    split is field metadata (config._exec_field); this test pins the
    ARCHITECTURE side explicitly so any NEW ModelConfig field fails here
    until its author decides which side it belongs to — the silent
    default (adopted from old checkpoints) is exactly the re-pinning
    failure the execution set exists to prevent (ADVICE round 4)."""
    import dataclasses

    from gdn_tpu.config import ModelConfig

    architecture = {
        "image_size", "enc_channels", "dec_channels", "norm",
        "group_norm_groups", "activation", "upsample", "deconv_gn",
        "deconv_init", "fusion", "multiscale_heads", "max_depth",
        "min_depth",
    }
    execution = {
        f.name for f in dataclasses.fields(ModelConfig)
        if f.metadata.get("execution")
    }
    every = {f.name for f in dataclasses.fields(ModelConfig)}
    assert architecture & execution == set()
    assert architecture | execution == every, (
        f"uncategorized ModelConfig fields: "
        f"{sorted(every - architecture - execution)} — mark them with "
        f"config._exec_field(...) or add them to this test's "
        f"architecture set"
    )
