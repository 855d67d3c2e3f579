"""Torch .pth export (checkpoint.params_to_torch + scripts/export_torch.py):
the inverse of the import path — models trained here travel back to the
reference's PyTorch ecosystem (SURVEY.md §2.9).  The contract is an
exact round trip through params_from_torch."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from gdn_tpu import checkpoint as ckpt
from gdn_tpu.config import kitti_config
from gdn_tpu.models import RtoDNet
from gdn_tpu.train import create_state

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_cfg(ckpt_dir=""):
    return kitti_config(**{
        "model.image_size": (32, 64),
        "model.enc_channels": (8, 16),
        "model.dec_channels": (16, 8),
        "train.ckpt_dir": ckpt_dir,
    })


def _leaf_paths(params):
    return [
        (".".join(getattr(p, "key", str(p)) for p in kp), leaf)
        for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    ]


def test_params_to_torch_roundtrip():
    """Exported state_dict: torch-style dotted keys, 4-D kernels in
    OIHW, and params_from_torch(template, export) bit-equal to the
    source tree."""
    cfg = _tiny_cfg()
    params = create_state(
        RtoDNet(cfg=cfg.model), (1, 32, 64, 3), cfg.train, 1
    ).params

    sd = ckpt.params_to_torch(params)
    leaves = _leaf_paths(params)
    assert len(sd) == len(leaves)
    for key, leaf in leaves:
        arr = sd[key]
        lf = np.asarray(leaf)
        if lf.ndim == 4:
            h, w, i, o = lf.shape
            assert arr.shape == (o, i, h, w), key
            np.testing.assert_array_equal(
                arr, np.transpose(lf, (3, 2, 0, 1)), err_msg=key)
        else:
            np.testing.assert_array_equal(arr, lf, err_msg=key)

    back = ckpt.params_from_torch(params, sd)
    for (key, a), (_, b) in zip(_leaf_paths(back), leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=key)


def test_params_to_torch_key_map_rides_both_directions():
    """The same key_map used for import renames the export, so a
    per-checkpoint name mapping is written once."""
    cfg = _tiny_cfg()
    params = create_state(
        RtoDNet(cfg=cfg.model), (1, 32, 64, 3), cfg.train, 1
    ).params
    flax_path = _leaf_paths(params)[0][0].replace(".", "/")
    km = {flax_path: "reference_module.weight"}

    sd = ckpt.params_to_torch(params, key_map=km)
    assert "reference_module.weight" in sd
    assert flax_path.replace("/", ".") not in sd

    back = ckpt.params_from_torch(params, sd, key_map=km)
    for (key, a), (_, b) in zip(_leaf_paths(back), _leaf_paths(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=key)


def test_export_torch_cli(tmp_path):
    """scripts/export_torch.py: checkpoint -> .pth whose tensors
    torch-load and re-import bit-equal (subprocess, self-describing
    config adopted from the checkpoint)."""
    import torch

    model_dir = str(tmp_path / "ck")
    cfg = _tiny_cfg(model_dir)
    state = create_state(
        RtoDNet(cfg=cfg.model), (1, 32, 64, 3), cfg.train, 1
    )
    ckpt.save_checkpoint(
        os.path.join(model_dir, "stage2"), 1, state, cfg=cfg,
    )

    pth = str(tmp_path / "exported.pth")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export_torch.py"),
         "--stage", "2", "--model_dir", model_dir, "--pth", pth,
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert "wrote" in proc.stdout

    sd = {k: v.numpy() for k, v in torch.load(
        pth, map_location="cpu", weights_only=True).items()}
    back = ckpt.params_from_torch(state.params, sd)
    for (key, a), (_, b) in zip(
        _leaf_paths(back), _leaf_paths(state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=key)
