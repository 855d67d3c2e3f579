"""CLI subprocess integration tests (VERDICT r2 missing item 2).

The scripts/ entry points are the product surface mirroring the
reference's train/eval/demo scripts (SURVEY.md §2.6/§2.7/§2.8/§2.13);
these tests run them end-to-end as real subprocesses on synthetic data:

  train DtoD -> train RtoD (consuming the stage-1 ckpt) -> eval on the
  stage-2 ckpt (+ --save_preds) -> demo on a temp image.

Each asserts exit code 0 plus the expected on-disk artifacts.  Runs on
CPU (--platform cpu) with a tiny resolution; full channel ladder, so
the real model/checkpoint/eval glue is exercised, just on small maps.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable

COMMON = [
    "--dataset", "synthetic", "--platform", "cpu",
    "--height", "32", "--width", "64",
]
TRAIN_COMMON = COMMON + [
    "--epochs", "1", "--steps_per_epoch", "4", "--batch_size", "2",
    "--log_every", "2", "--seed", "3",
]


def _run(script, *args, timeout=900):
    env = dict(os.environ)
    # subprocesses get a plain single-CPU jax (no 8-device override)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [PY, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{script} {' '.join(args)} failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-4000:]}\nstderr:\n{proc.stderr[-4000:]}"
    )
    return proc


@pytest.fixture(scope="module")
def trained_ckpts(tmp_path_factory):
    """Run both training stages as subprocesses; return the model dir."""
    model_dir = str(tmp_path_factory.mktemp("cli_ckpts"))
    out1 = _run("train.py", "--mode", "DtoD", "--model_dir", model_dir,
                *TRAIN_COMMON)
    assert "stage 1 finished" in out1.stdout
    assert os.path.isdir(os.path.join(model_dir, "stage1"))
    out2 = _run("train.py", "--mode", "RtoD", "--model_dir", model_dir,
                "--eval_every", "1", "--eval_max_images", "4",
                *TRAIN_COMMON)
    assert "stage 2 finished" in out2.stdout
    assert "eval_rmse" in out2.stdout  # in-training eval hook ran
    assert os.path.isdir(os.path.join(model_dir, "stage2"))
    return model_dir


def test_train_writes_jsonl_log(trained_ckpts):
    log = os.path.join(trained_ckpts, "train_log.jsonl")
    assert os.path.exists(log)
    lines = [json.loads(l) for l in open(log) if l.strip()]
    assert any("total" in l for l in lines)
    assert any("imgs_per_sec" in l for l in lines)


def test_train_resume_continues_step_count(trained_ckpts):
    out = _run("train.py", "--mode", "DtoD", "--model_dir", trained_ckpts,
               "--resume", *TRAIN_COMMON)
    assert "resumed stage 1 at step 4" in out.stdout
    assert "stage 1 finished at step 8" in out.stdout


def test_eval_cli(trained_ckpts, tmp_path):
    preds = str(tmp_path / "preds")
    out = _run("eval.py", "--model_dir", trained_ckpts,
               "--max_images", "4", "--eval_batch", "2",
               "--save_preds", preds, *COMMON)
    # metric table line: k=v pairs incl. the protocol metrics
    line = [l for l in out.stdout.splitlines() if "rmse=" in l]
    assert line, out.stdout
    metrics = dict(kv.split("=") for kv in line[-1].split())
    for k in ("abs_rel", "rmse", "a1", "a2", "a3"):
        assert k in metrics and np.isfinite(float(metrics[k]))
    pred_files = sorted(os.listdir(preds))
    assert len(pred_files) == 4
    arr = np.load(os.path.join(preds, pred_files[0]))
    assert arr.shape == (32, 64) and np.isfinite(arr).all()


def test_eval_cli_stage1(trained_ckpts):
    out = _run("eval.py", "--model_dir", trained_ckpts, "--stage", "1",
               "--max_images", "2", "--eval_batch", "2", *COMMON)
    assert any("rmse=" in l for l in out.stdout.splitlines())


def test_demo_cli(trained_ckpts, tmp_path):
    from PIL import Image

    img = (np.random.default_rng(0).uniform(0, 255, (32, 64, 3))
           .astype(np.uint8))
    img_path = str(tmp_path / "frame.png")
    Image.fromarray(img).save(img_path)
    out_dir = str(tmp_path / "demo_out")
    out = _run("demo.py", "--model_dir", trained_ckpts,
               "--input", img_path, "--output", out_dir, *COMMON)
    written = [l for l in out.stdout.splitlines() if l.strip()]
    assert written and os.path.exists(written[-1])
    assert any(os.scandir(out_dir))


def test_import_torch_cli(tmp_path):
    """scripts/import_torch.py converts a torch state_dict into a
    loadable stage-1 orbax checkpoint (migration path for reference
    users' .pth weights)."""
    import torch

    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp
    from gdn_tpu.config import kitti_config
    from gdn_tpu.models import DtoDNet
    from gdn_tpu.train import create_state

    cfg = kitti_config(**{"model.image_size": (32, 64),
                          "train.ckpt_dir": ""})
    state = create_state(DtoDNet(cfg=cfg.model), (1, 32, 64, 1),
                         cfg.train, 1)
    sd = {}

    def flatten(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                flatten(v, f"{prefix}.{k}" if prefix else k)
        else:
            arr = np.asarray(node)
            if arr.ndim == 4:
                arr = np.transpose(arr, (3, 2, 0, 1))
            sd[prefix] = torch.from_numpy(arr.copy())

    flatten(state.params, "")
    pth = str(tmp_path / "weights.pth")
    torch.save(sd, pth)
    model_dir = str(tmp_path / "ckpt")
    out = _run("import_torch.py", "--pth", pth, "--stage", "1",
               "--model_dir", model_dir, *COMMON)
    assert "imported" in out.stdout
    assert os.path.isdir(os.path.join(model_dir, "stage1"))
    # the converted checkpoint round-trips through the normal loader
    from gdn_tpu import checkpoint as ckpt

    params = ckpt.load_params(os.path.join(model_dir, "stage1"),
                              state.params)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(state.params)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(kp))


def test_profile_cli(tmp_path):
    """scripts/profile_step.py traces steps and prints the op-time report
    (works on CPU; the parser handles CPU pids)."""
    out = _run("profile_step.py", "--mode", "DtoD", "--batch_size", "2",
               "--steps", "2", "--logdir", str(tmp_path / "prof"),
               *COMMON, timeout=900)
    assert "program_ms_per_step" in out.stdout
    assert "top op categories" in out.stdout


def test_train_cli_sigterm_preemption(tmp_path):
    """Product-level preemption: SIGTERM to a running scripts/train.py
    finishes the step, checkpoints, prints the resume hint, exits 0."""
    import signal
    import time

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    model_dir = str(tmp_path / "ck")
    proc = subprocess.Popen(
        [PY, os.path.join(REPO, "scripts", "train.py"),
         "--mode", "DtoD", "--model_dir", model_dir,
         "--epochs", "1", "--steps_per_epoch", "500", "--batch_size", "2",
         "--log_every", "1", "--seed", "3", *COMMON],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO,
    )
    # wait for training to actually be stepping, then preempt
    lines = []
    deadline = time.time() + 600
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if "step=" in line:
            break
    assert any("step=" in l for l in lines), "".join(lines)[-2000:]
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    full = "".join(lines) + out
    assert proc.returncode == 0, full[-3000:]
    assert "preempted: checkpoint saved" in full
    assert os.path.isdir(os.path.join(model_dir, "stage1"))


def test_convergence_cli_subprocess(tmp_path):
    """scripts/convergence.py: tiny protocol run emits per-seed metrics
    and the DONE summary line (the measurement harness stays runnable)."""
    import json as _json

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convergence.py"),
         "--seeds", "0", "--steps", "4", "--batch_size", "2",
         "--height", "32", "--width", "64", "--eval_images", "3",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=1200, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    done = _json.loads(lines[-1])
    assert done["DONE"] and "a1_mean" in done
    assert "0" in done["per_seed"] or 0 in done["per_seed"]
