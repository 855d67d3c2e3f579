"""End-to-end training-parity oracle (VERDICT r2, missing item 1).

Trains the SAME tiny two-stage pipeline in gdn-tpu (CPU, fp32) and in
the torch twin (tests/torch_twin.py) from identical flax-initialized
parameters on identical synthetic batches, and asserts the per-step
loss trajectories agree.  With an empty reference checkout this is the
strongest available evidence that the framework trains the same
function the math specifies: it covers models (conv SAME semantics,
GroupNorm, ELU, resize-conv decoder, fusion), the composite loss, the
Adam + schedule update, and the stage-1→stage-2 transfer+freeze path.

fp32 on CPU; both sides accumulate independent rounding, so the
tolerance is loose-absolute 1e-4 / per-step relative 1e-3 on each
term — far below any real divergence (a wrong padding or a swapped
axis moves losses at the 1e-1 level immediately).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import pytest
import torch

from gdn_tpu.config import (
    Config, DataConfig, EvalConfig, LossConfig, ModelConfig, TrainConfig,
)
from gdn_tpu.checkpoint import transfer_stage1_decoder
from gdn_tpu.data.synthetic import synthetic_batch
from gdn_tpu.models import DtoDNet, RtoDNet
from gdn_tpu.train.state import create_state
from gdn_tpu.train.steps import make_stage1_step, make_stage2_step

from torch_twin import (
    TorchGDN, TorchTrainer, batch_to_torch, flax_to_torch_params,
    stage1_loss_t, stage2_loss_t,
)

N_STEPS = 20
ATOL = 1e-4
RTOL = 1e-3


def _cfg() -> Config:
    return Config(
        model=ModelConfig(
            image_size=(16, 32), enc_channels=(8, 16),
            dec_channels=(16, 8), max_depth=80.0,
            dtype="float32", gn_impl="grouped", use_pallas=False,
        ),
        loss=LossConfig(grad_scales=2, use_pallas=False,
                        ssim_precision="highest"),
        data=DataConfig(dataset="synthetic", batch_size=4),
        train=TrainConfig(lr=1e-3, steps_per_epoch=N_STEPS, ckpt_dir=""),
        eval=EvalConfig(),
    )


def _batches(cfg, n, seed=7):
    key = jax.random.PRNGKey(seed)
    h, w = cfg.model.image_size
    out = []
    for i in range(n):
        key, sub = jax.random.split(key)
        out.append(synthetic_batch(sub, cfg.data.batch_size, h, w,
                                   cfg.model.max_depth))
    return out


def _traj_compare(jax_traj, torch_traj):
    for t, (jt, tt) in enumerate(zip(jax_traj, torch_traj)):
        for k in jt:
            assert np.isfinite(jt[k]) and np.isfinite(tt[k]), (t, k)
            np.testing.assert_allclose(
                jt[k], tt[k], atol=ATOL, rtol=RTOL,
                err_msg=f"step {t} term {k}: jax={jt[k]} torch={tt[k]}",
            )


@pytest.fixture(scope="module", params=["resize_conv", "deconv"])
def stage1_result(request):
    # Both decoder styles ship (resize_conv default after the round-4
    # full-res protocol; deconv as the throughput option) — both keep
    # full two-stage torch-parity coverage.
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, upsample=request.param))
    h, w = cfg.model.image_size
    batches = _batches(cfg, N_STEPS)

    state = create_state(DtoDNet(cfg=cfg.model), (1, h, w, 1), cfg.train,
                         cfg.train.steps_per_epoch)
    twin_params = flax_to_torch_params(state.params)
    twin = TorchGDN(twin_params, cfg, in_channels=1)
    trainer = TorchTrainer(twin_params, cfg, cfg.train.steps_per_epoch)

    step = make_stage1_step(cfg, mesh=None)
    jax_traj, torch_traj = [], []
    for b in batches:
        state, terms = step(state, b)
        jax_traj.append({k: float(v) for k, v in terms.items()})
        terms_t = stage1_loss_t(twin, batch_to_torch(b), cfg)
        torch_traj.append({k: float(v.detach()) for k, v in terms_t.items()})
        trainer.step(terms_t["total"])
    return cfg, state, twin_params, jax_traj, torch_traj


def test_stage1_training_parity(stage1_result):
    _, _, _, jax_traj, torch_traj = stage1_result
    _traj_compare(jax_traj, torch_traj)
    # the pipeline actually learns (not just matches)
    assert jax_traj[-1]["total"] < jax_traj[0]["total"]


def test_stage2_training_parity(stage1_result):
    cfg, d_state, d_twin_params, _, _ = stage1_result
    h, w = cfg.model.image_size
    batches = _batches(cfg, N_STEPS, seed=11)

    g_state = create_state(RtoDNet(cfg=cfg.model), (1, h, w, 3), cfg.train,
                           cfg.train.steps_per_epoch, freeze_decoder=True)
    g_state = g_state.replace(
        params=transfer_stage1_decoder(g_state.params, d_state.params))

    # torch side: same transfer — G-net params with the trained D-net
    # decoder subtree; decoder frozen.
    g_twin_params = flax_to_torch_params(g_state.params)
    d_twin = TorchGDN(
        {k: torch.nn.Parameter(p.detach().clone())
         for k, p in d_twin_params.items()},
        cfg, in_channels=1)
    g_twin = TorchGDN(g_twin_params, cfg, in_channels=3)
    trainer = TorchTrainer(g_twin_params, cfg, cfg.train.steps_per_epoch,
                           freeze_prefix="decoder/")

    step = make_stage2_step(cfg, mesh=None)
    jax_traj, torch_traj = [], []
    frozen_before = {k: p.detach().clone()
                     for k, p in g_twin_params.items()
                     if k.startswith("decoder/")}
    for b in batches:
        g_state, terms = step(g_state, d_state.params, b)
        jax_traj.append({k: float(v) for k, v in terms.items()})
        terms_t = stage2_loss_t(g_twin, d_twin, batch_to_torch(b), cfg)
        torch_traj.append({k: float(v.detach()) for k, v in terms_t.items()})
        trainer.step(terms_t["total"])
    _traj_compare(jax_traj, torch_traj)
    assert "latent" in jax_traj[0]
    # frozen decoder stayed bit-identical on the torch side too
    for k, v in frozen_before.items():
        assert torch.equal(v, g_twin_params[k].detach()), k


def test_stage2_uses_trained_d_params(stage1_result):
    """The guidance targets must come from the TRAINED D-net — the d_twin
    above is cloned from post-training twin params; verify they differ
    from a fresh init (guards against the fixture silently training
    nothing)."""
    cfg, d_state, d_twin_params, jax_traj, _ = stage1_result
    fresh = create_state(DtoDNet(cfg=cfg.model),
                         (1, *cfg.model.image_size, 1), cfg.train,
                         cfg.train.steps_per_epoch)
    a = jax.tree_util.tree_leaves(d_state.params)[0]
    b = jax.tree_util.tree_leaves(fresh.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
