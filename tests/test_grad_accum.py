"""Gradient accumulation (TrainConfig.grad_accum / --grad_accum):
identity micro-steps, k-step equivalence to a plain step on the same
batch, and the EMA update gating."""

import dataclasses

import jax
import numpy as np

from gdn_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig
from gdn_tpu.data.synthetic import synthetic_batch
from gdn_tpu.models import DtoDNet
from gdn_tpu.train import create_state, make_stage1_step

TINY = Config(
    model=ModelConfig(
        image_size=(32, 64), enc_channels=(8, 16), dec_channels=(16, 8),
        dtype="float32", max_depth=80.0,
    ),
    loss=LossConfig(grad_scales=2),
    data=DataConfig(dataset="synthetic", batch_size=4),
    train=TrainConfig(lr=1e-3, steps_per_epoch=10, ckpt_dir=""),
)


def _batch(seed=0, b=4):
    return synthetic_batch(jax.random.PRNGKey(seed), b, 32, 64, 80.0)


def _leaves(tree):
    return jax.tree.leaves(jax.tree.map(np.asarray, tree))


def test_accum_micro_step_is_identity_then_applies():
    """With k=2 and the SAME batch twice, the first micro-step leaves
    params unchanged and the pair equals ONE plain (k=1) step: the
    averaged gradient of two identical micro-batches is the gradient."""
    cfg2 = dataclasses.replace(TINY, train=dataclasses.replace(
        TINY.train, grad_accum=2))
    s_acc = create_state(DtoDNet(cfg=cfg2.model), (1, 32, 64, 1),
                         cfg2.train, 10)
    s_ref = create_state(DtoDNet(cfg=TINY.model), (1, 32, 64, 1),
                         TINY.train, 10)
    for a, b in zip(_leaves(s_acc.params), _leaves(s_ref.params)):
        np.testing.assert_array_equal(a, b)
    b0 = _batch(0)
    step_acc = make_stage1_step(cfg2, mesh=None)
    step_ref = make_stage1_step(TINY, mesh=None)

    p0 = _leaves(s_acc.params)
    s_acc, _ = step_acc(s_acc, b0)
    for a, b in zip(p0, _leaves(s_acc.params)):
        np.testing.assert_array_equal(a, b)  # accumulation only

    s_acc, _ = step_acc(s_acc, b0)
    s_ref, _ = step_ref(s_ref, b0)
    for a, b in zip(_leaves(s_acc.params), _leaves(s_ref.params)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_accum_ema_updates_only_on_apply():
    d = 0.5
    cfg = dataclasses.replace(TINY, train=dataclasses.replace(
        TINY.train, grad_accum=2, ema_decay=d))
    state = create_state(DtoDNet(cfg=cfg.model), (1, 32, 64, 1),
                         cfg.train, 10)
    step = make_stage1_step(cfg, mesh=None)
    ema0 = _leaves(state.ema_params)
    state, _ = step(state, _batch(0))
    for a, b in zip(ema0, _leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)  # no apply yet
    state, _ = step(state, _batch(1))
    p = _leaves(state.params)
    want = [d * e + (1 - d) * q for e, q in zip(ema0, p)]
    for a, b in zip(want, _leaves(state.ema_params)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_accum_with_frozen_decoder_and_clip():
    """MultiSteps composes with the stage-2-style freeze and clipping:
    frozen leaves stay bit-identical across a full accumulation cycle."""
    cfg = dataclasses.replace(TINY, train=dataclasses.replace(
        TINY.train, grad_accum=2, grad_clip=1.0))
    state = create_state(DtoDNet(cfg=cfg.model), (1, 32, 64, 1),
                         cfg.train, 10, freeze_decoder=True)
    step = make_stage1_step(cfg, mesh=None)
    dec0 = _leaves(state.params["decoder"])
    enc0 = _leaves(state.params["encoder"])
    state, _ = step(state, _batch(0))
    state, _ = step(state, _batch(1))
    for a, b in zip(dec0, _leaves(state.params["decoder"])):
        np.testing.assert_array_equal(a, b)
    changed = any(
        not np.array_equal(a, b)
        for a, b in zip(enc0, _leaves(state.params["encoder"]))
    )
    assert changed


def test_accum_ema_mesh_matches_single_device():
    """The production combination (grad_accum + EMA) on the 8-device
    mesh agrees with the single-device path, including ema_params."""
    import jax.numpy as jnp

    from gdn_tpu.parallel.mesh import create_mesh, shard_batch

    cfg = dataclasses.replace(TINY, train=dataclasses.replace(
        TINY.train, grad_accum=2, ema_decay=0.9))
    state = create_state(DtoDNet(cfg=cfg.model), (1, 32, 64, 1),
                         cfg.train, 10)
    mesh = create_mesh(8)
    step_single = make_stage1_step(cfg, mesh=None)
    step_mesh = make_stage1_step(cfg, mesh=mesh)
    s_a = jax.tree.map(jnp.copy, state)
    s_b = jax.tree.map(jnp.copy, state)
    for seed in (0, 1):  # one full accumulation cycle
        batch = _batch(seed, b=8)
        s_a, _ = step_single(s_a, batch)
        s_b, _ = step_mesh(s_b, shard_batch(batch, mesh))
    for tree in ("params", "ema_params"):
        for a, b in zip(_leaves(getattr(s_a, tree)),
                        _leaves(getattr(s_b, tree))):
            # rtol 5e-4: chanreduce GN reduce-ordering noise between the
            # single-device and psum'd gradients (see test_train.py).
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-6)


def test_cli_grad_accum_flag():
    import argparse

    from gdn_tpu.cli import add_common_args, add_train_args, build_config

    p = argparse.ArgumentParser()
    add_common_args(p)
    add_train_args(p)
    args = p.parse_args(["--dataset", "synthetic", "--grad_accum", "4"])
    cfg = build_config(args)
    assert cfg.train.grad_accum == 4
