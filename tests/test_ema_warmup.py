"""Production trainer knobs: LR warmup schedule and EMA (Polyak)
parameter averaging — math, step wiring, checkpoint round-trip, and
the eval-side key selection."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gdn_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig
from gdn_tpu.data.synthetic import synthetic_batch
from gdn_tpu.models import DtoDNet
from gdn_tpu.train import create_state, make_stage1_step
from gdn_tpu.train.state import lr_schedule

TINY = Config(
    model=ModelConfig(
        image_size=(32, 64), enc_channels=(8, 16), dec_channels=(16, 8),
        dtype="float32", max_depth=80.0,
    ),
    loss=LossConfig(grad_scales=2),
    data=DataConfig(dataset="synthetic", batch_size=8),
    train=TrainConfig(lr=1e-3, steps_per_epoch=10, ckpt_dir=""),
)


def _batch(seed=0, b=4):
    return synthetic_batch(jax.random.PRNGKey(seed), b, 32, 64, 80.0)


def test_warmup_schedule_values():
    cfg = dataclasses.replace(TINY.train, warmup_steps=10, lr=1e-3)
    sched = lr_schedule(cfg, steps_per_epoch=100)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    # post-warmup the step decay takes over (staircase, epoch-scaled)
    np.testing.assert_allclose(float(sched(11)), 1e-3, rtol=1e-6)
    # without warmup the schedule starts at lr
    sched0 = lr_schedule(dataclasses.replace(cfg, warmup_steps=0), 100)
    np.testing.assert_allclose(float(sched0(0)), 1e-3, rtol=1e-6)


def test_cosine_and_constant_schedules():
    """cfg.schedule selects the LR shape; cosine spans epochs *
    steps_per_epoch (minus warmup) and decays to 0, constant stays at
    lr, and both compose with warmup."""
    base = dataclasses.replace(
        TINY.train, lr=1e-3, epochs=2, schedule="cosine"
    )
    sched = lr_schedule(base, steps_per_epoch=50)  # 100 total updates
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 5e-4, rtol=1e-5)  # midpoint
    assert float(sched(100)) < 1e-8

    warm = dataclasses.replace(base, warmup_steps=10)
    sw = lr_schedule(warm, steps_per_epoch=50)
    assert float(sw(0)) == 0.0
    np.testing.assert_allclose(float(sw(10)), 1e-3, rtol=1e-6)
    # cosine midpoint shifts past the warmup: (100-10)/2 + 10 = 55
    np.testing.assert_allclose(float(sw(55)), 5e-4, rtol=1e-5)

    const = dataclasses.replace(base, schedule="constant")
    sc = lr_schedule(const, steps_per_epoch=50)
    np.testing.assert_allclose(float(sc(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sc(99)), 1e-3, rtol=1e-6)

    import pytest

    with pytest.raises(ValueError):
        lr_schedule(
            dataclasses.replace(base, schedule="bogus"), steps_per_epoch=50
        )


def test_ema_tracks_polyak_average():
    d = 0.5
    cfg = dataclasses.replace(TINY, train=dataclasses.replace(
        TINY.train, ema_decay=d))
    state = create_state(DtoDNet(cfg=cfg.model), (1, 32, 64, 1),
                         cfg.train, 10)
    assert state.ema_params is not None
    p0 = jax.tree.map(np.asarray, state.params)
    step = make_stage1_step(cfg, mesh=None)
    state, _ = step(state, _batch(0))
    p1 = jax.tree.map(np.asarray, state.params)
    # after one update: ema = d*p0 + (1-d)*p1
    want1 = jax.tree.map(lambda a, b: d * a + (1 - d) * b, p0, p1)
    got1 = jax.tree.map(np.asarray, state.ema_params)
    for a, b in zip(jax.tree.leaves(want1), jax.tree.leaves(got1)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    state, _ = step(state, _batch(1))
    p2 = jax.tree.map(np.asarray, state.params)
    want2 = jax.tree.map(lambda e, b: d * e + (1 - d) * b, want1, p2)
    got2 = jax.tree.map(np.asarray, state.ema_params)
    for a, b in zip(jax.tree.leaves(want2), jax.tree.leaves(got2)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_ema_off_keeps_state_shape():
    state = create_state(DtoDNet(cfg=TINY.model), (1, 32, 64, 1),
                         TINY.train, 10)
    assert state.ema_params is None
    step = make_stage1_step(TINY, mesh=None)
    state, _ = step(state, _batch(0))
    assert state.ema_params is None


def test_ema_multistep_matches_single_steps():
    """K=2 scan carries ema_params identically to two single steps."""
    import jax.numpy as jnp

    from gdn_tpu.train.steps import make_stage1_multistep

    d = 0.5
    cfg = dataclasses.replace(TINY, train=dataclasses.replace(
        TINY.train, ema_decay=d))
    s_a = create_state(DtoDNet(cfg=cfg.model), (1, 32, 64, 1), cfg.train, 10)
    s_b = create_state(DtoDNet(cfg=cfg.model), (1, 32, 64, 1), cfg.train, 10)
    b0, b1 = _batch(0), _batch(1)

    step = make_stage1_step(cfg, mesh=None)
    s_a, _ = step(s_a, b0)
    s_a, _ = step(s_a, b1)

    multistep = make_stage1_multistep(cfg, steps_per_call=2, mesh=None)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), b0, b1)
    s_b, _ = multistep(s_b, stacked)

    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, s_a.ema_params)),
                    jax.tree.leaves(jax.tree.map(np.asarray, s_b.ema_params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_ema_checkpoint_roundtrip(tmp_path):
    from gdn_tpu import checkpoint as ckpt

    d = 0.9
    cfg = dataclasses.replace(TINY, train=dataclasses.replace(
        TINY.train, ema_decay=d))
    state = create_state(DtoDNet(cfg=cfg.model), (1, 32, 64, 1),
                         cfg.train, 10)
    step = make_stage1_step(cfg, mesh=None)
    state, _ = step(state, _batch(0))
    ema_before = jax.tree.map(np.asarray, state.ema_params)
    ckpt.save_checkpoint(str(tmp_path / "s1"), 1, state)

    fresh = create_state(DtoDNet(cfg=cfg.model), (1, 32, 64, 1),
                         cfg.train, 10,
                         rng=jax.random.PRNGKey(123))
    restored = ckpt.restore_checkpoint(str(tmp_path / "s1"), fresh)
    for a, b in zip(jax.tree.leaves(ema_before),
                    jax.tree.leaves(jax.tree.map(np.asarray,
                                                 restored.ema_params))):
        np.testing.assert_array_equal(a, b)

    # eval-side key selection loads the EMA tree, not the raw params
    loaded = ckpt.load_params(str(tmp_path / "s1"), fresh.params,
                              key="ema_params")
    for a, b in zip(jax.tree.leaves(ema_before),
                    jax.tree.leaves(jax.tree.map(np.asarray, loaded))):
        np.testing.assert_array_equal(a, b)


def test_cli_flags_build_config():
    import argparse

    from gdn_tpu.cli import add_common_args, add_train_args, build_config

    p = argparse.ArgumentParser()
    add_common_args(p)
    add_train_args(p)
    args = p.parse_args([
        "--dataset", "synthetic", "--warmup_steps", "100",
        "--ema_decay", "0.999", "--grad_clip", "1.0",
    ])
    cfg = build_config(args)
    assert cfg.train.warmup_steps == 100
    assert cfg.train.ema_decay == 0.999
    assert cfg.train.grad_clip == 1.0
