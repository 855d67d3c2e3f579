"""Integration tests: train steps run, loss decreases, stage-1 ->
stage-2 transfer works, checkpoints round-trip (SURVEY.md §4)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdn_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig
from gdn_tpu.data.synthetic import SyntheticDataset, synthetic_batch
from gdn_tpu.models import DtoDNet, RtoDNet
from gdn_tpu.train import (
    create_state,
    make_eval_forward,
    make_stage1_step,
    make_stage2_step,
)

TINY = Config(
    model=ModelConfig(
        image_size=(32, 64), enc_channels=(8, 16), dec_channels=(16, 8),
        dtype="float32", max_depth=80.0,
    ),
    loss=LossConfig(grad_scales=2),
    data=DataConfig(dataset="synthetic", batch_size=8),
    train=TrainConfig(lr=1e-3, steps_per_epoch=10, ckpt_dir=""),
)


def _batch(seed=0, b=8):
    return synthetic_batch(jax.random.PRNGKey(seed), b, 32, 64, 80.0)


# Program-equivalence tolerance for tests that compare the SAME train
# math compiled as two different XLA programs (scan-multistep vs
# sequential steps, fused vs two-pass).  With the deconv decoder
# default, ConvTranspose gradients reassociate differently across
# program shapes: measured drift is ~4e-6 abs / ~1e-4 rel on params
# after 3 Adam steps (resize_conv stays at ~2e-7).  Pure FP rounding,
# not a math difference — /tmp bisect banked 2026-08-17.
PROG_EQ = dict(rtol=3e-4, atol=1e-5)


def _fresh_d_state():
    model = DtoDNet(cfg=TINY.model)
    return create_state(model, (1, 32, 64, 1), TINY.train, 10)


@pytest.fixture()
def d_state():
    # Fresh per test: the train step donates the state argument, so a
    # shared fixture's buffers would be deleted by the first test.
    return _fresh_d_state()


def test_stage1_loss_decreases(d_state):
    step = make_stage1_step(TINY, mesh=None)
    batch = _batch()
    state = d_state
    first = last = None
    for i in range(30):
        state, terms = step(state, batch)
        if first is None:
            first = float(terms["total"])
        last = float(terms["total"])
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)


def test_stage2_transfer_freeze_and_train(d_state):
    from gdn_tpu.checkpoint import transfer_stage1_decoder

    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(
        g_model, (1, 32, 64, 3), TINY.train, 10, freeze_decoder=True
    )
    g_state = g_state.replace(
        params=transfer_stage1_decoder(g_state.params, d_state.params)
    )
    dec_before = jax.tree.map(np.asarray, g_state.params["decoder"])
    enc_before = jax.tree.map(np.asarray, g_state.params["encoder"])

    step = make_stage2_step(TINY, mesh=None)
    batch = _batch(1)
    first = last = None
    for i in range(20):
        g_state, terms = step(g_state, d_state.params, batch)
        if first is None:
            first = float(terms["total"])
        last = float(terms["total"])
    assert "latent" in terms
    assert last < first, (first, last)

    # decoder frozen bit-exactly, encoder trained
    dec_after = jax.tree.map(np.asarray, g_state.params["decoder"])
    for a, b in zip(jax.tree.leaves(dec_before), jax.tree.leaves(dec_after)):
        np.testing.assert_array_equal(a, b)
    changed = [
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(enc_before), jax.tree.leaves(g_state.params["encoder"]))
    ]
    assert any(changed)


def test_transfer_shape_mismatch_raises(d_state):
    from gdn_tpu.checkpoint import transfer_stage1_decoder

    other = Config(
        model=ModelConfig(
            image_size=(32, 64), enc_channels=(4, 8), dec_channels=(8, 4),
            dtype="float32",
        ),
        train=TINY.train,
    )
    g_state = create_state(RtoDNet(cfg=other.model), (1, 32, 64, 3), other.train, 10)
    with pytest.raises(ValueError, match="not shape-compatible"):
        transfer_stage1_decoder(g_state.params, d_state.params)


def test_data_parallel_stage1_matches_single_device(d_state):
    """Mesh-sharded step must agree with the single-device step (same
    math, batch split over 8 CPU devices + ICI-style psum)."""
    from gdn_tpu.parallel.mesh import create_mesh, shard_batch

    mesh = create_mesh(8)
    batch = _batch(2)
    step_single = make_stage1_step(TINY, mesh=None)
    step_mesh = make_stage1_step(TINY, mesh=mesh)

    # The step donates its state arg, so give each path its own copy.
    state_a = jax.tree.map(jnp.copy, d_state)
    state_b = jax.tree.map(jnp.copy, d_state)
    s1, t1 = step_single(state_a, batch)
    s8, t8 = step_mesh(state_b, shard_batch(batch, mesh))
    assert float(t1["total"]) == pytest.approx(float(t8["total"]), rel=1e-5)
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    for a, b in zip(l1, l8):
        # rtol 5e-4: the default chanreduce GN's single-pass variance
        # (E[x^2]-mean^2) amplifies reduce-ordering noise between the
        # single-device and psum'd gradients (observed 2.5e-4 on 1/576
        # elements); real sharding bugs are O(1), not O(1e-4).
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)


def test_spatial_partition_batch_placement():
    """A 2-D (data, spatial) mesh shards batch dim 0 on "data" and the
    image height (dim 1) on "spatial"."""
    from jax.sharding import PartitionSpec as P
    from gdn_tpu.parallel.mesh import create_mesh, shard_batch, spatial_size

    mesh = create_mesh(8, spatial=4)
    assert dict(mesh.shape) == {"data": 2, "spatial": 4}
    assert spatial_size(mesh) == 4
    batch = _batch(b=4)
    sharded = shard_batch(batch, mesh)
    for v in sharded.values():
        assert v.sharding.spec == P("data", "spatial")
        shard_shape = v.sharding.shard_shape(v.shape)
        assert shard_shape[0] == v.shape[0] // 2
        assert shard_shape[1] == v.shape[1] // 4


def test_spatial_partition_stage1_matches_single_device(d_state):
    """Height-sharded (SP) train step == single-device step: XLA SPMD's
    halo exchanges + stat psums must not change the math (SURVEY §2.10
    SP row; parallel/mesh.py spatial axis)."""
    from gdn_tpu.parallel.mesh import create_mesh, shard_batch

    mesh = create_mesh(8, spatial=4)  # (data=2, spatial=4)
    batch = _batch(2)
    step_single = make_stage1_step(TINY, mesh=None)
    step_mesh = make_stage1_step(TINY, mesh=mesh)

    state_a = jax.tree.map(jnp.copy, d_state)
    state_b = jax.tree.map(jnp.copy, d_state)
    s1, t1 = step_single(state_a, batch)
    s8, t8 = step_mesh(state_b, shard_batch(batch, mesh))
    assert float(t1["total"]) == pytest.approx(float(t8["total"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        # same tolerance rationale as the data-parallel test above
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)


def test_spatial_safe_cfg_disables_pallas_loss():
    """Spatial meshes must route the loss through the jnp path (a
    Pallas custom call has no SPMD partitioning rule) and the
    resize_conv branch through the UNFUSED path (the SPMD partitioner
    miscompiles the composed op's kernel gradient under height-sharded
    inputs — dk rel-err 0.16 measured, steps.py docstring); 1-D meshes
    keep the config untouched."""
    import dataclasses

    from gdn_tpu.parallel.mesh import create_mesh
    from gdn_tpu.train.steps import _spatial_safe_cfg

    assert TINY.loss.use_pallas
    assert TINY.model.resize_conv_composed
    out = _spatial_safe_cfg(TINY, create_mesh(8, spatial=2))
    assert not out.loss.use_pallas
    assert not out.model.resize_conv_composed
    assert out.model == dataclasses.replace(
        TINY.model, resize_conv_composed=False)
    assert out.train == TINY.train
    assert _spatial_safe_cfg(TINY, create_mesh(8)) is TINY
    assert _spatial_safe_cfg(TINY, None) is TINY


def test_spatial_partition_stage2_matches_single_device(d_state):
    """Stage-2 guided step under (data=2, spatial=4): both nets, the
    guidance forward, and the jnp loss path (the Pallas kernel is
    bypassed on spatial meshes by _spatial_safe_cfg) partition cleanly."""
    from gdn_tpu.checkpoint import transfer_stage1_decoder
    from gdn_tpu.parallel.mesh import create_mesh, shard_batch

    mesh = create_mesh(8, spatial=4)
    g_state = create_state(
        RtoDNet(cfg=TINY.model), (1, 32, 64, 3), TINY.train, 10,
        freeze_decoder=True,
    )
    g_state = g_state.replace(
        params=transfer_stage1_decoder(g_state.params, d_state.params)
    )
    batch = _batch(3)
    step_single = make_stage2_step(TINY, mesh=None)
    step_mesh = make_stage2_step(TINY, mesh=mesh)

    state_a = jax.tree.map(jnp.copy, g_state)
    state_b = jax.tree.map(jnp.copy, g_state)
    s1, t1 = step_single(state_a, d_state.params, batch)
    s8, t8 = step_mesh(state_b, d_state.params, shard_batch(batch, mesh))
    assert float(t1["total"]) == pytest.approx(float(t8["total"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)


def test_synthetic_dataset_shapes():
    it = iter(SyntheticDataset(batch_size=4, height=32, width=64))
    b = next(it)
    assert b["rgb"].shape == (4, 32, 64, 3)
    assert b["depth"].shape == (4, 32, 64, 1)
    assert b["mask"].shape == (4, 32, 64, 1)
    assert float(b["depth"].max()) <= 80.0
    assert float(b["rgb"].min()) >= 0.0 and float(b["rgb"].max()) <= 1.0
    b2 = next(it)
    assert not np.array_equal(np.asarray(b["depth"]), np.asarray(b2["depth"]))


def test_checkpoint_roundtrip(tmp_path, d_state):
    from gdn_tpu.checkpoint import load_params, restore_checkpoint, save_checkpoint

    step = make_stage1_step(TINY, mesh=None)
    state, _ = step(d_state, _batch())
    save_checkpoint(str(tmp_path / "ck"), 1, state)

    fresh = create_state(DtoDNet(cfg=TINY.model), (1, 32, 64, 1), TINY.train, 10)
    restored = restore_checkpoint(str(tmp_path / "ck"), fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    params = load_params(str(tmp_path / "ck"), fresh.params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_harness_on_synthetic(d_state):
    from gdn_tpu.evaluate import evaluate

    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(g_model, (1, 32, 64, 3), TINY.train, 10)
    fwd = make_eval_forward(TINY, g_model)

    def eval_ds():
        rng = np.random.default_rng(0)
        for _ in range(3):
            b = _batch(5, b=1)
            gt = rng.uniform(1, 79, (1, 96, 192)).astype(np.float32)
            yield {"rgb": np.asarray(b["rgb"]), "gt": gt}

    cfg = Config(model=TINY.model, eval=TINY.eval, train=TINY.train)
    out = evaluate(cfg, g_state.params, fwd, eval_ds(), verbose=False)
    assert set(out) >= {"abs_rel", "rmse", "a1", "fps"}
    assert np.isfinite(out["rmse"])


def test_validation_hook():
    from gdn_tpu.train.loop import train_stage1
    from gdn_tpu.utils.logging import MetricLogger
    import io

    buf = io.StringIO()
    logger = MetricLogger(prefix="s1", stream=buf)
    ds = SyntheticDataset(batch_size=8, height=32, width=64)
    cfg = TINY
    state = train_stage1(
        cfg, ds, use_mesh=False, epochs=1, logger=logger,
        val_iter=SyntheticDataset(batch_size=8, height=32, width=64, seed=9),
        val_steps=2,
    )
    out = buf.getvalue()
    assert "val_total" in out and "val_recon" in out


def test_data_parallel_stage2_matches_single_device(d_state):
    """Stage-2 guided step: mesh vs single-device equivalence."""
    from gdn_tpu.checkpoint import transfer_stage1_decoder
    from gdn_tpu.parallel.mesh import create_mesh, shard_batch

    mesh = create_mesh(8)
    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(g_model, (1, 32, 64, 3), TINY.train, 10, freeze_decoder=True)
    g_state = g_state.replace(
        params=transfer_stage1_decoder(g_state.params, d_state.params)
    )
    batch = _batch(3)
    step_single = make_stage2_step(TINY, mesh=None)
    step_mesh = make_stage2_step(TINY, mesh=mesh)
    sa = jax.tree.map(jnp.copy, g_state)
    sb = jax.tree.map(jnp.copy, g_state)
    s1, t1 = step_single(sa, d_state.params, batch)
    s8, t8 = step_mesh(sb, d_state.params, shard_batch(batch, mesh))
    assert float(t1["total"]) == pytest.approx(float(t8["total"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        # rtol 5e-4: see test_data_parallel_stage1_matches_single_device
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)


def test_multistep_scan_matches_sequential(d_state):
    """make_stage2_multistep(k) == k sequential single steps."""
    from gdn_tpu.checkpoint import transfer_stage1_decoder
    from gdn_tpu.train.steps import make_stage2_multistep

    K = 3
    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(g_model, (1, 32, 64, 3), TINY.train, 10, freeze_decoder=True)
    g_state = g_state.replace(
        params=transfer_stage1_decoder(g_state.params, d_state.params)
    )
    batches = [_batch(10 + i) for i in range(K)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

    seq = jax.tree.map(jnp.copy, g_state)
    step = make_stage2_step(TINY, mesh=None)
    for b in batches:
        seq, t_seq = step(seq, d_state.params, b)

    multi = jax.tree.map(jnp.copy, g_state)
    mstep = make_stage2_multistep(TINY, K, mesh=None)
    multi, t_multi = mstep(multi, d_state.params, stacked)

    assert float(t_seq["total"]) == pytest.approx(float(t_multi["total"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(seq.params), jax.tree.leaves(multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **PROG_EQ)


def test_stage1_multistep_matches_sequential(d_state):
    """make_stage1_multistep(k) == k sequential single steps."""
    from gdn_tpu.train.steps import make_stage1_multistep

    K = 3
    batches = [_batch(40 + i) for i in range(K)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

    seq = jax.tree.map(jnp.copy, d_state)
    step = make_stage1_step(TINY, mesh=None)
    for b in batches:
        seq, t_seq = step(seq, b)

    multi = jax.tree.map(jnp.copy, d_state)
    mstep = make_stage1_multistep(TINY, K, mesh=None)
    multi, t_multi = mstep(multi, stacked)

    assert float(t_seq["total"]) == pytest.approx(float(t_multi["total"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(seq.params), jax.tree.leaves(multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **PROG_EQ)


def test_train_loop_steps_per_call_on_mesh():
    """steps_per_call>1 through train_stage1 with the 8-device mesh:
    stacked batches of mesh-sharded arrays must reshard cleanly into
    the P(None, 'data') multistep input."""
    import dataclasses
    from gdn_tpu.data.pipeline import make_train_pipeline
    from gdn_tpu.parallel.mesh import create_mesh
    from gdn_tpu.train.loop import train_stage1

    cfg = dataclasses.replace(
        TINY,
        train=dataclasses.replace(TINY.train, steps_per_epoch=4, steps_per_call=2),
    )
    mesh = create_mesh(8)
    pipe = make_train_pipeline(
        cfg, SyntheticDataset(batch_size=8, height=32, width=64),
        mesh=mesh, augment=False,
    )
    state = train_stage1(cfg, pipe, epochs=1, mesh=mesh)
    assert int(state.step) == 4
    assert all(np.all(np.isfinite(np.asarray(p)))
               for p in jax.tree.leaves(state.params))


def test_train_loop_steps_per_call():
    """train_stage1 with steps_per_call>1 advances the same step count
    and rejects non-divisible steps_per_epoch."""
    import dataclasses
    from gdn_tpu.train.loop import train_stage1

    cfg = dataclasses.replace(
        TINY,
        train=dataclasses.replace(TINY.train, steps_per_epoch=4, steps_per_call=2),
    )
    ds = SyntheticDataset(batch_size=8, height=32, width=64)
    state = train_stage1(cfg, ds, use_mesh=False, epochs=1)
    assert int(state.step) == 4

    bad = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps_per_call=3)
    )
    with pytest.raises(ValueError, match="divisible"):
        train_stage1(bad, ds, use_mesh=False, epochs=1)


def test_eval_batched_matches_per_image(d_state):
    """Batched eval (eval.batch_size>1) must produce identical metrics
    to per-image eval, including the padded final partial batch."""
    import dataclasses
    from gdn_tpu.config import EvalConfig
    from gdn_tpu.evaluate import evaluate

    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(g_model, (1, 32, 64, 3), TINY.train, 10)
    fwd = make_eval_forward(TINY, g_model)

    def eval_ds():
        rng = np.random.default_rng(0)
        for i in range(5):  # 5 images -> batch 4 + padded partial batch
            b = _batch(100 + i, b=1)
            gt = rng.uniform(1, 79, (1, 96, 192)).astype(np.float32)
            yield {"rgb": np.asarray(b["rgb"]), "gt": gt}

    cfg1 = Config(model=TINY.model, eval=EvalConfig(batch_size=1), train=TINY.train)
    cfg4 = Config(model=TINY.model, eval=EvalConfig(batch_size=4), train=TINY.train)
    r1 = evaluate(cfg1, g_state.params, fwd, eval_ds(), verbose=False)
    r4 = evaluate(cfg4, g_state.params, fwd, eval_ds(), verbose=False)
    for k in ("abs_rel", "rmse", "a1", "rmse_log"):
        assert r1[k] == pytest.approx(r4[k], rel=1e-6), k


def test_eval_median_scaling_flag(d_state):
    """`--median_scaling` must change the batched-eval numbers and match
    the per-image protocol reference `evaluate_prediction(median_scaling=
    True)` (VERDICT r1 weak #3: the flag was parsed but ignored)."""
    import dataclasses
    from gdn_tpu import metrics as M
    from gdn_tpu.config import EvalConfig
    from gdn_tpu.evaluate import evaluate, make_eval_step
    from gdn_tpu.ops.resize import resize_bilinear

    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(g_model, (1, 32, 64, 3), TINY.train, 10)
    fwd = make_eval_forward(TINY, g_model)

    rng = np.random.default_rng(3)
    samples = []
    for i in range(3):
        b = _batch(200 + i, b=1)
        gt = rng.uniform(1, 79, (1, 96, 192)).astype(np.float32)
        samples.append({"rgb": np.asarray(b["rgb"]), "gt": gt})

    cfg_on = Config(
        model=TINY.model,
        eval=EvalConfig(batch_size=2, median_scaling=True),
        train=TINY.train,
    )
    cfg_off = dataclasses.replace(
        cfg_on, eval=EvalConfig(batch_size=2, median_scaling=False)
    )
    r_on = evaluate(cfg_on, g_state.params, fwd, iter(samples), verbose=False)
    r_off = evaluate(cfg_off, g_state.params, fwd, iter(samples), verbose=False)
    assert r_on["abs_rel"] != pytest.approx(r_off["abs_rel"], rel=1e-4)

    # Per-image protocol oracle: resize -> evaluate_prediction(median).
    acc = M.MetricAccumulator()
    for s in samples:
        pred = fwd(g_state.params, jnp.asarray(s["rgb"]))[0, ..., 0]
        pred = resize_bilinear(pred, (96, 192))
        acc.update(
            M.evaluate_prediction(
                jnp.asarray(s["gt"][0]), pred,
                cap=cfg_on.eval.cap, min_depth=cfg_on.model.min_depth,
                crop=cfg_on.eval.crop, median_scaling=True,
            )
        )
    oracle = acc.result()
    for k in ("abs_rel", "rmse", "a1", "rmse_log"):
        assert r_on[k] == pytest.approx(oracle[k], rel=1e-5), k


def test_eval_gt_wire_u16_exact_for_png_sourced_gt():
    """gt_wire="u16" (round(gt*256) uint16 H2D wire) must reproduce the
    f32-wire metrics EXACTLY when the GT itself came from the KITTI
    16-bit-PNG /256 encoding — the encode/decode round-trip is the
    identity on such values."""
    import dataclasses
    from gdn_tpu.config import EvalConfig
    from gdn_tpu.evaluate import evaluate

    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(g_model, (1, 32, 64, 3), TINY.train, 10)
    fwd = make_eval_forward(TINY, g_model)

    rng = np.random.default_rng(7)
    samples = []
    for i in range(3):
        b = _batch(300 + i, b=1)
        # GT exactly as data/kitti.py produces it: uint16 counts / 256.
        counts = rng.integers(256, 79 * 256, (1, 96, 192)).astype(np.uint16)
        gt = counts.astype(np.float32) / 256.0
        samples.append({"rgb": np.asarray(b["rgb"]), "gt": gt})

    cfg_f32 = Config(
        model=TINY.model, eval=EvalConfig(batch_size=2), train=TINY.train
    )
    cfg_u16 = dataclasses.replace(
        cfg_f32, eval=EvalConfig(batch_size=2, gt_wire="u16")
    )
    r_f32 = evaluate(cfg_f32, g_state.params, fwd, iter(samples), verbose=False)
    r_u16 = evaluate(cfg_u16, g_state.params, fwd, iter(samples), verbose=False)
    for k in ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"):
        assert r_f32[k] == r_u16[k], k


def test_eval_gt_wire_u16_quantization_bounded_on_float_gt():
    """On arbitrary float GT the u16 wire quantizes to 1/256 m — the
    metric movement must stay at that scale (documented opt-in loss)."""
    import dataclasses
    from gdn_tpu.config import EvalConfig
    from gdn_tpu.evaluate import evaluate

    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(g_model, (1, 32, 64, 3), TINY.train, 10)
    fwd = make_eval_forward(TINY, g_model)

    rng = np.random.default_rng(8)
    samples = []
    for i in range(2):
        b = _batch(400 + i, b=1)
        gt = rng.uniform(1, 79, (1, 96, 192)).astype(np.float32)
        samples.append({"rgb": np.asarray(b["rgb"]), "gt": gt})

    cfg_f32 = Config(
        model=TINY.model, eval=EvalConfig(batch_size=2), train=TINY.train
    )
    cfg_u16 = dataclasses.replace(
        cfg_f32, eval=EvalConfig(batch_size=2, gt_wire="u16")
    )
    r_f32 = evaluate(cfg_f32, g_state.params, fwd, iter(samples), verbose=False)
    r_u16 = evaluate(cfg_u16, g_state.params, fwd, iter(samples), verbose=False)
    assert r_f32["rmse"] == pytest.approx(r_u16["rmse"], abs=2e-3)
    assert r_f32["abs_rel"] == pytest.approx(r_u16["abs_rel"], abs=2e-3)


def test_eval_rgb_wire_bf16_bit_identical_for_bf16_model():
    """rgb_wire="auto" ships bfloat16 RGB when the model computes in
    bfloat16; the conv stack's first op is that exact cast, so the
    metrics must be bit-identical to the fp32 wire."""
    import dataclasses
    from gdn_tpu.config import EvalConfig
    from gdn_tpu.evaluate import evaluate

    bf16_model = dataclasses.replace(TINY.model, dtype="bfloat16")
    cfg = dataclasses.replace(TINY, model=bf16_model)
    g_model = RtoDNet(cfg=bf16_model)
    g_state = create_state(g_model, (1, 32, 64, 3), cfg.train, 10)
    fwd = make_eval_forward(cfg, g_model)

    rng = np.random.default_rng(9)
    samples = []
    for i in range(3):
        b = _batch(500 + i, b=1)
        gt = rng.uniform(1, 79, (1, 96, 192)).astype(np.float32)
        samples.append({"rgb": np.asarray(b["rgb"]), "gt": gt})

    cfg_auto = Config(
        model=bf16_model, eval=EvalConfig(batch_size=2), train=cfg.train
    )
    cfg_f32 = dataclasses.replace(
        cfg_auto, eval=EvalConfig(batch_size=2, rgb_wire="f32")
    )
    r_auto = evaluate(cfg_auto, g_state.params, fwd, iter(samples), verbose=False)
    r_f32 = evaluate(cfg_f32, g_state.params, fwd, iter(samples), verbose=False)
    for k in ("abs_rel", "rmse", "a1"):
        assert r_auto[k] == r_f32[k], k


def test_async_checkpoint_roundtrip(tmp_path, d_state):
    from gdn_tpu.checkpoint import (
        restore_checkpoint, save_checkpoint, wait_for_checkpoints,
    )

    step = make_stage1_step(TINY, mesh=None)
    state, _ = step(d_state, _batch())
    save_checkpoint(str(tmp_path / "ck"), 1, state, use_async=True)
    wait_for_checkpoints(str(tmp_path / "ck"))
    fresh = create_state(DtoDNet(cfg=TINY.model), (1, 32, 64, 1), TINY.train, 10)
    restored = restore_checkpoint(str(tmp_path / "ck"), fresh)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multistep_sharded_on_mesh(d_state):
    """make_stage2_multistep with a mesh: scan axis replicated, batch
    axis sharded — compiles and matches the unsharded multistep."""
    from gdn_tpu.checkpoint import transfer_stage1_decoder
    from gdn_tpu.parallel.mesh import create_mesh
    from gdn_tpu.train.steps import make_stage2_multistep

    K = 2
    mesh = create_mesh(8)
    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(g_model, (1, 32, 64, 3), TINY.train, 10, freeze_decoder=True)
    g_state = g_state.replace(
        params=transfer_stage1_decoder(g_state.params, d_state.params)
    )
    batches = [_batch(20 + i) for i in range(K)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

    plain = make_stage2_multistep(TINY, K, mesh=None)
    sharded = make_stage2_multistep(TINY, K, mesh=mesh)
    sa = jax.tree.map(jnp.copy, g_state)
    sb = jax.tree.map(jnp.copy, g_state)
    s1, t1 = plain(sa, d_state.params, stacked)
    s8, t8 = sharded(sb, d_state.params, stacked)
    assert float(t1["total"]) == pytest.approx(float(t8["total"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **PROG_EQ)


def test_flatten_optimizer_matches_unflattened(d_state):
    """TrainConfig.flatten_optimizer: same updates as the per-leaf
    optimizer to float tolerance (one fused vector Adam)."""
    import dataclasses

    cfg_flat = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, flatten_optimizer=True)
    )
    batch = _batch(7)
    s_ref = jax.tree.map(jnp.copy, d_state)
    step_ref = make_stage1_step(TINY, mesh=None)
    s_ref, t_ref = step_ref(s_ref, batch)

    s_flat = create_state(
        DtoDNet(cfg=TINY.model), (1, 32, 64, 1), cfg_flat.train, 10
    )
    # same init params as the fixture (same seed) -> comparable update
    step_flat = make_stage1_step(cfg_flat, mesh=None)
    s_flat, t_flat = step_flat(s_flat, batch)

    assert float(t_ref["total"]) == pytest.approx(float(t_flat["total"]), rel=1e-6)
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_flat.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_flatten_optimizer_with_frozen_decoder(d_state):
    """flatten_optimizer composes with the stage-2 decoder freeze."""
    import dataclasses
    from gdn_tpu.checkpoint import transfer_stage1_decoder

    cfg = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, flatten_optimizer=True)
    )
    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(
        g_model, (1, 32, 64, 3), cfg.train, 10, freeze_decoder=True
    )
    g_state = g_state.replace(
        params=transfer_stage1_decoder(g_state.params, d_state.params)
    )
    dec_before = jax.tree.map(np.asarray, g_state.params["decoder"])
    step = make_stage2_step(cfg, mesh=None)
    g_state, terms = step(g_state, d_state.params, _batch(3))
    for a, b in zip(
        jax.tree.leaves(dec_before), jax.tree.leaves(g_state.params["decoder"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(float(terms["total"]))


def test_remat_matches_baseline(d_state):
    """TrainConfig.remat must not change the math: identical loss and
    parameter update (jax.checkpoint only changes the schedule)."""
    import dataclasses

    cfg_remat = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, remat=True)
    )
    batch = _batch(11)
    s_a = jax.tree.map(jnp.copy, d_state)
    s_b = jax.tree.map(jnp.copy, d_state)
    s_a, t_a = make_stage1_step(TINY, mesh=None)(s_a, batch)
    s_b, t_b = make_stage1_step(cfg_remat, mesh=None)(s_b, batch)
    assert float(t_a["total"]) == pytest.approx(float(t_b["total"]), rel=1e-6)
    for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_in_training_eval_hook(d_state):
    """train_stage2(eval_dataset=...) runs the full eval protocol per
    epoch and logs eval_* metrics."""
    import io
    from gdn_tpu.train.loop import train_stage2
    from gdn_tpu.utils.logging import MetricLogger

    rng = np.random.default_rng(0)

    def eval_ds():
        for i in range(3):
            b = _batch(60 + i, b=1)
            gt = rng.uniform(1, 79, (1, 64, 128)).astype(np.float32)
            yield {"rgb": np.asarray(b["rgb"]), "gt": gt}

    import dataclasses
    cfg = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, steps_per_epoch=2)
    )
    buf = io.StringIO()
    logger = MetricLogger(prefix="s2", stream=buf)
    ds = SyntheticDataset(batch_size=8, height=32, width=64)
    train_stage2(
        cfg, ds, d_state.params, use_mesh=False, epochs=1, logger=logger,
        eval_dataset=eval_ds,
    )
    out = buf.getvalue()
    assert "eval_abs_rel" in out and "eval_a1" in out and "eval_fps" in out


def test_shard_stacked_batch_placement():
    """The K>1 multistep input must be explicitly (S, B_sharded, ...)
    placed (VERDICT r2 weak item 6), not left to jit resharding."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from gdn_tpu.parallel.mesh import (
        create_mesh, shard_stacked_batch, stacked_batch_sharding,
    )

    mesh = create_mesh(8)
    stacked = {
        "depth": np.ones((2, 16, 8, 8, 1), np.float32),
        "mask": np.ones((2, 16, 8, 8, 1), np.float32),
    }
    placed = shard_stacked_batch(stacked, mesh)
    want = stacked_batch_sharding(mesh)
    for k, v in placed.items():
        assert v.sharding.is_equivalent_to(want, v.ndim), k
        assert v.sharding.spec == P(None, "data")
    # already-placed arrays pass through untouched
    again = shard_stacked_batch(placed, mesh)
    assert again["depth"] is placed["depth"]
    # non-divisible batch axis fails loudly
    with pytest.raises(AssertionError, match="not divisible"):
        shard_stacked_batch({"x": np.ones((2, 3, 4), np.float32)}, mesh)


def test_params_from_torch_import():
    """Torch .pth migration path (checkpoint.params_from_torch): a
    state_dict with torch naming (dots) and OIHW conv layout imports
    bit-exactly into the flax tree; strict mode flags missing keys."""
    import dataclasses

    from gdn_tpu.checkpoint import params_from_torch
    from gdn_tpu.models import DtoDNet

    mc = dataclasses.replace(TINY.model)
    model = DtoDNet(cfg=mc)
    h, w = mc.image_size
    ref = model.init(jax.random.PRNGKey(3), jnp.zeros((1, h, w, 1)))["params"]

    # build a torch-style state_dict from a DIFFERENT init
    src = model.init(jax.random.PRNGKey(4), jnp.zeros((1, h, w, 1)))["params"]
    sd = {}

    def flatten(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                flatten(v, f"{prefix}.{k}" if prefix else k)
        else:
            arr = np.asarray(node)
            if arr.ndim == 4:
                arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
            sd[prefix] = arr

    flatten(src, "")
    imported = params_from_torch(ref, sd)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(imported)[0],
        jax.tree_util.tree_flatten_with_path(src)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(kp))

    # forward through imported params == forward through source params
    x = jnp.ones((1, h, w, 1))
    o1 = model.apply({"params": imported}, x)["depth"]
    o2 = model.apply({"params": src}, x)["depth"]
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    # strict mode catches missing keys; partial import keeps template
    sd2 = dict(sd)
    removed = sorted(sd2)[0]
    del sd2[removed]
    with pytest.raises(KeyError, match="missing"):
        params_from_torch(ref, sd2)
    partial = params_from_torch(ref, sd2, strict=False)
    assert np.isfinite(
        np.asarray(model.apply({"params": partial}, x)["depth"])
    ).all()


def test_params_from_torch_always_permutes_square_convs():
    """Round-3 review fix: a square conv (O==I==kh==kw) has an
    ambiguous shape; 4-D torch tensors must be permuted OIHW->HWIO
    unconditionally, never passed through."""
    from gdn_tpu.checkpoint import params_from_torch

    hwio = np.arange(3 * 3 * 3 * 3, dtype=np.float32).reshape(3, 3, 3, 3)
    template = {"conv": {"kernel": jnp.asarray(hwio)}}
    oihw = np.transpose(hwio, (3, 2, 0, 1))
    out = params_from_torch(template, {"conv.kernel": oihw})
    np.testing.assert_array_equal(np.asarray(out["conv"]["kernel"]), hwio)


def test_eval_on_mesh_matches_single_device(d_state):
    """Data-parallel eval (evaluate(mesh=...)) must produce identical
    metrics to the single-device harness, including the padded final
    partial batch (SURVEY §2.7 x §2.10)."""
    from gdn_tpu.config import EvalConfig
    from gdn_tpu.evaluate import evaluate
    from gdn_tpu.parallel.mesh import create_mesh

    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(g_model, (1, 32, 64, 3), TINY.train, 10)
    fwd = make_eval_forward(TINY, g_model)

    def eval_ds():
        rng = np.random.default_rng(0)
        for i in range(11):  # batch 8 + padded partial batch of 3
            b = _batch(300 + i, b=1)
            gt = rng.uniform(1, 79, (1, 96, 192)).astype(np.float32)
            yield {"rgb": np.asarray(b["rgb"]), "gt": gt}

    cfg = Config(model=TINY.model, eval=EvalConfig(batch_size=8),
                 train=TINY.train)
    single = evaluate(cfg, g_state.params, fwd, eval_ds(), verbose=False)
    mesh = create_mesh(8)
    meshed = evaluate(cfg, g_state.params, fwd, eval_ds(), verbose=False,
                      mesh=mesh)
    for k in ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"):
        assert single[k] == pytest.approx(meshed[k], rel=1e-5), k

    # batch size must divide the mesh
    bad = Config(model=TINY.model, eval=EvalConfig(batch_size=6),
                 train=TINY.train)
    with pytest.raises(AssertionError, match="divisible"):
        evaluate(bad, g_state.params, fwd, eval_ds(), verbose=False,
                 mesh=mesh)


def test_multiscale_training_decreases_loss():
    """Both stages train with multiscale heads on: the 'scales' term is
    reported, loss decreases, and the stage-1 -> stage-2 transfer works
    with the extra head params in the decoder subtree."""
    import dataclasses

    from gdn_tpu.data.synthetic import SyntheticDataset
    from gdn_tpu.train.loop import train_stage1, train_stage2

    cfg = dataclasses.replace(
        TINY,
        model=dataclasses.replace(TINY.model, multiscale_heads=True),
        train=dataclasses.replace(TINY.train, steps_per_epoch=6,
                                  ckpt_dir=""),
    )
    ds = SyntheticDataset(batch_size=4, height=32, width=64, seed=2)
    d_state = train_stage1(cfg, ds, use_mesh=False, epochs=1)
    g_state = train_stage2(cfg, ds, d_state.params, use_mesh=False, epochs=1)
    assert int(g_state.step) == 6

    from gdn_tpu.train.steps import make_stage2_step

    step = make_stage2_step(cfg, mesh=None)
    batch = next(iter(ds))
    _, terms = step(g_state, d_state.params, batch)
    assert "scales" in terms
    assert np.isfinite(float(terms["scales"]))


def test_fused_guidance_step_matches_two_net_step(d_state):
    """TrainConfig.fused_guidance (one shared frozen-decoder pass on the
    concatenated D+G batch) must produce the same loss terms and the
    same parameter update as the two-net formulation (exact math
    identity: convs/GN are per-sample; fp32 compute here so float
    accumulation differences stay tiny)."""
    import dataclasses

    base = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, freeze_decoder=True)
    )
    fused_cfg = dataclasses.replace(
        base, train=dataclasses.replace(base.train, fused_guidance=True)
    )
    # fused_guidance_vjp defaults on (custom g-half-recompute backward,
    # train/guided_decoder.py); also run the autodiff'd 2B-wide fused
    # decoder so BOTH fused backwards are checked against the two-net
    # ground truth.
    fused_autodiff_cfg = dataclasses.replace(
        base,
        train=dataclasses.replace(
            base.train, fused_guidance=True, fused_guidance_vjp=False
        ),
    )
    g_model = RtoDNet(cfg=TINY.model)
    from gdn_tpu.checkpoint import transfer_stage1_decoder

    mk_state = lambda: create_state(
        g_model, (1, 32, 64, 3), base.train, 10, freeze_decoder=True
    ).replace(params=None)
    s0 = create_state(g_model, (1, 32, 64, 3), base.train, 10,
                      freeze_decoder=True)
    params0 = transfer_stage1_decoder(s0.params, d_state.params)

    batch = _batch(7, b=4)
    results = []
    for cfg in (base, fused_cfg, fused_autodiff_cfg):
        state = create_state(
            g_model, (1, 32, 64, 3), cfg.train, 10, freeze_decoder=True,
            params=jax.tree.map(jnp.copy, params0),
        )
        step = make_stage2_step(cfg, mesh=None)
        state, terms = step(state, d_state.params, batch)
        results.append((state, terms))
    (s_a, t_a) = results[0]
    for s_b, t_b in results[1:]:
        for k in t_a:
            assert float(t_a[k]) == pytest.approx(float(t_b[k]), rel=1e-5), k
        for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(s_a.params)[0],
            jax.tree_util.tree_flatten_with_path(s_b.params)[0],
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), err_msg=str(kp), **PROG_EQ
            )


def test_fused_guidance_requires_freeze():
    import dataclasses

    cfg = dataclasses.replace(
        TINY,
        train=dataclasses.replace(
            TINY.train, fused_guidance=True, freeze_decoder=False
        ),
    )
    with pytest.raises(AssertionError, match="freeze_decoder"):
        make_stage2_step(cfg, mesh=None)


def test_paired_encoders_match_separate_ladders(d_state):
    """fused_encoders: the channel-grouped paired ladder must reproduce
    both separate Encoder.apply results (grouped convs keep streams
    independent; GN groups stay within streams; the depth stem's 1->3
    channel zero-padding is exact)."""
    from gdn_tpu.models.encoder import Encoder
    from gdn_tpu.train.fused_encoders import paired_encoders

    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(g_model, (1, 32, 64, 3), TINY.train, 10)
    batch = _batch(9, b=4)
    depth_n = batch["depth"] / TINY.model.max_depth
    rgb_c = batch["rgb"] * 2.0 - 1.0

    enc = Encoder(cfg=TINY.model)
    d_lat, d_sk = enc.apply({"params": d_state.params["encoder"]}, depth_n)
    g_lat, g_sk = enc.apply({"params": g_state.params["encoder"]}, rgb_c)

    pd_lat, pg_lat, pd_sk, pg_sk = paired_encoders(
        depth_n, rgb_c, d_state.params["encoder"],
        g_state.params["encoder"], TINY.model,
    )
    np.testing.assert_allclose(np.asarray(pd_lat), np.asarray(d_lat),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pg_lat), np.asarray(g_lat),
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(pd_sk, d_sk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    for a, b_ in zip(pg_sk, g_sk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_fused_encoders_step_matches_two_net_step(d_state):
    """Full fused path (fused_guidance + fused_encoders) vs the plain
    two-net step: same loss terms, same update."""
    import dataclasses

    from gdn_tpu.checkpoint import transfer_stage1_decoder

    base = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, freeze_decoder=True)
    )
    full = dataclasses.replace(
        base, train=dataclasses.replace(
            base.train, fused_guidance=True, fused_encoders=True
        ),
    )
    g_model = RtoDNet(cfg=TINY.model)
    s0 = create_state(g_model, (1, 32, 64, 3), base.train, 10,
                      freeze_decoder=True)
    params0 = transfer_stage1_decoder(s0.params, d_state.params)
    batch = _batch(13, b=4)
    results = []
    for cfg in (base, full):
        state = create_state(
            g_model, (1, 32, 64, 3), cfg.train, 10, freeze_decoder=True,
            params=jax.tree.map(jnp.copy, params0),
        )
        step = make_stage2_step(cfg, mesh=None)
        state, terms = step(state, d_state.params, batch)
        results.append((state, terms))
    (s_a, t_a), (s_b, t_b) = results
    for k in t_a:
        assert float(t_a[k]) == pytest.approx(float(t_b[k]), rel=1e-5), k
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(s_a.params)[0],
        jax.tree_util.tree_flatten_with_path(s_b.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), err_msg=str(kp), **PROG_EQ
        )


def test_preemption_checkpoint_and_exact_resume(tmp_path):
    """SIGTERM mid-epoch (SURVEY §5 failure-detection row): the loop
    finishes the in-flight step, saves a checkpoint, and stops; a
    resumed run continues from that exact step."""
    import dataclasses
    import signal as _signal

    from gdn_tpu import checkpoint as ckpt_mod
    from gdn_tpu.data.synthetic import SyntheticDataset
    from gdn_tpu.models import DtoDNet
    from gdn_tpu.train.loop import train_stage1

    cfg = dataclasses.replace(
        TINY,
        train=dataclasses.replace(
            TINY.train, steps_per_epoch=50, log_every=100,
            ckpt_dir=str(tmp_path / "ck"),
        ),
    )

    def preempting_iter():
        for i, b in enumerate(iter(SyntheticDataset(
            batch_size=4, height=32, width=64, seed=3
        ))):
            if i == 3:
                _signal.raise_signal(_signal.SIGTERM)
            yield b

    state = train_stage1(cfg, preempting_iter(), use_mesh=False, epochs=1)
    stopped_at = int(state.step)
    assert 0 < stopped_at < 50  # stopped early, after the in-flight step

    template = create_state(
        DtoDNet(cfg=TINY.model), (1, 32, 64, 1), cfg.train, 50
    )
    restored = ckpt_mod.restore_checkpoint(
        f"{cfg.train.ckpt_dir}/stage1", template
    )
    assert int(restored.step) == stopped_at
    # and training continues cleanly from the restored state
    ds = SyntheticDataset(batch_size=4, height=32, width=64, seed=3)
    ds.seek(stopped_at)
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps_per_epoch=2,
                                       ckpt_dir="")
    )
    resumed = train_stage1(cfg2, ds, use_mesh=False, epochs=1,
                           state=restored)
    assert int(resumed.step) == stopped_at + 2


def test_best_checkpoint_tracking(d_state, tmp_path):
    """The in-training eval hook saves stage2_best on RMSE improvement
    (the reference family's save-best habit) and it restores."""
    import dataclasses
    import io

    from gdn_tpu import checkpoint as ckpt_mod
    from gdn_tpu.train.loop import train_stage2
    from gdn_tpu.utils.logging import MetricLogger

    rng = np.random.default_rng(0)

    def eval_ds():
        for i in range(2):
            b = _batch(70 + i, b=1)
            gt = rng.uniform(1, 79, (1, 64, 128)).astype(np.float32)
            yield {"rgb": np.asarray(b["rgb"]), "gt": gt}

    cfg = dataclasses.replace(
        TINY,
        train=dataclasses.replace(
            TINY.train, steps_per_epoch=2, ckpt_dir=str(tmp_path / "ck")
        ),
    )
    buf = io.StringIO()
    logger = MetricLogger(prefix="s2", stream=buf)
    ds = SyntheticDataset(batch_size=8, height=32, width=64)
    state = train_stage2(
        cfg, ds, d_state.params, use_mesh=False, epochs=2, logger=logger,
        eval_dataset=eval_ds,
    )
    assert "best_rmse=" in buf.getvalue()
    assert os.path.isdir(str(tmp_path / "ck" / "stage2_best"))
    template = create_state(
        RtoDNet(cfg=TINY.model), (1, 32, 64, 3), cfg.train, 2,
        freeze_decoder=True,
    )
    restored = ckpt_mod.restore_checkpoint(
        str(tmp_path / "ck" / "stage2_best"), template
    )
    assert 0 < int(restored.step) <= int(state.step)


def test_freeze_decoder_stop_grad_preserves_updates(d_state):
    """The stop_gradient on the frozen decoder subtree
    (train/steps._freeze_decoder_params) is a pure backward-cost
    optimization: updated params must be bit-identical to computing the
    decoder grads and letting the optax multi_transform discard them
    (cfg.train.freeze_decoder=False skips the stop-grad; the state's
    optimizer mask is what actually freezes)."""
    import dataclasses

    from gdn_tpu.checkpoint import transfer_stage1_decoder

    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(
        g_model, (1, 32, 64, 3), TINY.train, 10, freeze_decoder=True
    )
    g_state = g_state.replace(
        params=transfer_stage1_decoder(g_state.params, d_state.params)
    )
    batch = _batch(7)

    cfg_stop = TINY  # freeze_decoder=True -> stop-grad path
    cfg_full = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, freeze_decoder=False)
    )
    sa = jax.tree.map(jnp.copy, g_state)
    sb = jax.tree.map(jnp.copy, g_state)
    s_stop, t_stop = make_stage2_step(cfg_stop, mesh=None)(
        sa, d_state.params, batch
    )
    s_full, t_full = make_stage2_step(cfg_full, mesh=None)(
        sb, d_state.params, batch
    )
    assert float(t_stop["total"]) == float(t_full["total"])
    for a, b in zip(jax.tree.leaves(s_stop.params), jax.tree.leaves(s_full.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flip_tta_forward():
    """flip_tta must equal mean(f(x), unflip(f(flip(x)))) and be exact
    on a horizontally symmetric input."""
    import jax.numpy as jnp

    from gdn_tpu.models import RtoDNet

    g_model = RtoDNet(cfg=TINY.model)
    h, w = TINY.model.image_size
    params = create_state(g_model, (1, h, w, 3), TINY.train, 1).params
    plain = make_eval_forward(TINY, g_model)
    tta = make_eval_forward(TINY, g_model, flip_tta=True)

    rgb = jax.random.uniform(jax.random.PRNGKey(3), (2, h, w, 3))
    expect = 0.5 * (
        plain(params, rgb) + plain(params, rgb[:, :, ::-1, :])[:, :, ::-1, :]
    )
    np.testing.assert_allclose(
        np.asarray(tta(params, rgb)), np.asarray(expect),
        rtol=1e-5, atol=1e-6,
    )
    # symmetric input -> tta output is itself symmetric
    sym = jnp.concatenate([rgb[:, :, : w // 2], rgb[:, :, : w // 2][:, :, ::-1]], axis=2)
    out = np.asarray(tta(params, sym))
    np.testing.assert_allclose(out, out[:, :, ::-1, :], rtol=1e-5, atol=1e-6)


def test_lr_schedule_grad_accum_units():
    """decay_epochs/warmup_steps are micro-step-denominated; under
    grad_accum the schedule counter advances once per APPLIED update,
    so transition points must be divided by the accumulation factor
    (review: decay fired grad_accum x too late)."""
    from gdn_tpu.config import TrainConfig
    from gdn_tpu.train.state import lr_schedule

    base = dict(lr=1e-3, decay_epochs=2, decay_gamma=0.5)
    plain = lr_schedule(TrainConfig(**base, grad_accum=1), 10)
    accum = lr_schedule(TrainConfig(**base, grad_accum=4), 10)
    # decay boundary: 20 micro-steps = 20 plain updates = 5 accum updates
    assert float(plain(19)) == pytest.approx(1e-3)
    assert float(plain(20)) == pytest.approx(5e-4)
    assert float(accum(4)) == pytest.approx(1e-3)
    assert float(accum(5)) == pytest.approx(5e-4)
    # warmup: 8 micro-steps -> 2 applied updates
    w = lr_schedule(TrainConfig(**base, grad_accum=4, warmup_steps=8), 10)
    assert float(w(0)) == pytest.approx(0.0)
    assert float(w(2)) == pytest.approx(1e-3)


def test_save_preds_dataset_order_mixed_resolutions(tmp_path):
    """--save_preds file indices must follow DATASET order even when
    per-GT-shape batching interleaves mixed-resolution splits (review:
    completion-order naming paired preds with the wrong GT)."""
    from gdn_tpu.evaluate import evaluate

    g_model = RtoDNet(cfg=TINY.model)
    g_state = create_state(g_model, (1, 32, 64, 3), TINY.train, 10)
    fwd = make_eval_forward(TINY, g_model)

    shapes = [(96, 192), (80, 160), (96, 192), (80, 160), (96, 192)]

    def eval_ds():
        rng = np.random.default_rng(0)
        for i, sh in enumerate(shapes):
            b = _batch(5 + i, b=1)
            gt = rng.uniform(1, 79, (1, *sh)).astype(np.float32)
            yield {"rgb": np.asarray(b["rgb"]), "gt": gt}

    import dataclasses

    cfg = Config(
        model=TINY.model,
        eval=dataclasses.replace(TINY.eval, batch_size=2),
        train=TINY.train,
    )
    preds_dir = str(tmp_path / "preds")
    evaluate(cfg, g_state.params, fwd, eval_ds(), verbose=False,
             save_preds=preds_dir)
    import os

    files = sorted(os.listdir(preds_dir))
    assert files == [f"pred_{i:06d}.npy" for i in range(5)]
    # pred_i must equal the direct forward of dataset sample i
    rng = np.random.default_rng(0)
    for i, sh in enumerate(shapes):
        b = _batch(5 + i, b=1)
        rng.uniform(1, 79, (1, *sh))  # keep the gt stream aligned
        expect = np.asarray(fwd(g_state.params, b["rgb"]))[0, ..., 0]
        got = np.load(os.path.join(preds_dir, f"pred_{i:06d}.npy"))
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_train_loop_async_ckpt_and_config(tmp_path):
    """The epoch-save path uses async checkpointing by default
    (TrainConfig.async_ckpt) with a durability barrier on loop exit,
    and persists the run Config next to the weights (self-describing
    checkpoints) — VERDICT r3 items 1 and 5."""
    import dataclasses

    from gdn_tpu import checkpoint as ckpt_mod
    from gdn_tpu.train.loop import train_stage1

    cfg = dataclasses.replace(
        TINY,
        train=dataclasses.replace(
            TINY.train, steps_per_epoch=2, log_every=10,
            ckpt_dir=str(tmp_path / "ck"),
        ),
    )
    assert cfg.train.async_ckpt  # the default IS the async path
    ds = SyntheticDataset(batch_size=8, height=32, width=64)
    state = train_stage1(cfg, ds, use_mesh=False, epochs=1)

    # barrier ran on exit: the checkpoint is durable right now
    template = _fresh_d_state()
    restored = ckpt_mod.restore_checkpoint(
        f"{cfg.train.ckpt_dir}/stage1", template
    )
    assert int(restored.step) == int(state.step) == 2
    # and the config rode along
    saved = ckpt_mod.load_config(f"{cfg.train.ckpt_dir}/stage1")
    assert saved == cfg


def test_spatial_accum_ema_matches_single_device():
    """SP composition (VERDICT r3 weak item 3): grad_accum=2 + EMA on
    the 2-D (data=2, spatial=4) mesh over a full accumulation cycle
    agrees with the single-device path, including ema_params."""
    import dataclasses

    from gdn_tpu.parallel.mesh import create_mesh, shard_batch

    cfg = dataclasses.replace(TINY, train=dataclasses.replace(
        TINY.train, grad_accum=2, ema_decay=0.9))
    state = create_state(DtoDNet(cfg=cfg.model), (1, 32, 64, 1),
                         cfg.train, 10)
    mesh = create_mesh(8, spatial=4)
    step_single = make_stage1_step(cfg, mesh=None)
    step_mesh = make_stage1_step(cfg, mesh=mesh)
    s_a = jax.tree.map(jnp.copy, state)
    s_b = jax.tree.map(jnp.copy, state)
    for seed in (0, 1):  # one full accumulation cycle
        batch = _batch(seed, b=8)
        s_a, _ = step_single(s_a, batch)
        s_b, _ = step_mesh(s_b, shard_batch(batch, mesh))
    for tree in ("params", "ema_params"):
        for a, b in zip(jax.tree.leaves(getattr(s_a, tree)),
                        jax.tree.leaves(getattr(s_b, tree))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-6)


def test_spatial_multistep_matches_sequential(d_state):
    """SP x multistep: the K-step scan on the (data=2, spatial=4) mesh
    (stacked batches sharded on data + height on spatial) matches the
    sequential single-device steps."""
    from gdn_tpu.checkpoint import transfer_stage1_decoder
    from gdn_tpu.parallel.mesh import create_mesh, shard_stacked_batch
    from gdn_tpu.train.steps import make_stage2_multistep

    K = 2
    mesh = create_mesh(8, spatial=4)
    g_state = create_state(RtoDNet(cfg=TINY.model), (1, 32, 64, 3),
                           TINY.train, 10, freeze_decoder=True)
    g_state = g_state.replace(
        params=transfer_stage1_decoder(g_state.params, d_state.params))
    batches = [_batch(30 + i) for i in range(K)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

    seq = make_stage2_step(TINY, mesh=None)
    sp = make_stage2_multistep(TINY, K, mesh=mesh)
    s_a = jax.tree.map(jnp.copy, g_state)
    s_b = jax.tree.map(jnp.copy, g_state)
    for b in batches:
        s_a, t_a = seq(s_a, d_state.params, b)
    s_b, t_b = sp(s_b, d_state.params, shard_stacked_batch(stacked, mesh))
    assert float(t_a["total"]) == pytest.approx(float(t_b["total"]),
                                                rel=1e-4)
    for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_spatial_tall_image_and_memory_split(d_state):
    """SP's stated purpose is resolutions that exceed one chip: at a
    taller 256x64 image, (a) the spatial=8 step matches the
    single-device math, and (b) XLA's compiled per-device temp memory
    (activations + workspace) actually SPLITS — measured well under
    half the single-device program's (observed ~0.29x; halos and
    replicated params keep it above 1/8)."""
    import dataclasses

    from gdn_tpu.parallel.mesh import create_mesh, shard_batch

    H, W, B = 256, 64, 8
    # resize_conv_composed off on BOTH paths: _spatial_safe_cfg forces
    # it off under SP (SPMD kernel-grad miscompile, steps.py), and
    # Adam's first-step sign normalization amplifies the composed-vs-
    # unfused float-rounding delta (~5e-7) to full ±lr updates on
    # near-zero gradient elements — compare like with like.
    cfg = dataclasses.replace(TINY, model=dataclasses.replace(
        TINY.model, image_size=(H, W), resize_conv_composed=False))
    batch = synthetic_batch(jax.random.PRNGKey(5), B, H, W, 80.0)
    # Break exact ties in the L1 gradient-loss diffs: synthetic depth is
    # piecewise-constant (98.5% of GT dx are exactly 0), and |.|'s
    # backward is sign(), so fwd reassociation noise between the two
    # programs (~1e-7) would flip ~12% of the sign terms — a property
    # of the tied DATA, not of the sharded math.  Continuous noise
    # makes ties measure-zero.
    batch["depth"] = batch["depth"] + 0.01 * jax.random.uniform(
        jax.random.PRNGKey(6), batch["depth"].shape)
    state = create_state(DtoDNet(cfg=cfg.model), (1, H, W, 1),
                         cfg.train, 10)

    step1 = make_stage1_step(cfg, mesh=None)
    mesh = create_mesh(8, spatial=8)
    step8 = make_stage1_step(cfg, mesh=mesh)
    sb = shard_batch(batch, mesh)

    t1 = step1.lower(jax.tree.map(jnp.copy, state), batch).compile()
    t8 = step8.lower(jax.tree.map(jnp.copy, state), sb).compile()
    m1 = t1.memory_analysis().temp_size_in_bytes
    m8 = t8.memory_analysis().temp_size_in_bytes
    assert m8 < 0.5 * m1, (m8, m1)

    s_a, ta = step1(jax.tree.map(jnp.copy, state), batch)
    s_b, tb = step8(jax.tree.map(jnp.copy, state), sb)
    assert float(ta["total"]) == pytest.approx(float(tb["total"]), rel=1e-5)

    # Compare GRADIENTS, not post-Adam params: Adam's first-step update
    # is ±lr·sign(g), so psum-reordering noise on near-zero gradient
    # elements would amplify to full 2·lr param diffs (observed 1% of
    # elements at 256x64/spatial=8) — a property of the comparison, not
    # of the sharded math.
    from gdn_tpu.parallel.mesh import batch_sharding, replicated
    from gdn_tpu.train.steps import _spatial_safe_cfg, _stage1_loss

    scfg = _spatial_safe_cfg(cfg, mesh)
    apply_fn = DtoDNet(cfg=scfg.model).apply

    def grads_of(params, b):
        g = jax.grad(_stage1_loss, has_aux=True)(params, apply_fn, b, scfg)
        return g[0]

    g1 = jax.jit(grads_of)(state.params, batch)
    g8 = jax.jit(
        grads_of,
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=replicated(mesh),
    )(jax.device_put(state.params, replicated(mesh)), sb)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 5e-4


# ---------------------------------------------------------------------------
# Tensor parallelism (mesh "model" axis) and FSDP (params over "data")
# ---------------------------------------------------------------------------


def test_param_sharding_specs_and_exclusivity():
    """The TP rule shards trailing (output-channel) dims, the FSDP rule
    the largest divisible dim; replicated fallbacks for indivisible
    leaves; TP+FSDP together is rejected."""
    from jax.sharding import PartitionSpec as P
    from gdn_tpu.config import MeshConfig
    from gdn_tpu.parallel.mesh import fsdp_spec, param_mode, tensor_parallel_spec

    assert tensor_parallel_spec((3, 3, 8, 16), 4) == P(None, None, None, "model")
    assert tensor_parallel_spec((16,), 4) == P("model")
    assert tensor_parallel_spec((3, 3, 8, 1), 4) == P()  # depth head
    assert tensor_parallel_spec((), 4) == P()  # step counter
    assert fsdp_spec((3, 3, 8, 16), 8) == P(None, None, None, "data")
    assert fsdp_spec((16,), 8) == P("data")
    assert fsdp_spec((3, 3, 4, 1), 8) == P()
    assert param_mode(MeshConfig()) == "replicated"
    assert param_mode(MeshConfig(model_devices=4)) == "tp"
    assert param_mode(MeshConfig(fsdp=True)) == "fsdp"
    with pytest.raises(ValueError, match="mutually exclusive"):
        param_mode(MeshConfig(model_devices=2, fsdp=True))


def test_tensor_parallel_state_placement(d_state):
    """shard_state under TP actually SPLITS parameter (and Adam moment)
    memory: channel dims divide by the model-axis extent on-device."""
    from gdn_tpu.parallel.mesh import create_mesh, shard_state

    mesh = create_mesh(8, model=4)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    placed, shardings = shard_state(d_state, mesh, "tp")
    k = placed.params["encoder"]["down0"]["ConvBlock_0"]["Conv_0"]["kernel"]
    assert k.shape[-1] % 4 == 0
    assert k.sharding.shard_shape(k.shape)[-1] == k.shape[-1] // 4
    # Adam moments follow the same rule (optimizer memory splits too)
    leaves = jax.tree.leaves(placed.opt_state)
    sharded = [
        x for x in leaves
        if hasattr(x, "sharding")
        and x.ndim > 0
        and x.sharding.shard_shape(x.shape) != x.shape
    ]
    assert sharded, "no optimizer-state leaf was sharded"


def test_tensor_parallel_stage1_matches_single_device(d_state):
    """Channel-sharded (TP) train step == single-device step: XLA SPMD's
    activation collectives must not change the math (MeshConfig.
    model_devices; parallel/mesh.py tensor_parallel_spec)."""
    from gdn_tpu.parallel.mesh import create_mesh, shard_batch, shard_state

    mesh = create_mesh(8, model=4)  # (data=2, model=4)
    batch = _batch(2)
    step_single = make_stage1_step(TINY, mesh=None)

    state_a = jax.tree.map(jnp.copy, d_state)
    state_b = jax.tree.map(jnp.copy, d_state)
    state_b, ss = shard_state(state_b, mesh, "tp")
    step_mesh = make_stage1_step(TINY, mesh=mesh, state_sharding=ss)
    s1, t1 = step_single(state_a, batch)
    s8, t8 = step_mesh(state_b, shard_batch(batch, mesh))
    assert float(t1["total"]) == pytest.approx(float(t8["total"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        # same tolerance rationale as the data-parallel test above
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)


def test_tensor_parallel_stage2_matches_single_device(d_state):
    """Stage-2 guided step under (data=2, model=4): both nets' params
    and the frozen guidance tree channel-sharded; the frozen-decoder
    optimizer mask and the composed resize_conv default ride through
    the SPMD partitioning unchanged."""
    from gdn_tpu.checkpoint import transfer_stage1_decoder
    from gdn_tpu.parallel.mesh import create_mesh, shard_batch, shard_state

    mesh = create_mesh(8, model=4)
    g_state = create_state(
        RtoDNet(cfg=TINY.model), (1, 32, 64, 3), TINY.train, 10,
        freeze_decoder=True,
    )
    g_state = g_state.replace(
        params=transfer_stage1_decoder(g_state.params, d_state.params)
    )
    batch = _batch(3)
    step_single = make_stage2_step(TINY, mesh=None)

    state_a = jax.tree.map(jnp.copy, g_state)
    state_b = jax.tree.map(jnp.copy, g_state)
    state_b, ss = shard_state(state_b, mesh, "tp")
    d_sharded, ds = shard_state(d_state.params, mesh, "tp")
    step_mesh = make_stage2_step(
        TINY, mesh=mesh, state_sharding=ss, d_sharding=ds
    )
    s1, t1 = step_single(state_a, d_state.params, batch)
    s8, t8 = step_mesh(state_b, d_sharded, shard_batch(batch, mesh))
    assert float(t1["total"]) == pytest.approx(float(t8["total"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)


def test_fsdp_stage1_matches_single_device(d_state):
    """FSDP placement (params + Adam state sharded over "data",
    ZeRO-3): weights all-gather at use, gradients reduce-scatter —
    same math as the replicated step."""
    from gdn_tpu.parallel.mesh import create_mesh, shard_batch, shard_state

    mesh = create_mesh(8)
    batch = _batch(2)
    step_single = make_stage1_step(TINY, mesh=None)

    state_a = jax.tree.map(jnp.copy, d_state)
    state_b = jax.tree.map(jnp.copy, d_state)
    state_b, ss = shard_state(state_b, mesh, "fsdp")
    step_mesh = make_stage1_step(TINY, mesh=mesh, state_sharding=ss)
    s1, t1 = step_single(state_a, batch)
    s8, t8 = step_mesh(state_b, shard_batch(batch, mesh))
    assert float(t1["total"]) == pytest.approx(float(t8["total"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)


def test_fsdp_stage2_ema_composition_matches_single_device(d_state):
    """FSDP composed with EMA on the stage-2 guided step: params AND
    the sharded EMA mirror match the single-device run after 2 steps
    (the EMA tree follows the same shape-keyed sharding rule)."""
    import dataclasses

    from gdn_tpu.checkpoint import transfer_stage1_decoder
    from gdn_tpu.parallel.mesh import create_mesh, shard_batch, shard_state

    cfg = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, ema_decay=0.9)
    )
    mesh = create_mesh(8)
    g_state = create_state(
        RtoDNet(cfg=cfg.model), (1, 32, 64, 3), cfg.train, 10,
        freeze_decoder=True,
    )
    g_state = g_state.replace(
        params=transfer_stage1_decoder(g_state.params, d_state.params)
    )
    step_single = make_stage2_step(cfg, mesh=None)

    state_a = jax.tree.map(jnp.copy, g_state)
    state_b = jax.tree.map(jnp.copy, g_state)
    state_b, ss = shard_state(state_b, mesh, "fsdp")
    d_sharded, ds = shard_state(d_state.params, mesh, "fsdp")
    step_mesh = make_stage2_step(
        cfg, mesh=mesh, state_sharding=ss, d_sharding=ds
    )
    for seed in (3, 4):
        batch = _batch(seed)
        state_a, t1 = step_single(state_a, d_state.params, batch)
        state_b, t8 = step_mesh(state_b, d_sharded, shard_batch(batch, mesh))
    for a, b in zip(
        jax.tree.leaves((state_a.params, state_a.ema_params)),
        jax.tree.leaves((state_b.params, state_b.ema_params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)


def test_tp_train_loop_end_to_end():
    """train_stage1 with MeshConfig.model_devices=4 wires the TP
    placement itself (loop._place_state) and trains to a finite loss."""
    import dataclasses

    from gdn_tpu.train.loop import train_stage1

    cfg = dataclasses.replace(
        TINY,
        train=dataclasses.replace(TINY.train, epochs=1, steps_per_epoch=3),
        mesh=dataclasses.replace(TINY.mesh, model_devices=4),
    )
    ds = SyntheticDataset(batch_size=8, height=32, width=64)
    state = train_stage1(cfg, ds, epochs=1)
    assert int(state.step) == 3
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(state.params))
