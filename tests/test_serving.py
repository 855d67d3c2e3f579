"""Serving/export + demo module tests."""

import numpy as np
import jax
import pytest
from PIL import Image

from gdn_tpu.config import Config, DataConfig, ModelConfig, TrainConfig

TINY = Config(
    model=ModelConfig(
        image_size=(32, 64), enc_channels=(8, 16), dec_channels=(16, 8),
        dtype="float32",
    ),
    train=TrainConfig(ckpt_dir=""),
)


@pytest.fixture(scope="module")
def g_params():
    from gdn_tpu.models import RtoDNet
    from gdn_tpu.train import create_state

    return create_state(
        RtoDNet(cfg=TINY.model), (1, 32, 64, 3), TINY.train, 1
    ).params


def test_export_roundtrip(tmp_path, g_params):
    from gdn_tpu.serving import export_model, load_model

    path = str(tmp_path / "model.stablehlo")
    export_model(TINY, g_params, path, batch_size=2)
    fn = load_model(path)
    rgb = np.random.default_rng(0).uniform(0, 1, (2, 32, 64, 3)).astype(np.float32)
    out = np.asarray(fn(rgb))
    assert out.shape == (2, 32, 64, 1)
    # must match the live model exactly (same params, same math)
    from gdn_tpu.models import RtoDNet

    live = RtoDNet(cfg=TINY.model).apply({"params": g_params}, rgb)["depth"]
    # separate compilations reassociate fp32 reductions; tolerance is
    # relative to the 80 m output scale
    np.testing.assert_allclose(out, np.asarray(live), rtol=1e-4, atol=1e-3)


def test_batched_predictor_partial_batch(g_params):
    from gdn_tpu.serving import BatchedPredictor

    pred = BatchedPredictor(TINY, g_params, batch_size=4)
    rgbs = np.random.default_rng(1).uniform(0, 1, (6, 32, 64, 3)).astype(np.float32)
    out = pred.predict(rgbs)
    assert out.shape == (6, 32, 64)
    # padding must not affect the results of real samples
    out2 = pred.predict(rgbs[:4])
    np.testing.assert_allclose(out[:4], out2, atol=1e-6)


def test_predictor_uint8_input_matches_host_conversion(g_params):
    """uint8 wire input (device-side /255 decode) must match host-side
    float conversion to float rounding (XLA rewrites the constant
    division as a reciprocal multiply: ~1e-6 relative, measured) at
    1/4 the H2D bytes."""
    from gdn_tpu.serving import BatchedPredictor

    pred = BatchedPredictor(TINY, g_params, batch_size=4)
    u8 = np.random.default_rng(2).integers(0, 256, (4, 32, 64, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    np.testing.assert_allclose(
        pred.predict(u8), pred.predict(f32), rtol=1e-5, atol=1e-4
    )


def test_predictor_u16_wire_matches_png16_encoding(g_params):
    """wire="u16" must return exactly the KITTI png16 payload values
    (round(depth*256) clipped uint16) the host would compute from the
    fp32 fetch."""
    from gdn_tpu.serving import BatchedPredictor

    pred = BatchedPredictor(TINY, g_params, batch_size=4)
    rgbs = np.random.default_rng(3).uniform(0, 1, (4, 32, 64, 3)).astype(np.float32)
    d32 = pred.predict(rgbs)
    d16 = pred.predict(rgbs, wire="u16")
    assert d16.dtype == np.uint16
    expect = np.clip(np.round(d32.astype(np.float64) * 256.0), 0, 65535)
    # round() runs on device in fp32 there vs fp64 here: allow 1 count
    # of rounding skew at the .5 boundaries, none elsewhere
    assert np.abs(d16.astype(np.int64) - expect.astype(np.int64)).max() <= 1


def test_artifact_predictor_wire_options(tmp_path, g_params):
    """The StableHLO-artifact path composes the same uint8-in / u16-out
    wire (exported.call wrapped under jit)."""
    from gdn_tpu.serving import BatchedPredictor, export_model

    path = str(tmp_path / "model.stablehlo")
    export_model(TINY, g_params, path, batch_size=2)
    pred = BatchedPredictor.from_artifact(path)
    u8 = np.random.default_rng(4).integers(0, 256, (2, 32, 64, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    np.testing.assert_allclose(
        pred.predict(u8), pred.predict(f32), rtol=1e-5, atol=1e-4
    )
    d16 = pred.predict(u8, wire="u16")
    assert d16.dtype == np.uint16 and d16.shape == (2, 32, 64)


def test_run_demo_writes_outputs(tmp_path, g_params):
    from gdn_tpu.demo import run_demo

    rng = np.random.default_rng(2)
    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(3):
        Image.fromarray(
            rng.uniform(0, 255, (48, 96, 3)).astype(np.uint8)
        ).save(frames / f"f{i}.png")
    written = run_demo(
        TINY, g_params, str(frames), str(tmp_path / "out"), gif="anim.gif"
    )
    pngs = [w for w in written if w.endswith(".png")]
    gifs = [w for w in written if w.endswith(".gif")]
    assert len(pngs) == 3 and len(gifs) == 1
    img = Image.open(pngs[0])
    assert img.size == (96, 96)  # side-by-side stack: 48 + 48 tall
    gif = Image.open(gifs[0])
    assert getattr(gif, "n_frames", 1) == 3


def test_run_demo_video_input(tmp_path, g_params):
    import imageio.v3 as iio
    from gdn_tpu.demo import run_demo

    rng = np.random.default_rng(4)
    frames = rng.integers(0, 255, (4, 48, 96, 3), dtype=np.uint8)
    video = str(tmp_path / "clip.mp4")
    try:
        iio.imwrite(video, frames, fps=5)
    except Exception as e:
        pytest.skip(f"no mp4 encoder available: {e}")
    written = run_demo(TINY, g_params, video, str(tmp_path / "out"), gif="v.gif")
    pngs = [w for w in written if w.endswith(".png")]
    assert len(pngs) == 4
