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
