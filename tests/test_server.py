"""HTTP inference server tests (gdn_tpu/server.py, scripts/serve.py).

In-process: DepthServer on an ephemeral port with a tiny random-init
model; concurrent POSTs must coalesce into shared device batches.
Subprocess: scripts/serve.py end-to-end (the CLI glue), mirroring the
test_cli_integration.py style.
"""

import io
import json
import os
import signal
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from gdn_tpu.config import Config, ModelConfig, TrainConfig

TINY = Config(
    model=ModelConfig(
        image_size=(32, 64), enc_channels=(8, 16), dec_channels=(16, 8),
        dtype="float32",
    ),
    train=TrainConfig(ckpt_dir=""),
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _png_bytes(h, w, seed=0):
    rgb = np.random.default_rng(seed).integers(
        0, 255, (h, w, 3), dtype=np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    return buf.getvalue()


def _post(url, body, timeout=60):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _get_json(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def server():
    from gdn_tpu.models import RtoDNet
    from gdn_tpu.server import DepthServer
    from gdn_tpu.train import create_state

    params = create_state(
        RtoDNet(cfg=TINY.model), (1, 32, 64, 3), TINY.train, 1
    ).params
    srv = DepthServer(TINY, params, port=0, batch_size=4, max_wait_ms=50.0)
    srv.start()
    yield srv
    srv.stop()


def test_healthz_and_formats(server):
    base = f"http://127.0.0.1:{server.port}"
    health = _get_json(f"{base}/healthz")
    assert health["status"] == "ok"
    assert health["image_size"] == [32, 64]

    body = _png_bytes(32, 64)
    # npy: float32 meters at the request resolution
    st, ct, raw = _post(f"{base}/predict", body)
    assert st == 200 and ct == "application/octet-stream"
    depth = np.load(io.BytesIO(raw))
    assert depth.shape == (32, 64) and depth.dtype == np.float32
    assert np.isfinite(depth).all()
    assert (depth >= 0).all() and (depth <= TINY.model.max_depth).all()

    # png16: the KITTI uint16 mm encoding, round-trippable to ~1/256 m
    st, ct, raw = _post(f"{base}/predict?format=png16", body)
    assert st == 200 and ct == "image/png"
    d16 = np.asarray(Image.open(io.BytesIO(raw)))
    assert d16.dtype in (np.uint16, np.int32)
    np.testing.assert_allclose(
        d16.astype(np.float32) / 256.0, depth, atol=1 / 128.0
    )

    # color: an RGB PNG
    st, ct, raw = _post(f"{base}/predict?format=color", body)
    assert st == 200
    img = Image.open(io.BytesIO(raw))
    assert img.mode == "RGB" and img.size == (64, 32)


def test_resizes_arbitrary_input(server):
    base = f"http://127.0.0.1:{server.port}"
    st, _, raw = _post(f"{base}/predict", _png_bytes(50, 70, seed=3))
    assert st == 200
    assert np.load(io.BytesIO(raw)).shape == (50, 70)


def test_bad_requests(server):
    base = f"http://127.0.0.1:{server.port}"
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/predict", b"not an image")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/predict?format=bogus", _png_bytes(32, 64))
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get_json(f"{base}/nope")
    assert e.value.code == 404


def test_concurrent_requests_coalesce(server):
    """8 concurrent posts on a batch_size=4 / 50 ms window server must
    run in fewer device batches than requests."""
    base = f"http://127.0.0.1:{server.port}"
    before = _get_json(f"{base}/stats")

    results = [None] * 8
    def worker(i):
        st, _, raw = _post(f"{base}/predict", _png_bytes(32, 64, seed=i))
        results[i] = (st, np.load(io.BytesIO(raw)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert all(r is not None and r[0] == 200 for r in results)

    after = _get_json(f"{base}/stats")
    new_reqs = after["requests"] - before["requests"]
    new_batches = after["batches"] - before["batches"]
    assert new_reqs == 8
    assert new_batches < new_reqs  # coalescing actually happened
    assert after["mean_batch_occupancy"] > 1.0

    # different inputs -> different depths (no result crosstalk)
    d0, d1 = results[0][1], results[1][1]
    assert not np.allclose(d0, d1)


def test_identical_input_matches_direct_forward(server):
    """The batched server path must agree with the predictor itself
    (no resize or encode distortion at the native resolution)."""
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    base = f"http://127.0.0.1:{server.port}"
    _, _, raw = _post(f"{base}/predict", buf.getvalue())
    served = np.load(io.BytesIO(raw))

    x = rgb.astype(np.float32) / 255.0
    direct = server.batcher._predictor.predict(x[None])[0]
    np.testing.assert_allclose(served, direct, rtol=1e-5, atol=1e-5)


def test_serve_cli_subprocess(tmp_path):
    """scripts/serve.py end-to-end: boots, serves, handles SIGTERM."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--dataset", "synthetic", "--height", "32", "--width", "64",
         "--platform", "cpu", "--init_random", "--port", "0",
         "--serve_batch", "2", "--max_wait_ms", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(tmp_path),
    )
    try:
        # parse the announced ephemeral port
        line = ""
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "serving on" in line:
                break
            assert proc.poll() is None, f"server died: {line}"
        assert "serving on" in line, line
        port = int(line.split("http://127.0.0.1:")[1].split(" ")[0])

        health = _get_json(f"http://127.0.0.1:{port}/healthz", timeout=60)
        assert health["status"] == "ok"
        st, _, raw = _post(
            f"http://127.0.0.1:{port}/predict", _png_bytes(32, 64)
        )
        assert st == 200
        assert np.load(io.BytesIO(raw)).shape == (32, 64)
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_server_u16_wire_formats(server):
    """A wire="u16" server must produce the same responses as the f32
    server for every format (png16 is byte-identical by construction;
    npy/color within the 1/256 m wire quantization)."""
    from gdn_tpu.models import RtoDNet
    from gdn_tpu.server import DepthServer
    from gdn_tpu.train import create_state

    params = create_state(
        RtoDNet(cfg=TINY.model), (1, 32, 64, 3), TINY.train, 1
    ).params
    srv = DepthServer(TINY, params, port=0, batch_size=4,
                      max_wait_ms=5.0, wire="u16")
    srv.start()
    try:
        base16 = f"http://127.0.0.1:{srv.port}"
        base32 = f"http://127.0.0.1:{server.port}"
        assert _get_json(f"{base16}/healthz")["wire"] == "u16"
        body = _png_bytes(32, 64, seed=11)

        st, ct, raw32 = _post(f"{base32}/predict?format=png16", body)
        st2, ct2, raw16 = _post(f"{base16}/predict?format=png16", body)
        assert (st, ct) == (st2, ct2) == (200, "image/png")
        a = np.asarray(Image.open(io.BytesIO(raw32))).astype(np.int64)
        b = np.asarray(Image.open(io.BytesIO(raw16))).astype(np.int64)
        # device-side vs host-side round(d*256): at most .5-boundary skew
        assert np.abs(a - b).max() <= 1

        st, _, raw = _post(f"{base16}/predict", body)  # npy from u16 wire
        assert st == 200
        d = np.load(io.BytesIO(raw))
        assert d.dtype == np.float32
        st, _, ref = _post(f"{base32}/predict", body)
        np.testing.assert_allclose(
            d, np.load(io.BytesIO(ref)), atol=1 / 256.0
        )

        st, ct, raw = _post(f"{base16}/predict?format=color", body)
        assert st == 200 and Image.open(io.BytesIO(raw)).mode == "RGB"

        # resize-back path dequantizes before the host resize
        st, _, raw = _post(f"{base16}/predict", _png_bytes(40, 70, seed=12))
        assert st == 200
        assert np.load(io.BytesIO(raw)).shape == (40, 70)
    finally:
        srv.stop()


def test_batcher_stop_fails_fast():
    """predict() after stop() must raise immediately, not hang out the
    request timeout; stats must count errors."""
    from gdn_tpu.models import RtoDNet
    from gdn_tpu.server import DynamicBatcher
    from gdn_tpu.train import create_state

    params = create_state(
        RtoDNet(cfg=TINY.model), (1, 32, 64, 3), TINY.train, 1
    ).params
    b = DynamicBatcher(TINY, params, batch_size=2, max_wait_ms=1.0)
    x = np.zeros((32, 64, 3), np.float32)
    b.predict(x)  # one good request
    b.stop()
    t0 = time.time()
    with pytest.raises(RuntimeError):
        b.predict(x)
    assert time.time() - t0 < 1.0
    assert b.stats["requests"] == 1 and b.stats["errors"] == 0


def test_serve_from_exported_artifact(tmp_path, server):
    """The StableHLO-artifact serving path must agree with the
    checkpoint server bit-for-bit modulo export reassociation."""
    from gdn_tpu.serving import BatchedPredictor, export_model
    from gdn_tpu.server import DepthServer

    # rebuild the SAME params the module fixture server holds (seeded
    # create_state is deterministic)
    from gdn_tpu.models import RtoDNet
    from gdn_tpu.train import create_state

    params = create_state(
        RtoDNet(cfg=TINY.model), (1, 32, 64, 3), TINY.train, 1
    ).params
    path = str(tmp_path / "model.stablehlo")
    export_model(TINY, params, path, batch_size=2)

    pred = BatchedPredictor.from_artifact(path)
    assert pred.batch_size == 2 and pred.image_size == (32, 64)

    srv = DepthServer(None, predictor=pred, port=0, max_wait_ms=2.0)
    srv.start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        health = _get_json(f"{base}/healthz")
        assert health["image_size"] == [32, 64]
        body = _png_bytes(32, 64, seed=11)
        st, _, raw = _post(f"{base}/predict", body)
        assert st == 200
        art_depth = np.load(io.BytesIO(raw))
        # color rendering must work without a cfg (per-image norm)
        st, ct, _ = _post(f"{base}/predict?format=color", body)
        assert st == 200 and ct == "image/png"
    finally:
        srv.stop()

    # checkpoint-server answer for the same input (the module fixture
    # holds the same seed-1 create_state params)
    st, _, raw = _post(
        f"http://127.0.0.1:{server.port}/predict", body
    )
    ckpt_depth = np.load(io.BytesIO(raw))
    np.testing.assert_allclose(art_depth, ckpt_depth, rtol=1e-4, atol=1e-3)
