"""Int8 post-training quantization for the inference path.

The reference has no quantized deployment story (SURVEY.md §2.8 stops
at a demo script); on TPU, int8 is the native fast path — the MXU runs
s8 x s8 -> s32 at twice the bf16 rate and int8 activations halve the
HBM bytes of a bandwidth-bound forward.  Probe on the real chip
(/tmp/probe_int8.py, banked in BASELINE.md round 5): a mid-ladder
3x3 conv at (64,64,208,64) runs 4.34 ms in bf16, 2.88 ms as int8 with
inline dynamic quantization (1.51x), 1.49 ms int8-resident (2.92x).

MEASURED NEGATIVE AT THE MODEL LEVEL (BASELINE.md round 5): the full
G-net int8 forward is 0.88-0.97x of bf16 at B=1/16/64, and a
quant_min_channels sweep (quantize only deep layers) stays below bf16
at every threshold.  The per-conv win is eaten by the glue: the
quantize chains cost 4.7 ms of clamp_convert fusions and int8's
(32,128) tiling adds 3.0 ms of relayout copies per forward (profile
in BASELINE.md), against convs that are only ~45% of a forward already
running at ~76% of HBM peak in bf16.  The capability ships complete
and default-off: correct (tests/test_quant.py), integrated
(--quantize int8 on eval/serve/export, bakes into StableHLO
artifacts), and honest about when to use it — models whose forwards
are MXU-bound, not this one.

Scheme: symmetric int8, per-output-channel weight scales (computed
from the fp32 params on the fly — 8M params of elementwise work,
negligible next to the convs), STATIC per-tensor activation scales
baked by a calibration pass (``calibrate_quant``).  Static scales keep
the quantize fusable into the producing op (no extra absmax pass at
inference) — the TPU-idiomatic form.  The depth head stays fp32
(standard practice: the final regression layer is quality-critical and
tiny).

Flax wiring: each quantized conv site owns a ``"quant"`` collection
variable holding its activation scale.  Calibration IS the variable
initialization — ``model.apply(..., mutable=["quant"])`` on a
representative batch initializes every scale to that batch's
absmax/127; ``calibrate_quant`` merges several batches with an
elementwise max.  Inference passes the calibrated collection:
``model.apply({"params": params, "quant": scales}, rgb)``.

Training with ``quant="int8"`` is refused by the step builders —
``jnp.round`` has a zero gradient, so a quantized train step would
silently learn nothing (quantization-aware training is out of scope;
this is deployment-time PTQ).
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
from jax import lax


def quantize_weight_per_channel(w: jnp.ndarray):
    """(H, W, I, O) fp kernel -> (int8 kernel, (O,) fp32 scales).

    Symmetric per-output-channel: scale_o = max|W[..., o]| / 127.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return w8.astype(jnp.int8), scale


def quantize_act(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """fp activation -> int8 with a static per-tensor scale."""
    s = jnp.maximum(scale, 1e-12)
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / s), -127, 127
    ).astype(jnp.int8)


def conv2d_int8(
    x: jnp.ndarray,
    w: jnp.ndarray,
    strides,
    x_scale: jnp.ndarray,
    padding: str = "SAME",
) -> jnp.ndarray:
    """Quantized NHWC conv: s8 x s8 -> s32 on the MXU, dequantized to
    fp32 with x_scale * w_scale[o].  ``w`` is the fp32 parameter; its
    per-channel quantization happens here so the same checkpoint tree
    serves both paths."""
    w8, w_scale = quantize_weight_per_channel(w)
    x8 = quantize_act(x, x_scale)
    y = lax.conv_general_dilated(
        x8, w8, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (
        jnp.maximum(x_scale, 1e-12) * w_scale
    )


def init_act_scale(x: jnp.ndarray):
    """Init closure for a conv site's "quant" variable: the current
    batch's absmax/127 (so a mutable-["quant"] apply IS one calibration
    step)."""
    return lambda: (
        jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    ).astype(jnp.float32)


def calibrate_quant(model, params, rgb_batches: Iterable[Any]):
    """Calibrate activation scales for int8 inference.

    Runs the (quant="int8") model over representative RGB batches; each
    apply with mutable=["quant"] initializes every conv site's scale to
    that batch's absmax/127, and batches merge by elementwise max.
    Returns the "quant" collection to pass alongside params.
    """
    fwd = jax.jit(
        lambda p, rgb: model.apply({"params": p}, rgb, mutable=["quant"])[1]
    )
    merged = None
    for rgb in rgb_batches:
        v = fwd(params, jnp.asarray(rgb))
        # flax omits the collection entirely when no conv site created a
        # scale variable — i.e. quant_min_channels excludes every site.
        q = v.get("quant")
        if not q:
            raise ValueError(
                "calibration quantized ZERO conv sites: quant_min_channels"
                f"={getattr(model.cfg, 'quant_min_channels', '?')} exceeds "
                "every conv's input channel count, so int8 would be a "
                "no-op — lower the threshold or drop --quantize"
            )
        merged = q if merged is None else jax.tree.map(jnp.maximum, merged, q)
    if merged is None:
        raise ValueError("calibrate_quant needs at least one batch")
    return jax.device_get(merged)


def synthetic_calibration_batches(
    cfg, n_batches: int = 8, batch_size: int = 8, seed: int = 0
):
    """Representative RGB batches for calibration when no data is at
    hand: the procedural synthetic scene generator at the model's
    resolution (structured gradients/edges, [0,1] range — the same
    distribution family the demo/smoke paths use).  Calibrating on a
    handful of REAL images is better when available; pass those to
    calibrate_quant directly."""
    import jax.random as jrandom

    from gdn_tpu.data.synthetic import synthetic_batch

    h, w = cfg.model.image_size
    key = jrandom.PRNGKey(seed)
    for _ in range(n_batches):
        key, sub = jrandom.split(key)
        yield synthetic_batch(sub, batch_size, h, w, cfg.model.max_depth)["rgb"]


def real_calibration_batches(
    cfg, calib_dir: str, batch_size: int = 8, max_images: int = 64
):
    """RGB batches from a directory of real images (demo.iter_frames
    formats), resized to the model resolution — the best calibration
    source for deployment: scales match the imagery actually served.
    Reads at most ``max_images`` (absmax scales saturate after a few
    dozen representative images; pointing this at a full corpus should
    not decode thousands of files)."""
    import itertools

    import numpy as np

    from gdn_tpu.demo import iter_frames
    from gdn_tpu.ops.resize import resize_bilinear

    h, w = cfg.model.image_size
    imgs = [
        np.asarray(resize_bilinear(rgb.astype(np.float32) / 255.0, (h, w)))
        for _, rgb in itertools.islice(iter_frames(calib_dir), max_images)
    ]
    if not imgs:
        raise ValueError(f"no images found in calibration dir {calib_dir}")
    return [
        np.stack(imgs[i:i + batch_size])
        for i in range(0, len(imgs), batch_size)
    ]


def train_split_calibration_batches(cfg, n_batches: int = 4):
    """First ``n_batches`` TRAIN-split batches (wire-decoded on device,
    un-augmented).  Held-IN data: calibrating eval-time int8 on the
    eval images themselves would leak the scale statistics into the
    reported metrics."""
    import dataclasses

    from gdn_tpu.data.augment import decode_wire_batch
    from gdn_tpu.data.pipeline import make_loader

    def collect(batch_size: int):
        # Small batches: calibration needs ~32 images, not the train
        # batch; un-augmented, wire-decoded to float [0,1] on device.
        c = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, batch_size=batch_size)
        )
        loader = make_loader(c, "train")
        depth_scale = float(getattr(loader, "wire_depth_scale", 256.0))
        out = []
        for batch in loader:
            batch = decode_wire_batch(
                batch, max_depth=float(cfg.model.max_depth),
                depth_scale=depth_scale,
            )
            out.append(jax.device_get(batch["rgb"]))
            if len(out) >= n_batches:
                break
        if not out:
            raise ValueError("train split yielded no batches")
        return out

    try:
        return collect(min(8, cfg.data.batch_size))
    except ValueError:
        # corpora smaller than one batch: looping loaders refuse —
        # calibrate image-by-image instead.
        return collect(1)


def resolve_calibration_batches(
    cfg, calib_dir: str | None = None, prefer_train_split: bool = False
):
    """Pick the PTQ calibration source, in preference order: a directory
    of real images (``--calib_dir``), the train split (held-in data —
    keeps eval metrics leakage-free; enabled by ``prefer_train_split``),
    then the synthetic scene generator.  Returns (batches, label)."""
    if calib_dir:
        return real_calibration_batches(cfg, calib_dir), f"dir:{calib_dir}"
    if prefer_train_split and cfg.data.dataset != "synthetic":
        try:
            return train_split_calibration_batches(cfg), "train-split"
        except Exception as e:  # noqa: BLE001 — fall back loudly
            print(
                f"int8: train-split calibration unavailable "
                f"({type(e).__name__}: {e}); using synthetic scenes"
            )
    return list(synthetic_calibration_batches(cfg)), "synthetic"


def quantized_model_and_scales(
    cfg, params, calib_batches=None, calib_dir=None,
    prefer_train_split=False,
):
    """Convenience for the CLI surfaces: returns (int8 RtoDNet model,
    calibrated scales) for a trained param tree.  ``cfg.model.quant``
    must already be "int8".  Calibration source: explicit
    ``calib_batches`` > ``calib_dir`` images > train split (if
    ``prefer_train_split``) > synthetic scenes."""
    from gdn_tpu.models import RtoDNet

    model = RtoDNet(cfg=cfg.model)
    if calib_batches is None:
        calib_batches, label = resolve_calibration_batches(
            cfg, calib_dir=calib_dir, prefer_train_split=prefer_train_split
        )
        print(f"int8: calibrating on {label}")
    return model, calibrate_quant(model, params, calib_batches)
