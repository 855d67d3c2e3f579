"""Demo / inference module (SURVEY.md §2.8): single images, directories
or frame sequences -> colorized depth maps and GIFs.

The jitted forward runs at the model's train resolution; outputs are
resized back to each input frame's size for display.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from gdn_tpu.config import Config
from gdn_tpu.models import RtoDNet
from gdn_tpu.ops.colormap import colorize_depth
from gdn_tpu.ops.resize import resize_bilinear

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp")
VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def list_inputs(path: str) -> List[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith(IMAGE_EXTS)
        )
    return [path]


def iter_frames(path: str):
    """Yield (name, rgb uint8 HWC) for an image file, a directory of
    frames, or a video file (SURVEY.md §2.8 video-sequence inference)."""
    if os.path.isfile(path) and path.lower().endswith(VIDEO_EXTS):
        import imageio.v3 as iio

        for i, frame in enumerate(iio.imiter(path)):
            yield f"frame{i:05d}", np.asarray(frame)[..., :3]
        return
    for p in list_inputs(path):
        yield (
            os.path.splitext(os.path.basename(p))[0],
            np.asarray(Image.open(p).convert("RGB")),
        )


class DepthPredictor:
    """Jit-compiled RGB -> depth inference wrapper.

    ``flip_tta``: horizontal-flip test-time averaging (same 2B-wide
    single-dispatch formulation as train/steps.make_eval_forward)."""

    def __init__(self, cfg: Config, params, flip_tta: bool = False):
        from gdn_tpu.train import make_eval_forward

        self.cfg = cfg
        self._fwd = make_eval_forward(
            cfg, RtoDNet(cfg=cfg.model), flip_tta=flip_tta
        )
        self.params = params

    def __call__(self, rgb: np.ndarray) -> np.ndarray:
        """rgb (H, W, 3) float [0,1] or uint8 -> depth (H, W) meters."""
        if rgb.dtype == np.uint8:
            rgb = rgb.astype(np.float32) / 255.0
        h, w = rgb.shape[:2]
        th, tw = self.cfg.model.image_size
        x = resize_bilinear(jnp.asarray(rgb), (th, tw))[None]
        depth = self._fwd(self.params, x)[0, ..., 0]
        return np.asarray(resize_bilinear(depth, (h, w)))


def run_demo(
    cfg: Config,
    params,
    input_path: str,
    output_dir: str,
    gif: Optional[str] = None,
    cmap: str = "magma",
    side_by_side: bool = True,
    flip_tta: bool = False,
) -> List[str]:
    """Predict depth for every input frame; write colorized PNGs and an
    optional animated GIF.  Returns the written file paths."""
    os.makedirs(output_dir, exist_ok=True)
    predictor = DepthPredictor(cfg, params, flip_tta=flip_tta)
    written, frames = [], []
    for name, rgb in iter_frames(input_path):
        depth = predictor(rgb)
        color = colorize_depth(depth, cfg.model.max_depth, cmap)
        frame = np.concatenate([rgb, color], axis=0) if side_by_side else color
        out_path = os.path.join(output_dir, name + "_depth.png")
        Image.fromarray(frame).save(out_path)
        written.append(out_path)
        frames.append(frame)
    if gif and frames:
        gif_path = gif if os.path.isabs(gif) else os.path.join(output_dir, gif)
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(
            gif_path, save_all=True, append_images=imgs[1:],
            duration=100, loop=0,
        )
        written.append(gif_path)
    return written
