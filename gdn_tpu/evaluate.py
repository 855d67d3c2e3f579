"""Evaluation harness reproducing the reference eval protocol
(SURVEY.md §2.7/§3.3):

  load ckpt -> per image: forward at train res -> upsample prediction
  to GT resolution -> crop/cap/mask -> accumulate the 7-metric table.

The forward+resize+metrics pipeline is one jitted program per GT
resolution; metrics are computed on device in fp32 and only the scalar
dict crosses to host, so eval fps measures the chip, not transfers.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gdn_tpu.config import Config
from gdn_tpu import metrics as M
from gdn_tpu.ops.resize import resize_bilinear


def make_eval_step(
    cfg: Config,
    forward: Callable[[Any, jnp.ndarray], jnp.ndarray],
    gt_shape: Tuple[int, int],
):
    """Jitted: (params, rgb (1,H,W,3), gt (1,Hg,Wg)) -> metric dict."""
    crop = jnp.asarray(M.crop_mask(gt_shape[0], gt_shape[1], cfg.eval.crop))

    @jax.jit
    def step(params, rgb, gt):
        pred = forward(params, rgb)[0, ..., 0]  # (H, W) train res
        pred = resize_bilinear(pred, gt_shape)
        gt2 = gt[0]
        gt_, pred_, range_mask = M.apply_cap(
            gt2, pred, cfg.model.min_depth, cfg.eval.cap
        )
        return M.compute_errors(gt_, pred_, range_mask & crop)

    return step


def evaluate(
    cfg: Config,
    params: Any,
    forward: Callable[[Any, jnp.ndarray], jnp.ndarray],
    dataset: Iterable[Dict[str, np.ndarray]],
    max_images: Optional[int] = None,
    verbose: bool = True,
) -> Dict[str, float]:
    """Run the eval split; returns the metric table (+ 'fps').

    `dataset` yields dicts with 'rgb' (1,H,W,3) at train res and
    'gt' (1,Hg,Wg) raw-resolution GT depth.
    """
    acc = M.MetricAccumulator()
    step = None
    n = 0
    t0 = None
    for sample in dataset:
        if max_images is not None and n >= max_images:
            break
        rgb = jnp.asarray(sample["rgb"])
        gt = jnp.asarray(sample["gt"])
        if step is None:
            step = make_eval_step(cfg, forward, tuple(gt.shape[1:3]))
            # Warm up compile before timing fps (fetch to force
            # completion; block_until_ready can return early through
            # remote-TPU tunnels).
            jax.tree.map(float, step(params, rgb, gt))
            t0 = time.perf_counter()
        result = step(params, rgb, gt)
        acc.update(jax.tree.map(float, result))
        n += 1
    out = acc.result()
    if n > 0 and t0 is not None:
        out["fps"] = n / max(time.perf_counter() - t0, 1e-9)
    if verbose:
        print(acc.table())
        if "fps" in out:
            print(f"eval fps: {out['fps']:.1f}")
    return out
