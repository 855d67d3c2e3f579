"""Paired-encoder forward for the fused guidance pass.

Extends TrainConfig.fused_guidance's op-count attack on the profiled
per-op-latency step floor (BASELINE.md): the stage-2 step runs TWO
encoder ladders of identical geometry (D-net on depth, G-net on RGB —
different weights, same shapes beyond the stem).  This module runs
them as ONE ladder of channel-grouped convolutions
(``feature_group_count=2``): every conv/GN/ELU op processes both
streams at once, halving the encoder op count, with mathematically
independent streams:

- grouped convs contract each group's input channels only (stream
  separation is exact);
- GroupNorm groups are contiguous channel blocks, so doubling the
  group count keeps every statistic within its own stream;
- the D stream's stem consumes depth zero-padded from 1 to 3 channels
  with correspondingly zero-padded weights (exact identity).

The ladder consumes the two ORIGINAL parameter trees (d_params /
g_params encoder subtrees) directly — no re-parameterization, no
checkpoint change.  Gradients flow only into the G weights (the D tree
enters as non-differentiated constants).

Used by train/steps._stage2_loss_fused when
``TrainConfig.fused_encoders`` is set; equivalence with the two-ladder
forward is tested in tests/test_train.py.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from gdn_tpu.config import ModelConfig
from gdn_tpu.models.blocks import activation_fn
from gdn_tpu.ops.groupnorm import group_norm_act, pick_groups


def _paired_conv_gn(x, wd, wg, sd, bd, sg, bg, stride, cfg: ModelConfig):
    """One grouped conv + per-stream GroupNorm + activation.

    x: (B, H, W, 2*Cin) = [d | g] channel halves.
    wd/wg: (k, k, Cin, Cout) per-stream kernels.
    sd/bd/sg/bg: per-stream GN affines (Cout,).
    Returns (B, H', W', 2*Cout).
    """
    kernel = jnp.concatenate(
        [wd.astype(cfg.compute_dtype), wg.astype(cfg.compute_dtype)],
        axis=-1,
    )
    y = jax.lax.conv_general_dilated(
        x.astype(cfg.compute_dtype), kernel,
        (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=2,
    )
    cout = wd.shape[-1]
    groups = pick_groups(cout, cfg.group_norm_groups)
    scale = jnp.concatenate([sd, sg])
    bias = jnp.concatenate([bd, bg])
    # 2*groups contiguous channel groups: statistics never cross the
    # stream boundary (each stream owns a contiguous Cout block).
    return group_norm_act(
        y, scale, bias, 2 * groups,
        activation=activation_fn(cfg.activation), impl=cfg.gn_impl,
    )


def _block(x, dp: Dict, gp: Dict, stride, cfg: ModelConfig):
    return _paired_conv_gn(
        x,
        dp["Conv_0"]["kernel"], gp["Conv_0"]["kernel"],
        dp["gn_scale"], dp["gn_bias"], gp["gn_scale"], gp["gn_bias"],
        stride, cfg,
    )


def paired_encoders(
    depth_norm: jnp.ndarray,
    rgb_centered: jnp.ndarray,
    d_enc: Dict,
    g_enc: Dict,
    cfg: ModelConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    """Run both encoder ladders as one grouped ladder.

    Args:
      depth_norm: (B, H, W, 1) depth / max_depth (the DtoDNet input).
      rgb_centered: (B, H, W, 3) rgb * 2 - 1 (the RtoDNet input).
      d_enc / g_enc: the two ``params["encoder"]`` subtrees.
    Returns (d_latent, g_latent, d_skips, g_skips) exactly as two
    separate Encoder.apply calls would.
    """
    b = depth_norm.shape[0]
    # stem: depth stream zero-padded 1 -> 3 input channels, with the
    # kernel zero-padded to match (exact identity: zero weights on the
    # zero channels)
    xd = jnp.pad(depth_norm, ((0, 0), (0, 0), (0, 0), (0, 2)))
    x = jnp.concatenate([xd, rgb_centered], axis=-1)
    wd_stem = d_enc["stem"]["Conv_0"]["kernel"]  # (7, 7, 1, C0)
    wd_stem = jnp.pad(wd_stem, ((0, 0), (0, 0), (0, 2), (0, 0)))
    x = _paired_conv_gn(
        x, wd_stem, g_enc["stem"]["Conv_0"]["kernel"],
        d_enc["stem"]["gn_scale"], d_enc["stem"]["gn_bias"],
        g_enc["stem"]["gn_scale"], g_enc["stem"]["gn_bias"],
        1, cfg,
    )
    skips = []
    for i in range(len(cfg.enc_channels)):
        skips.append(x)
        dd, gg = d_enc[f"down{i}"], g_enc[f"down{i}"]
        x = _block(x, dd["ConvBlock_0"], gg["ConvBlock_0"], 2, cfg)
        x = _block(x, dd["ConvBlock_1"], gg["ConvBlock_1"], 1, cfg)

    def split(t):
        c = t.shape[-1] // 2
        return t[..., :c], t[..., c:]

    d_latent, g_latent = split(x)
    d_skips, g_skips = zip(*(split(s) for s in skips))
    return d_latent, g_latent, list(d_skips), list(g_skips)
