"""Shared depth-domain decoder.

Trained inside the stage-1 D-net, then transferred (and optionally
frozen) into the stage-2 G-net — the core "guidance" mechanism of GDN
(SURVEY.md §2.2/§2.3, §3.2).  Because both encoders share the same
ladder widths, the decoder parameter tree is shape-identical across
stages and transfer is a plain subtree copy (checkpoint.transfer_stage1).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from gdn_tpu.config import ModelConfig
from gdn_tpu.models.blocks import DepthHead, UpBlock


class Decoder(nn.Module):
    """Mirror of the encoder: len(dec_channels) x2 upsampling scales
    with skip fusion, then the depth head.

    Returns (depth, dec_feats) with dec_feats ordered coarse->fine;
    dec_feats are the multi-scale guidance features stage-2 training
    matches against the D-net's (SURVEY.md §2.4 latent/guidance loss).
    """

    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(
        self,
        latent: jnp.ndarray,
        skips: Sequence[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
        c = self.cfg
        x = latent.astype(c.compute_dtype)
        dec_feats = []
        depth_scales = []
        # skips are fine->coarse; consume coarse->fine.
        if len(c.dec_channels) > len(skips):
            # would wrap into negative indexing below and silently
            # re-fuse the coarsest skip (wrong-resolution output)
            raise ValueError(
                f"dec_channels has {len(c.dec_channels)} scales but the "
                f"encoder produced only {len(skips)} skips"
            )
        for i, ch in enumerate(c.dec_channels):
            skip = skips[len(skips) - 1 - i]
            x = UpBlock(ch, cfg=c, name=f"up{i}")(
                x, target_hw=tuple(skip.shape[1:3]), lateral=skip
            )
            dec_feats.append(x)
            if c.multiscale_heads and i < len(c.dec_channels) - 1:
                # coarse-scale supervision heads (SURVEY §2.3
                # multi-scale outputs); the finest scale keeps the main
                # head below.  Flag-off trees are unchanged.
                depth_scales.append(
                    DepthHead(cfg=c, name=f"head{i}")(x)
                )
        depth = DepthHead(cfg=c, name="head")(x)
        if c.multiscale_heads:
            depth_scales.append(depth)
        return depth, dec_feats, depth_scales
