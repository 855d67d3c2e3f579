"""Shared encoder ladder used by both stages.

The stage-1 D-net encodes 1-channel depth; the stage-2 G-net encodes
3-channel RGB (SURVEY.md §2.2/§2.3).  Both use the same ladder so the
skip-feature *shapes* are identical, which is what makes the decoder
transferable between stages.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from gdn_tpu.config import ModelConfig
from gdn_tpu.models.blocks import ConvBlock, DownBlock


class Encoder(nn.Module):
    """Conv ladder: stem at full res, then len(enc_channels) /2 stages.

    Returns (latent, skips) where skips[i] is the feature map *before*
    downsampling step i (used as decoder laterals), ordered fine->coarse.
    """

    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        c = self.cfg
        x = x.astype(c.compute_dtype)
        x = ConvBlock(c.enc_channels[0], kernel=7, cfg=c, name="stem")(x)
        skips = []
        for i, ch in enumerate(c.enc_channels):
            skips.append(x)
            x = DownBlock(ch, cfg=c, name=f"down{i}")(x)
        return x, skips
