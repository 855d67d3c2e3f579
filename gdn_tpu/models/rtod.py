"""Stage-2 RGB-to-depth guided encoder-decoder ("G-net"/RtoD-net,
SURVEY.md §2.3).

The RGB encoder maps an image into the depth-domain feature space
learned by stage 1; the decoder is the *transferred* D-net decoder
(weights copied via checkpoint.transfer_stage1_decoder, optionally
frozen with optax masking).  Guidance happens two ways:
  1. architecturally: multi-scale skip fusion through the shared
     FusionBlocks inside the decoder, and
  2. at training time: the G-net latent (and decoder features) are
     matched to the frozen D-net's on the same sample's GT depth
     (losses.latent_loss) — see train/stage2.py.

Inference needs RGB only: `forward(rgb) -> depth`.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from gdn_tpu.config import ModelConfig
from gdn_tpu.models.decoder import Decoder
from gdn_tpu.models.encoder import Encoder


class RtoDNet(nn.Module):
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, rgb: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Args: rgb (B, H, W, 3) float32 in [0, 1].

        Returns dict with depth / latent / dec_feats / skips (same
        contract as DtoDNet so the guidance loss can zip them).
        """
        # Cast to the compute dtype BEFORE the centering prologue: the
        # encoder casts right after anyway (encoder.py), so this is the
        # same mixed-precision program — and it makes a bfloat16 RGB
        # H2D wire (EvalConfig.rgb_wire="auto") bit-identical to the
        # fp32 wire by construction.
        x = rgb.astype(self.cfg.compute_dtype) * 2.0 - 1.0  # center RGB
        latent, skips = Encoder(cfg=self.cfg, name="encoder")(x)
        depth, dec_feats, depth_scales = Decoder(
            cfg=self.cfg, name="decoder"
        )(latent, skips)
        return {
            "depth": depth,
            "latent": latent,
            "dec_feats": dec_feats,
            "skips": skips,
            "depth_scales": depth_scales,
        }
