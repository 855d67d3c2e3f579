"""Stage-1 depth-to-depth autoencoder ("D-net", SURVEY.md §2.2).

Learns a depth-domain feature space by autoencoding GT depth maps; its
latent and decoder features later guide stage 2, so the forward pass
exposes them (the reference's `forward(depth) -> (recon, features)`
contract).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from gdn_tpu.config import ModelConfig
from gdn_tpu.models.decoder import Decoder
from gdn_tpu.models.encoder import Encoder


class DtoDNet(nn.Module):
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, depth: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Args: depth (B, H, W, 1) float32, meters.

        Returns dict with:
          depth:     (B, H, W, 1) float32 reconstruction, meters
          latent:    (B, H/2^k, W/2^k, C) bottleneck features
          dec_feats: list of decoder feature maps, coarse->fine
          skips:     encoder laterals, fine->coarse
        """
        # Cast before the normalize (see rtod.py): same mixed-precision
        # program (bf16 relative precision is scale-invariant), and the
        # bf16 input wire becomes bit-identical to the fp32 wire.
        x = depth.astype(self.cfg.compute_dtype) / self.cfg.max_depth
        latent, skips = Encoder(cfg=self.cfg, name="encoder")(x)
        recon, dec_feats, depth_scales = Decoder(
            cfg=self.cfg, name="decoder"
        )(latent, skips)
        return {
            "depth": recon,
            "latent": latent,
            "dec_feats": dec_feats,
            "skips": skips,
            "depth_scales": depth_scales,
        }
