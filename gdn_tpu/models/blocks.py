"""Building blocks for the D-net / G-net encoder-decoders.

TPU-first design notes (vs the reference's torch conv/deconv blocks,
SURVEY.md §2.2/§2.3):
  - NHWC layout throughout (XLA:TPU's native conv layout).
  - GroupNorm instead of BatchNorm: batch-size independent, no
    cross-chip stat sync needed under data parallelism.
  - Upsampling defaults to resize+conv ("resize_conv"), which avoids
    conv_transpose output-padding shape pitfalls (SURVEY.md §7) and
    checkerboard artifacts, and lets arbitrary input sizes (NYU
    228x304) round-trip exactly by resizing to the recorded skip size.
  - Compute in bfloat16 (params float32); the MXU runs conv FLOPs in
    bf16 at full rate.  Output heads force float32.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from gdn_tpu.config import ModelConfig
from gdn_tpu.ops.resize import resize_bilinear, resize_nearest


def activation_fn(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return {
        "elu": nn.elu,
        "relu": nn.relu,
        "gelu": nn.gelu,
        "leaky_relu": lambda x: nn.leaky_relu(x, 0.2),
    }[name]


class ConvBlock(nn.Module):
    """Conv(k,k) -> norm -> activation."""

    features: int
    kernel: int = 3
    stride: int = 1
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=self.cfg.norm == "none",
            dtype=self.cfg.compute_dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.cfg.norm == "group":
            x = nn.GroupNorm(
                num_groups=min(self.cfg.group_norm_groups, self.features),
                dtype=jnp.float32,  # stats in fp32 for stability
                param_dtype=jnp.float32,
            )(x).astype(self.cfg.compute_dtype)
        return activation_fn(self.cfg.activation)(x)


class DownBlock(nn.Module):
    """Stride-2 conv + refining conv: one encoder scale (/2)."""

    features: int
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ConvBlock(self.features, kernel=3, stride=2, cfg=self.cfg)(x)
        x = ConvBlock(self.features, kernel=3, stride=1, cfg=self.cfg)(x)
        return x


class FusionBlock(nn.Module):
    """Guidance-feature fusion: merge a lateral feature map into the
    decoder stream (SURVEY.md §2.3 'concat/add + conv').

    With ``cfg.fusion == "concat"`` the lateral features are
    concatenated then mixed by a 3x3 conv; with ``"add"`` they are
    projected 1x1 and added before the conv.  On TPU the concat+conv
    pair is exactly what the fused Pallas fusion kernel implements
    (kernels/fusion_block.py) — this module is its XLA reference.
    """

    features: int
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, lateral: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.fusion == "concat":
            x = jnp.concatenate([x, lateral.astype(x.dtype)], axis=-1)
        else:
            proj = nn.Conv(
                x.shape[-1], (1, 1), dtype=self.cfg.compute_dtype,
                param_dtype=jnp.float32, name="lateral_proj",
            )(lateral)
            x = x + proj
        return ConvBlock(self.features, kernel=3, cfg=self.cfg)(x)


class UpBlock(nn.Module):
    """One decoder scale: upsample x2 (to an exact target size) then
    conv, optionally fusing a skip/guidance lateral."""

    features: int
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        target_hw: Tuple[int, int],
        lateral: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if self.cfg.upsample == "resize_conv":
            x = resize_bilinear(x, target_hw)
            x = ConvBlock(self.features, kernel=3, cfg=self.cfg)(x)
        elif self.cfg.upsample == "deconv":
            x = nn.ConvTranspose(
                self.features, (4, 4), strides=(2, 2), padding="SAME",
                dtype=self.cfg.compute_dtype, param_dtype=jnp.float32,
            )(x)
            # Exact-size guarantee regardless of parity of the input.
            if tuple(x.shape[1:3]) != tuple(target_hw):
                x = resize_bilinear(x, target_hw)
            x = activation_fn(self.cfg.activation)(x)
        else:
            raise ValueError(f"unknown upsample {self.cfg.upsample!r}")
        if lateral is not None:
            x = FusionBlock(self.features, cfg=self.cfg, name="fuse")(x, lateral)
        return x


class DepthHead(nn.Module):
    """1-channel depth output: conv -> sigmoid -> scale to (0, max_depth].

    Output is float32 regardless of compute dtype (loss/eval run fp32).
    """

    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            1, (3, 3), padding="SAME",
            dtype=jnp.float32, param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return nn.sigmoid(x) * self.cfg.max_depth
