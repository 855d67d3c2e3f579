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

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gdn_tpu.config import ModelConfig
from gdn_tpu.ops.resize import resize_bilinear


def activation_fn(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return {
        "elu": nn.elu,
        "relu": nn.relu,
        "gelu": nn.gelu,
        "leaky_relu": lambda x: nn.leaky_relu(x, 0.2),
    }[name]


def _group_norm_act(y, scale, bias, groups, cfg: ModelConfig):
    """GroupNorm + activation (ops/groupnorm.py; formulation selected by
    cfg.gn_impl — the GN statistic chains are the profiled per-step hot
    spot, see BASELINE.md)."""
    y = y.astype(cfg.compute_dtype)
    if (
        cfg.use_pallas
        and cfg.use_pallas_gn
        and cfg.activation == "elu"
        and jax.default_backend() == "tpu"
    ):
        from gdn_tpu.kernels.groupnorm import (
            fused_group_norm_elu, kernel_supported,
        )

        b, h, w, c = y.shape
        if kernel_supported(h, w, c, y.dtype.itemsize):
            return fused_group_norm_elu(y, scale, bias, groups)
    if cfg.gn_analytic_vjp and cfg.activation == "elu":
        # Hand-written minimal-residual backward (uses the chanreduce
        # forward formulation regardless of cfg.gn_impl).
        from gdn_tpu.ops.groupnorm import group_norm_elu_analytic

        return group_norm_elu_analytic(y, scale, bias, groups)
    from gdn_tpu.ops.groupnorm import group_norm_act

    return group_norm_act(
        y, scale, bias, groups,
        activation=activation_fn(cfg.activation), impl=cfg.gn_impl,
    )


class _ConvKernel(nn.Module):
    """Bare conv-kernel parameter holder, named "Conv_0" by its caller
    so the parameter tree stays bit-compatible with the previous
    ``nn.Conv`` layout (same path ``.../Conv_0/kernel``, same
    lecun_normal init) while the block owns the convolution call —
    required to route the SAME weights through either XLA or the fused
    Pallas kernel (checkpoints interchangeable across the flag)."""

    shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


class ConvBlock(nn.Module):
    """Conv(k,k) -> norm -> activation."""

    features: int
    kernel: int = 3
    stride: int = 1
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        if c.norm not in ("group", "none"):
            # fail loudly like the upsample/gn_impl knobs — a typo must
            # not silently train an unnormalized network
            raise ValueError(f"unknown norm {c.norm!r} (group|none)")
        if c.norm != "group":
            if c.quant != "none":
                raise ValueError(
                    "quant='int8' requires norm='group' (the quantized "
                    "conv sites live on the group-norm paths)"
                )
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding="SAME",
                use_bias=True,
                dtype=c.compute_dtype,
                param_dtype=jnp.float32,
            )(x)
            return activation_fn(c.activation)(x)

        # Own scale/bias + shared ops/groupnorm implementation (one
        # GN code path repo-wide; stats fp32, elementwise stays in
        # the compute dtype — the HBM-bound step's hot chain).
        from gdn_tpu.ops.groupnorm import pick_groups

        kernel = _ConvKernel(
            (self.kernel, self.kernel, x.shape[-1], self.features),
            name="Conv_0",
        )()
        groups = pick_groups(self.features, c.group_norm_groups)
        scale = self.param(
            "gn_scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "gn_bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        fusable = (
            c.use_pallas
            and c.quant == "none"
            and self.stride == 1
            and self.kernel == 3
            and c.activation == "elu"
            and jax.default_backend() == "tpu"
        )
        fusable_s2 = (
            c.use_pallas
            and c.use_pallas_convgn_s2
            and c.quant == "none"
            and self.stride == 2
            and self.kernel == 3
            and c.activation == "elu"
            and jax.default_backend() == "tpu"
        )
        if fusable_s2:
            # stride-2 sibling of the bt kernel (DownBlock downsampling
            # convs — the other half of the encoder GN stat bytes).
            from gdn_tpu.kernels.conv_gn_elu import (
                fused_conv_gn_elu_s2, pick_batch_tile_s2, supported_s2,
            )

            b, h, w = x.shape[0], x.shape[1], x.shape[2]
            if supported_s2(b, h, w, x.shape[-1], self.features):
                t = min(
                    c.convgn_bt_tile,
                    pick_batch_tile_s2(b, h, w, x.shape[-1], self.features),
                )
                while b % t:
                    t -= 1
                out = fused_conv_gn_elu_s2(
                    x.astype(c.compute_dtype), kernel, scale, bias,
                    groups, 1e-6, t, False, c.dtype,
                )
                return out.astype(c.compute_dtype)
        if fusable and c.use_pallas_convgn_bt:
            # v2: batch-tiled column-packed kernel with analytic VJP —
            # admits the narrow C=32/64 blocks via lane packing.
            from gdn_tpu.kernels.conv_gn_elu import (
                fused_conv_gn_elu_bt, pick_batch_tile, supported_bt,
            )

            b, h, w = x.shape[0], x.shape[1], x.shape[2]
            if supported_bt(b, h, w, x.shape[-1], self.features):
                t = min(
                    c.convgn_bt_tile,
                    pick_batch_tile(b, h, w, x.shape[-1], self.features),
                )
                while b % t:
                    t -= 1
                out = fused_conv_gn_elu_bt(
                    x.astype(c.compute_dtype), kernel, scale, bias,
                    groups, 1e-6, t, False, c.dtype,
                )
                return out.astype(c.compute_dtype)
        if fusable and c.use_pallas_convgn:
            from gdn_tpu.kernels.conv_gn_elu import supported

            if supported(x.shape[1], x.shape[2], x.shape[-1], self.features):
                from gdn_tpu.kernels.conv_gn_elu import fused_conv_gn_elu

                out = fused_conv_gn_elu(
                    x.astype(jnp.float32), kernel, scale, bias, groups,
                    1e-6, False, c.dtype,  # bf16 taps in bf16 models
                )
                return out.astype(c.compute_dtype)
        if c.quant == "int8" and x.shape[-1] >= c.quant_min_channels:
            # Post-training int8 (ops/quant.py): static calibrated
            # activation scale in the "quant" collection, per-channel
            # weight scales from the SAME fp32 param tree.
            from gdn_tpu.ops.quant import conv2d_int8, init_act_scale

            xs = self.variable("quant", "x_scale", init_act_scale(x))
            y = conv2d_int8(
                x, kernel, (self.stride, self.stride), xs.value
            ).astype(c.compute_dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(c.compute_dtype),
                kernel.astype(c.compute_dtype),
                (self.stride, self.stride),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return _group_norm_act(y, scale, bias, groups, c)


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
    concatenated then mixed by a 3x3 conv + GroupNorm + activation.
    The block owns its parameters directly so the same tree drives two
    execution paths:
      - the fused Pallas kernel (kernels/fusion_block.py): split-weight
        shifted matmuls, concat never materialized, norm+act fused —
        used when ``cfg.use_pallas`` on TPU with group-norm + ELU;
      - the XLA path (concat -> conv -> norm -> act) otherwise.
    With ``"add"`` the lateral is 1x1-projected and added (XLA only).
    """

    features: int
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, lateral: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.fusion != "concat":
            proj = nn.Conv(
                x.shape[-1], (1, 1), dtype=self.cfg.compute_dtype,
                param_dtype=jnp.float32, name="lateral_proj",
            )(lateral)
            return ConvBlock(self.features, kernel=3, cfg=self.cfg)(x + proj)

        c = self.cfg
        cx, cl, cout = x.shape[-1], lateral.shape[-1], self.features
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cx + cl, cout),
            jnp.float32,
        )
        use_gn = c.norm == "group"
        from gdn_tpu.ops.groupnorm import pick_groups

        groups = pick_groups(cout, c.group_norm_groups) if use_gn else 1
        if use_gn:
            scale = self.param("scale", nn.initializers.ones, (cout,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)
        else:
            bias = self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)

        use_fused_bt = (
            c.use_pallas
            and c.use_pallas_fusion_bt
            and c.quant == "none"
            and use_gn
            and c.activation == "elu"
            and jax.default_backend() == "tpu"
        )
        if use_fused_bt:
            # v2 batch-tiled recipe (kernels/fusion_bt.py): concat never
            # materialized, per-image GN stats in-kernel, analytic VJP.
            from gdn_tpu.kernels.fusion_bt import (
                fused_fusion_bt, pick_batch_tile_fb, supported_fb,
            )

            b, h, w = x.shape[0], x.shape[1], x.shape[2]
            if supported_fb(b, h, w, cx, cl, cout):
                t = min(
                    c.convgn_bt_tile,
                    pick_batch_tile_fb(b, h, w, cx, cl, cout),
                )
                while b % t:
                    t -= 1
                out = fused_fusion_bt(
                    x.astype(c.compute_dtype),
                    lateral.astype(c.compute_dtype),
                    kernel[:, :, :cx, :], kernel[:, :, cx:, :],
                    scale, bias, groups, 1e-6, t, False, c.dtype,
                )
                return out.astype(c.compute_dtype)

        use_fused = (
            c.use_pallas
            and c.use_pallas_fusion
            and c.quant == "none"
            and use_gn
            and c.activation == "elu"
            and jax.default_backend() == "tpu"
        )
        if use_fused:
            from gdn_tpu.kernels.fusion_block import fits_vmem

            use_fused = fits_vmem(x.shape[1], x.shape[2], cx, cl, cout)
        if use_fused:
            from gdn_tpu.kernels.fusion_block import fused_fusion_block

            out = fused_fusion_block(
                x.astype(jnp.float32), lateral.astype(jnp.float32),
                kernel[:, :, :cx, :], kernel[:, :, cx:, :],
                scale, bias, groups, 1e-6, False,
                c.dtype,  # bf16 taps when the model computes in bf16
            )
            return out.astype(c.compute_dtype)

        full = jnp.concatenate([x, lateral.astype(x.dtype)], axis=-1)
        if c.quant == "int8" and full.shape[-1] >= c.quant_min_channels:
            from gdn_tpu.ops.quant import conv2d_int8, init_act_scale

            xs = self.variable("quant", "x_scale", init_act_scale(full))
            y = conv2d_int8(full, kernel, (1, 1), xs.value).astype(
                c.compute_dtype
            )
        else:
            y = jax.lax.conv_general_dilated(
                full.astype(c.compute_dtype), kernel.astype(c.compute_dtype),
                (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if use_gn:
            return _group_norm_act(y, scale, bias, groups, c)
        return activation_fn(c.activation)(y + bias.astype(y.dtype))


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
        c = self.cfg
        if c.upsample == "resize_conv" and c.norm == "group":
            # This branch owns its conv+GN params directly (like
            # FusionBlock) so the parameter tree is identical whether
            # the fused Pallas kernel or the XLA path executes —
            # checkpoints are interchangeable across the flag.
            cin, cout = x.shape[-1], self.features
            kernel = self.param(
                "up_kernel", nn.initializers.lecun_normal(),
                (3, 3, cin, cout), jnp.float32,
            )
            from gdn_tpu.ops.groupnorm import pick_groups

            groups = pick_groups(cout, c.group_norm_groups)
            scale = self.param("up_scale", nn.initializers.ones, (cout,), jnp.float32)
            bias = self.param("up_bias", nn.initializers.zeros, (cout,), jnp.float32)

            use_fused_up = (
                c.use_pallas
                and c.use_pallas_fusion
                and c.quant == "none"
                and c.activation == "elu"
                and tuple(target_hw) == (2 * x.shape[1], 2 * x.shape[2])
                and jax.default_backend() == "tpu"
            )
            if use_fused_up:
                from gdn_tpu.kernels.upsample import fits_vmem

                use_fused_up = fits_vmem(
                    x.shape[1], x.shape[2], x.shape[-1], self.features
                )
            use_composed = (
                c.resize_conv_composed
                and c.quant == "none"
                and not use_fused_up
                and tuple(target_hw) == (2 * x.shape[1], 2 * x.shape[2])
                and x.shape[1] >= 2 and x.shape[2] >= 2
            )
            if use_fused_up:
                from gdn_tpu.kernels.upsample import fused_upsample_conv

                x = fused_upsample_conv(
                    x.astype(jnp.float32), kernel, scale, bias, groups,
                    1e-6, False, c.dtype,
                ).astype(c.compute_dtype)
            elif use_composed:
                # Exact single-op execution of resize+conv (composed
                # 6x6 conv_transpose + thin-slab edge fix) — same
                # function, same params, no materialized 4x resize
                # (ops/resize.py composed_resize_conv2x).
                from gdn_tpu.ops.resize import composed_resize_conv2x

                y = composed_resize_conv2x(
                    x.astype(c.compute_dtype),
                    kernel.astype(c.compute_dtype),
                )
                x = _group_norm_act(y, scale, bias, groups, c)
            else:
                # precise=False keeps the feature resize in bf16.
                # (Measured: the concat-shift interleave alternative
                # (ops.resize.upsample2x_bilinear) lowered to costly
                # sublane relayouts and was 1.4x SLOWER end-to-end than
                # jax.image's transposed-matmul resize — keep this.)
                x = resize_bilinear(
                    x.astype(c.compute_dtype), target_hw, precise=False
                )
                if c.quant == "int8" and x.shape[-1] >= c.quant_min_channels:
                    from gdn_tpu.ops.quant import conv2d_int8, init_act_scale

                    xs = self.variable(
                        "quant", "x_scale", init_act_scale(x)
                    )
                    y = conv2d_int8(x, kernel, (1, 1), xs.value).astype(
                        c.compute_dtype
                    )
                else:
                    y = jax.lax.conv_general_dilated(
                        x, kernel.astype(c.compute_dtype), (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                x = _group_norm_act(y, scale, bias, groups, c)
        elif self.cfg.upsample == "resize_conv":
            x = resize_bilinear(x, target_hw)
            x = ConvBlock(self.features, kernel=3, cfg=self.cfg)(x)
        elif self.cfg.upsample == "deconv":
            use_gn = self.cfg.norm == "group" and self.cfg.deconv_gn
            if self.cfg.deconv_init == "bilinear":
                # 6x6 kernel = bilinear-2x ∘ lecun-3x3 (ops/resize.py):
                # at init this branch IS the resize_conv branch on
                # interior pixels — no checkerboard start.
                from gdn_tpu.ops.resize import compose_bilinear_deconv_kernel

                def kernel_init(key, shape, dtype=jnp.float32):
                    cin, cout = shape[2], shape[3]
                    k3 = nn.initializers.lecun_normal()(
                        key, (3, 3, cin, cout), dtype
                    )
                    return compose_bilinear_deconv_kernel(k3)

                ksize, kinit = (6, 6), kernel_init
            else:
                ksize, kinit = (4, 4), nn.initializers.lecun_normal()
            x = nn.ConvTranspose(
                self.features, ksize, strides=(2, 2), padding="SAME",
                use_bias=not use_gn, kernel_init=kinit,
                dtype=self.cfg.compute_dtype, param_dtype=jnp.float32,
            )(x)
            # Exact-size guarantee regardless of parity of the input.
            if tuple(x.shape[1:3]) != tuple(target_hw):
                x = resize_bilinear(x, target_hw)
            if use_gn:
                # Same norm+act epilogue as the resize_conv branch —
                # built to de-confound the round-2 convergence
                # comparison; measured NOT to close the deconv gap
                # (a1 0.785/0.858/0.843 over 3 seeds vs resize_conv's
                # 0.920/0.921, BASELINE.md round 3) and costs ~9% step
                # throughput, hence default off (cfg.deconv_gn).
                from gdn_tpu.ops.groupnorm import pick_groups

                groups = pick_groups(self.features, self.cfg.group_norm_groups)
                scale = self.param(
                    "deconv_gn_scale", nn.initializers.ones,
                    (self.features,), jnp.float32,
                )
                bias = self.param(
                    "deconv_gn_bias", nn.initializers.zeros,
                    (self.features,), jnp.float32,
                )
                x = _group_norm_act(x, scale, bias, groups, self.cfg)
            elif self.cfg.activation == "elu" and self.cfg.elu_outform_vjp:
                from gdn_tpu.ops.elu import elu_saveout

                x = elu_saveout(x)
            else:
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
