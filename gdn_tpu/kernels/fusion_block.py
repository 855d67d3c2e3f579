"""Fused guidance-feature-fusion Pallas kernel (SURVEY.md §2.12 item 1).

The decoder's FusionBlock is concat(x, lateral) -> 3x3 conv ->
GroupNorm -> ELU (models/blocks.py).  XLA materializes the concat and
the pre-norm conv output in HBM; this kernel does the whole block in
one VMEM pass per image:

- the concat is *algebraic*: a 3x3 conv over [x ‖ lat] splits into two
  weight slices, so the kernel accumulates 9 shifted MXU matmuls from x
  plus 9 from lat and never forms the concatenated tensor;
- GroupNorm statistics and the ELU are applied in-register before the
  single HBM write of the result.

HBM traffic: read x + lat + weights, write y — nothing else.

Training uses jax.custom_vjp with the XLA reference implementation's
VJP as the backward (the fused forward is the hot inference path; the
backward stays on cuDNN-class XLA conv kernels).  Equivalence with the
flax FusionBlock is enforced by tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_into(src_ref, w_ref, acc_ref, h, w, tap_dtype=jnp.float32):
    """Accumulate a SAME-padded 3x3 conv of src_ref (H, W, Cin) into
    acc_ref (H, W, Cout) via 9 shifted MXU matmuls.

    Each tap reads a *static* slice of the input ref and += a static
    slice of the scratch accumulator — the memory-safe Mosaic pattern:
    value-level dynamic_slice is unimplemented, and a fully value-based
    unroll made Mosaic keep all nine shifted patches live (51 MB scoped
    VMEM at decoder shapes).  Out-of-image taps simply shrink the
    accumulated region, which is exactly zero padding.

    tap_dtype=bfloat16 runs each tap as a single-pass bf16 MXU matmul
    (fp32 accumulate) — 3x fewer MXU passes than fp32 inputs, matching
    the bf16 compute dtype of the surrounding flax model."""
    for dy in range(3):
        for dx in range(3):
            sy0, sy1 = max(0, dy - 1), h + min(0, dy - 1)
            sx0, sx1 = max(0, dx - 1), w + min(0, dx - 1)
            oy0, oy1 = max(0, 1 - dy), h + min(0, 1 - dy)
            ox0, ox1 = max(0, 1 - dx), w + min(0, 1 - dx)
            src = src_ref[sy0:sy1, sx0:sx1, :].astype(tap_dtype)
            contrib = jax.lax.dot_general(
                src, w_ref[dy, dx].astype(tap_dtype),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[oy0:oy1, ox0:ox1, :] += contrib


def _groupnorm_elu(y, scale, bias, groups, eps, real_c):
    """Reshape-free GroupNorm + ELU on (H, W, Cpad) where only the
    first `real_c` channels are real (zero padding to the 128-lane
    boundary).  Group sums via a (Cpad, G) one-hot matmul whose rows
    are zero for padded channels, so the statistics see only real
    channels and the padded outputs stay exactly zero."""
    h, w, c = y.shape
    cg = real_c // groups
    cid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    gid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    real = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) < real_c
    gmat = ((cid == gid) & real).astype(jnp.float32)  # (Cpad, G)
    n = jnp.float32(h * w * cg)
    sums = jnp.sum(y, axis=0).sum(axis=0, keepdims=True)  # (1, Cpad)
    sumsq = jnp.sum(y * y, axis=0).sum(axis=0, keepdims=True)
    mean_g = jnp.dot(sums, gmat, preferred_element_type=jnp.float32) / n
    ex2_g = jnp.dot(sumsq, gmat, preferred_element_type=jnp.float32) / n
    # clamp: E[y^2]-mean^2 can cancel slightly negative -> rsqrt NaN
    var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
    mean_c = jnp.dot(mean_g, gmat.T, preferred_element_type=jnp.float32)
    var_c = jnp.dot(var_g, gmat.T, preferred_element_type=jnp.float32)
    yn = (y - mean_c) * jax.lax.rsqrt(var_c + eps)
    yn = yn * scale + bias
    # ELU; exp(x)-1 instead of expm1 (unimplemented in Mosaic lowering)
    return jnp.where(yn > 0, yn, jnp.exp(jnp.minimum(yn, 0.0)) - 1.0)


def pad_lanes(x, axis: int, mult: int = 128):
    """Zero-pad `axis` of a host-side value to a multiple of `mult` —
    Mosaic memref slices require lane extents aligned to the 128-lane
    tile, and the MXU is 128 wide regardless, so the padding is free."""
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return jnp.pad(x, widths)


def _fusion_kernel(
    x_ref, lat_ref, wx_ref, wl_ref, scale_ref, bias_ref, out_ref, acc_ref,
    *, groups, eps, real_cout, tap_dtype,
):
    h, w = x_ref.shape[1], x_ref.shape[2]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    _conv3x3_into(x_ref.at[0], wx_ref, acc_ref, h, w, tap_dtype)
    _conv3x3_into(lat_ref.at[0], wl_ref, acc_ref, h, w, tap_dtype)
    out_ref[0] = _groupnorm_elu(
        acc_ref[...], scale_ref[0].astype(jnp.float32),
        bias_ref[0].astype(jnp.float32), groups, eps, real_cout,
    )


def _reference(x, lat, wx, wl, scale, bias, groups, eps):
    """XLA reference: concat -> conv -> GroupNorm -> ELU (matches the
    flax FusionBlock with norm='group', activation='elu')."""
    full = jnp.concatenate([x, lat], axis=-1).astype(jnp.float32)
    w = jnp.concatenate([wx, wl], axis=2).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        full, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b, h, wd, c = y.shape
    cg = c // groups
    yg = y.reshape(b, h * wd, groups, cg)
    mean = jnp.mean(yg, axis=(1, 3), keepdims=True)
    var = jnp.mean((yg - mean) ** 2, axis=(1, 3), keepdims=True)
    yn = ((yg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, wd, c)
    yn = yn * scale + bias
    return jnp.where(yn > 0, yn, jnp.expm1(yn))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_fusion_block(
    x, lat, wx, wl, scale, bias, groups: int = 8, eps: float = 1e-6,
    interpret: bool = False, tap_dtype: str = "float32",
):
    """Fused concat+conv3x3+GroupNorm+ELU.

    Args:
      x:    (B, H, W, Cx) decoder stream.
      lat:  (B, H, W, Cl) lateral/guidance features (same spatial size).
      wx:   (3, 3, Cx, Cout) conv weights for the x slice.
      wl:   (3, 3, Cl, Cout) conv weights for the lateral slice.
      scale/bias: (Cout,) GroupNorm affine.
    Returns (B, H, W, Cout) float32.
    """
    b, h, w, cx = x.shape
    cout = wx.shape[-1]
    # Lane alignment: Mosaic memref slices need channel extents in
    # 128-lane tiles; pad channels with zeros (free on the 128-wide
    # MXU) and slice the real channels back out after the kernel.
    xp = pad_lanes(x, 3)
    latp = pad_lanes(lat, 3)
    wxp = pad_lanes(pad_lanes(wx, 2), 3)
    wlp = pad_lanes(pad_lanes(wl, 2), 3)
    scalep = pad_lanes(scale.reshape(1, -1), 1)
    biasp = pad_lanes(bias.reshape(1, -1), 1)
    cxp, clp, coutp = xp.shape[-1], latp.shape[-1], wxp.shape[-1]
    kernel = functools.partial(
        _fusion_kernel, groups=groups, eps=eps, real_cout=cout,
        tap_dtype=jnp.bfloat16 if tap_dtype == "bfloat16" else jnp.float32,
    )
    img = lambda c: pl.BlockSpec(
        (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            img(cxp),
            img(clp),
            full(3, 3, cxp, coutp),
            full(3, 3, clp, coutp),
            full(1, coutp),
            full(1, coutp),
        ],
        out_specs=img(coutp),
        out_shape=jax.ShapeDtypeStruct((b, h, w, coutp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, w, coutp), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * 18 * h * w * (cxp + clp) * coutp,
            bytes_accessed=b * h * w * (cxp + clp + coutp) * 4,
            transcendentals=b * h * w * coutp,
        ),
    )(xp, latp, wxp, wlp, scalep, biasp)
    return out[..., :cout]


def _ffb_fwd(x, lat, wx, wl, scale, bias, groups, eps, interpret, tap_dtype):
    out = fused_fusion_block(
        x, lat, wx, wl, scale, bias, groups, eps, interpret, tap_dtype
    )
    return out, (x, lat, wx, wl, scale, bias)


def _ffb_bwd(groups, eps, interpret, tap_dtype, residuals, g):
    x, lat, wx, wl, scale, bias = residuals
    _, vjp = jax.vjp(
        lambda *args: _reference(*args, groups, eps), x, lat, wx, wl, scale, bias
    )
    return vjp(g)


fused_fusion_block.defvjp(_ffb_fwd, _ffb_bwd)
