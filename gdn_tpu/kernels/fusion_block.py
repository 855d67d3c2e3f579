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


def _conv3x3_rolled(src_ref, w_ref, acc_ref, h, w, tap_dtype=jnp.float32):
    """Accumulate a SAME-padded 3x3 conv into acc_ref (H, W, Cout) from
    a SPATIALLY PRE-PADDED src_ref (H+2, W+2, Cin, zero border) via
    shifted MXU matmuls.

    Rolled form (VERDICT r2 item 5): the row offset dy is a
    ``fori_loop`` index — a dynamic-*major*-start ref slice, which
    Mosaic lowers cheaply — and only the 3 column taps are unrolled as
    static sublane slices.  The previous fully-unrolled 9-tap graph
    (with per-tap varying extents) emitted MLIR large enough to
    OOM-kill the axon compile helper; this form is ~3x smaller, and
    because the source is pre-padded every tap covers the full (H, W)
    window, so accumulator updates are full-extent (no shifted patches
    kept live).

    tap_dtype=bfloat16 runs each tap as a single-pass bf16 MXU matmul
    (fp32 accumulate) — 3x fewer MXU passes than fp32 inputs, matching
    the bf16 compute dtype of the surrounding flax model."""

    def body(dy, _):
        for dx in range(3):
            src = src_ref[pl.ds(dy, h), dx:dx + w, :].astype(tap_dtype)
            wtap = w_ref[pl.ds(dy, 1), dx].reshape(
                w_ref.shape[2], w_ref.shape[3]
            ).astype(tap_dtype)
            acc_ref[...] += jax.lax.dot_general(
                src, wtap,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return 0

    jax.lax.fori_loop(0, 3, body, 0)


def round8(n: int) -> int:
    """Round up to the sublane tile (8) — Mosaic requires static
    sublane-dim slice extents aligned to 8 (observed: 'Slice shape
    along dimension 2 must be aligned to tiling (8), but is 28')."""
    return -(-n // 8) * 8


def tap_width(w: int) -> int:
    """Aligned tap extent for a real width ``w``."""
    return round8(w)


def pad_spatial1(x):
    """Zero-pad (B, H, W, C) for the _conv3x3_rolled contract: +1 row
    top/bottom; columns padded left by 1 and right up to
    ``tap_width(W) + 8`` total so every dx in {0,1,2} can read an
    8-aligned ``tap_width(W)``-wide slice that stays in bounds."""
    w = x.shape[2]
    wp = tap_width(w) + 8
    return jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))


def _groupnorm_elu(y, scale, bias, groups, eps, real_c, real_w=None):
    """Reshape-free GroupNorm + ELU on (H, W_e, Cpad) where only the
    first `real_c` channels and (optionally) the first `real_w` columns
    are real (zero padding to 128-lane / 8-sublane boundaries).  Group
    sums via a (Cpad, G) one-hot matmul whose rows are zero for padded
    channels; padded columns are masked to zero before the moments (the
    conv DOES write non-zero values into column real_w — it sees the
    real column real_w-1 through its left tap), so the statistics see
    only real pixels.  Padded-column outputs are garbage and must be
    sliced away by the caller."""
    h, w, c = y.shape
    if real_w is not None and real_w < w:
        colmask = (
            jax.lax.broadcasted_iota(jnp.int32, (w, c), 0) < real_w
        ).astype(jnp.float32)
        y = y * colmask
        n_cols = real_w
    else:
        n_cols = w
    cg = real_c // groups
    cid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    gid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    real = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) < real_c
    gmat = ((cid == gid) & real).astype(jnp.float32)  # (Cpad, G)
    n = jnp.float32(h * n_cols * cg)
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


def fits_vmem(h: int, w: int, cx: int, cl: int, cout: int) -> bool:
    """Scoped-VMEM gate for the fused fusion block (measured limit:
    16 MB scoped; the (64,208,32ch) decoder shape needs 20.4 MB once
    channels pad to 128 lanes and is rejected by the TPU compiler).
    Working set per grid step: both pre-padded inputs + weights + the
    fp32 accumulator scratch + the output block.  Grid-streamed blocks
    (inputs, output) count TWICE — Mosaic double-buffers them (measured
    on hardware, conv_gn_elu.pick_batch_tile)."""
    cxp = -(-cx // 128) * 128
    clp = -(-cl // 128) * 128
    coutp = -(-cout // 128) * 128
    wp = tap_width(w) + 8
    ins = 2 * (h + 2) * wp * (cxp + clp)      # input blocks (2-buf)
    weights = 9 * (cxp + clp) * coutp
    acc = h * tap_width(w) * coutp            # scratch (single)
    out = 2 * h * tap_width(w) * coutp        # output block (2-buf)
    return (ins + weights + acc + out) * 4 < 15 * 1024 * 1024


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
    *, groups, eps, real_cout, real_w, tap_dtype,
):
    # inputs arrive spatially pre-padded (pad_spatial1): rows +1/+1,
    # cols padded out to tap_width(real_w) + 8
    h, w_e = out_ref.shape[1], out_ref.shape[2]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    _conv3x3_rolled(x_ref.at[0], wx_ref, acc_ref, h, w_e, tap_dtype)
    _conv3x3_rolled(lat_ref.at[0], wl_ref, acc_ref, h, w_e, tap_dtype)
    out_ref[0] = _groupnorm_elu(
        acc_ref[...], scale_ref[0].astype(jnp.float32),
        bias_ref[0].astype(jnp.float32), groups, eps, real_cout,
        real_w=real_w,
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
    xp = pad_spatial1(pad_lanes(x, 3))
    latp = pad_spatial1(pad_lanes(lat, 3))
    wxp = pad_lanes(pad_lanes(wx, 2), 3)
    wlp = pad_lanes(pad_lanes(wl, 2), 3)
    scalep = pad_lanes(scale.reshape(1, -1), 1)
    biasp = pad_lanes(bias.reshape(1, -1), 1)
    cxp, clp, coutp = xp.shape[-1], latp.shape[-1], wxp.shape[-1]
    w_e = tap_width(w)
    wp = xp.shape[2]
    kernel = functools.partial(
        _fusion_kernel, groups=groups, eps=eps, real_cout=cout, real_w=w,
        tap_dtype=jnp.bfloat16 if tap_dtype == "bfloat16" else jnp.float32,
    )
    img = lambda hh, ww, c: pl.BlockSpec(
        (1, hh, ww, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            img(h + 2, wp, cxp),
            img(h + 2, wp, clp),
            full(3, 3, cxp, coutp),
            full(3, 3, clp, coutp),
            full(1, coutp),
            full(1, coutp),
        ],
        out_specs=img(h, w_e, coutp),
        out_shape=jax.ShapeDtypeStruct((b, h, w_e, coutp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, w_e, coutp), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * 18 * h * w * (cxp + clp) * coutp,
            bytes_accessed=b * h * w * (cxp + clp + coutp) * 4,
            transcendentals=b * h * w * coutp,
        ),
    )(xp, latp, wxp, wlp, scalep, biasp)
    return out[:, :, :w, :cout]


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
