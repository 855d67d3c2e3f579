"""Fused upsampling-block Pallas kernel (SURVEY.md §2.12 item 2).

The decoder's UpBlock (resize_conv flavor) is bilinear x2 upsample ->
3x3 conv -> GroupNorm -> ELU (models/blocks.py).  XLA materializes the
4x-sized upsampled tensor in HBM between the resize and the conv; this
kernel keeps it in VMEM:

- the clamp-edge bilinear x2 upsample is built with concat-shift
  algebra (parity planes r0 = 0.25*x[i-1] + 0.75*x[i], r1 = 0.75*x[i]
  + 0.25*x[i+1], interleaved by a leading-dim stack+reshape — no
  lane-dim reshapes, the Mosaic-safe form), written once to a VMEM
  scratch;
- the conv + GroupNorm + ELU then run exactly as in
  kernels/fusion_block.py (ref-slice shifted MXU matmuls into a
  scratch accumulator, reshape-free GN).

HBM traffic: read x + weights, write y — the 4x intermediate never
leaves the chip.

Only exact-2x shapes are fused (NYU's odd ladder sizes fall back to
XLA), and shapes whose working set exceeds the VMEM budget fall back
too (``fits_vmem``).  Backward = jax.custom_vjp via the XLA reference's
VJP.  Equivalence: tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdn_tpu.kernels.fusion_block import (
    _conv3x3_rolled, _groupnorm_elu, pad_lanes, tap_width,
)

# Conservative VMEM budget for scratch + transients (bytes).
_VMEM_BUDGET = 12 * 1024 * 1024
# Budget paired with the honest double-buffer accounting in fits_vmem
# (15 MB of the 16 MB scoped-VMEM hardware limit).
_VMEM_BUDGET_HONEST = 15 * 1024 * 1024


def fits_vmem(h: int, w: int, cin: int, cout: int) -> bool:
    """Working set of the fused kernel at input (h, w, cin), counting
    the 128-lane channel padding.  Rolled-conv form (round 3): input
    block + bordered upsample scratch + fp32 accumulator + weights; the
    per-tap transients of the unrolled form are gone.  Grid-streamed
    blocks (input, output) count TWICE — Mosaic double-buffers them
    (measured on hardware, conv_gn_elu.pick_batch_tile)."""
    cinp = -(-cin // 128) * 128
    coutp = -(-cout // 128) * 128
    up_pad = (2 * h + 2) * (tap_width(2 * w) + 8)
    work = (
        2 * h * w * cinp        # input block (2-buf)
        + up_pad * cinp         # bordered upsample scratch
        + 2 * h * tap_width(2 * w) * coutp      # accumulator scratch
        + 2 * 2 * h * tap_width(2 * w) * coutp  # output block (2-buf)
        + 9 * cinp * coutp      # weights
    )
    return work * 4 < _VMEM_BUDGET_HONEST


def _upsample2x_clamp(x):
    """(H, W, C) -> (2H, 2W, C) bilinear, half-pixel centers, edge clamp
    — identical to ops/resize.resize_bilinear at exactly 2x."""
    h, w, c = x.shape
    x_up = jnp.concatenate([x[:1], x[:-1]], axis=0)
    x_dn = jnp.concatenate([x[1:], x[-1:]], axis=0)
    r0 = 0.25 * x_up + 0.75 * x
    r1 = 0.75 * x + 0.25 * x_dn
    y = jnp.stack([r0, r1], axis=1).reshape(2 * h, w, c)
    y_lf = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
    y_rt = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)
    c0 = 0.25 * y_lf + 0.75 * y
    c1 = 0.75 * y + 0.25 * y_rt
    return jnp.stack([c0, c1], axis=2).reshape(2 * h, 2 * w, c)


def _upsample_kernel(
    x_ref, w_ref, scale_ref, bias_ref, out_ref, u_ref, acc_ref,
    *, groups, eps, real_cout, tap_dtype,
):
    h, w = x_ref.shape[1], x_ref.shape[2]
    c = x_ref.shape[3]
    up = _upsample2x_clamp(x_ref[0].astype(jnp.float32))  # (2H, 2W, C)
    # Build the bordered/aligned map _conv3x3_rolled expects by value
    # concatenation (Mosaic handles sublane-dim concats; static ref
    # STORES of misaligned extents do not lower, so no partial stores).
    wp_u = u_ref.shape[1]
    zrow = jnp.zeros((1, 2 * w, c), jnp.float32)
    up2 = jnp.concatenate([zrow, up, zrow], axis=0)  # (2H+2, 2W, C)
    zl = jnp.zeros((2 * h + 2, 1, c), jnp.float32)
    zr = jnp.zeros((2 * h + 2, wp_u - 2 * w - 1, c), jnp.float32)
    u_ref[...] = jnp.concatenate([zl, up2, zr], axis=1)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    _conv3x3_rolled(u_ref, w_ref, acc_ref, 2 * h, acc_ref.shape[1], tap_dtype)
    out_ref[0] = _groupnorm_elu(
        acc_ref[...], scale_ref[0].astype(jnp.float32),
        bias_ref[0].astype(jnp.float32), groups, eps, real_cout,
        real_w=2 * w,
    )


def _reference(x, w, scale, bias, groups, eps):
    """XLA reference: resize x2 (clamp bilinear) -> conv -> GN -> ELU."""
    from gdn_tpu.ops.resize import resize_bilinear

    b, h, wd, cin = x.shape
    u = resize_bilinear(x.astype(jnp.float32), (2 * h, 2 * wd))
    y = jax.lax.conv_general_dilated(
        u, w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    cout = y.shape[-1]
    yg = y.reshape(b, 4 * h * wd, groups, cout // groups)
    mean = jnp.mean(yg, axis=(1, 3), keepdims=True)
    var = jnp.mean((yg - mean) ** 2, axis=(1, 3), keepdims=True)
    yn = ((yg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, 2 * h, 2 * wd, cout)
    yn = yn * scale + bias
    return jnp.where(yn > 0, yn, jnp.expm1(yn))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_upsample_conv(
    x, w, scale, bias, groups: int = 8, eps: float = 1e-6,
    interpret: bool = False, tap_dtype: str = "float32",
):
    """Fused bilinear-2x upsample + conv3x3 + GroupNorm + ELU.

    Args: x (B, H, W, Cin); w (3, 3, Cin, Cout); scale/bias (Cout,).
    Returns (B, 2H, 2W, Cout) float32.
    """
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    # 128-lane channel padding (see fusion_block.pad_lanes).
    xp = pad_lanes(x, 3)
    wp = pad_lanes(pad_lanes(w, 2), 3)
    scalep = pad_lanes(scale.reshape(1, -1), 1)
    biasp = pad_lanes(bias.reshape(1, -1), 1)
    cinp, coutp = xp.shape[-1], wp.shape[-1]
    kernel = functools.partial(
        _upsample_kernel, groups=groups, eps=eps, real_cout=cout,
        tap_dtype=jnp.bfloat16 if tap_dtype == "bfloat16" else jnp.float32,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wd, cinp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cinp, coutp), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, coutp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, coutp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * h, tap_width(2 * wd), coutp), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, 2 * h, tap_width(2 * wd), coutp), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2 * h + 2, tap_width(2 * wd) + 8, cinp), jnp.float32
            ),
            pltpu.VMEM((2 * h, tap_width(2 * wd), coutp), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * (18 * 4 * h * wd * cinp * coutp + 12 * h * wd * cinp),
            bytes_accessed=b * (h * wd * cinp + 4 * h * wd * coutp) * 4,
            transcendentals=b * 4 * h * wd * coutp,
        ),
    )(xp, wp, scalep, biasp)
    return out[:, :, : 2 * wd, :cout]


def _fuc_fwd(x, w, scale, bias, groups, eps, interpret, tap_dtype):
    out = fused_upsample_conv(
        x, w, scale, bias, groups, eps, interpret, tap_dtype
    )
    return out, (x, w, scale, bias)


def _fuc_bwd(groups, eps, interpret, tap_dtype, residuals, g):
    x, w, scale, bias = residuals
    _, vjp = jax.vjp(
        lambda *args: _reference(*args, groups, eps), x, w, scale, bias
    )
    return vjp(g)


fused_upsample_conv.defvjp(_fuc_fwd, _fuc_bwd)
