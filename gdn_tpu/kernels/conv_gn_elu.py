"""Epilogue-fused conv3x3 + GroupNorm + ELU Pallas kernel.

Attacks the round-2 profiled step floor from the conv side (VERDICT r2
item 2): XLA executes each ConvBlock as conv -> (write y) -> stat
reduces (read y) -> normalize+ELU fusion (read y, write out) — the
feature map round-trips HBM twice and the chain carries 4-5 ops of
~85 µs latency each.  This kernel is ONE op per layer: the 3x3 conv
accumulates in VMEM (rolled shifted-tap MXU matmuls, shared with
kernels/fusion_block.py), both GN moments are computed while the tile
is resident, and the normalized+activated result is the only HBM
write.  HBM traffic: read x + weights, write out.

Scope: stride-1 SAME convs with group norm + ELU — the ConvBlock
configuration of every encoder refining conv and the stem.  Wide
channels (>= 128 lanes) pay no MXU padding tax; the narrow decoder
widths are where the round-1 fusion kernel lost to XLA, so the gate
(``supported``) only admits lane-aligned widths.

Backward = jax.custom_vjp via the XLA reference (fwd-only fusion; same
policy as the other kernels).  Equivalence: tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdn_tpu.kernels.fusion_block import (
    _conv3x3_rolled, _groupnorm_elu, pad_lanes, pad_spatial1, tap_width,
)

_VMEM_BUDGET = 12 * 1024 * 1024


def supported(h: int, w: int, cin: int, cout: int) -> bool:
    """Lane-aligned channels (no 128-pad tax) and VMEM fit per image."""
    if cin % 128 or cout % 128:
        return False
    wp = tap_width(w) + 8
    work = ((h + 2) * wp * cin + 2 * h * tap_width(w) * cout
            + 9 * cin * cout) * 4
    return work < _VMEM_BUDGET


def _kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, acc_ref,
            *, groups, eps, real_cout, real_w, tap_dtype):
    h, w_e = out_ref.shape[1], out_ref.shape[2]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    _conv3x3_rolled(x_ref.at[0], w_ref, acc_ref, h, w_e, tap_dtype)
    out_ref[0] = _groupnorm_elu(
        acc_ref[...], scale_ref[0].astype(jnp.float32),
        bias_ref[0].astype(jnp.float32), groups, eps, real_cout,
        real_w=real_w,
    )


def _reference(x, w, scale, bias, groups, eps):
    """XLA reference: conv3x3 SAME -> GroupNorm(grouped) -> ELU."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_conv_gn_elu(
    x, w, scale, bias, groups: int = 8, eps: float = 1e-6,
    interpret: bool = False, tap_dtype: str = "float32",
):
    """Fused conv3x3(stride 1, SAME) + GroupNorm + ELU.

    Args: x (B, H, W, Cin); w (3, 3, Cin, Cout); scale/bias (Cout,).
    Returns (B, H, W, Cout) float32.
    """
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = pad_spatial1(pad_lanes(x, 3))
    wp = pad_lanes(pad_lanes(w, 2), 3)
    scalep = pad_lanes(scale.reshape(1, -1), 1)
    biasp = pad_lanes(bias.reshape(1, -1), 1)
    cinp, coutp = xp.shape[-1], wp.shape[-1]
    w_e = tap_width(wd)
    wdp = xp.shape[2]
    kernel = functools.partial(
        _kernel, groups=groups, eps=eps, real_cout=cout, real_w=wd,
        tap_dtype=jnp.bfloat16 if tap_dtype == "bfloat16" else jnp.float32,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2, wdp, cinp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cinp, coutp), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, coutp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, coutp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w_e, coutp), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_e, coutp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, w_e, coutp), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * 18 * h * wd * cinp * coutp,
            bytes_accessed=b * h * wd * (cinp + coutp) * 4,
            transcendentals=b * h * wd * coutp,
        ),
    )(xp, wp, scalep, biasp)
    return out[:, :, :wd, :cout]


def _fwd(x, w, scale, bias, groups, eps, interpret, tap_dtype):
    out = fused_conv_gn_elu(
        x, w, scale, bias, groups, eps, interpret, tap_dtype
    )
    return out, (x, w, scale, bias)


def _bwd(groups, eps, interpret, tap_dtype, residuals, g):
    x, w, scale, bias = residuals
    _, vjp = jax.vjp(
        lambda *args: _reference(*args, groups, eps), x, w, scale, bias
    )
    return vjp(g)


fused_conv_gn_elu.defvjp(_fwd, _bwd)
