"""Fused GroupNorm+ELU Pallas kernel — attacks the profiled step floor.

Round-2 profiling (BASELINE.md) showed the per-step batch-independent
cost is dominated by GroupNorm statistic reduce fusions (~85 µs of
latency EACH, ~95 of them) plus ELU selects — XLA leaves the chain
norm-stats → normalize → affine → ELU as 3-4 separate latency-bound
fusions per layer.  This kernel is ONE op per layer: a single VMEM pass
per image computes both moments, combines channels into groups with a
one-hot (C, G) MXU matmul (reshape-free — Mosaic cannot split/merge the
lane dim), normalizes, applies the affine + ELU, and writes once.

Layout: the caller reshapes (B, H, W, C) -> (B, N, L) where L is the
lane width (a leading-dim/row-major merge, done by XLA outside the
kernel).  When C divides 128 the rows are PACKED: L = 128 so every
lane is busy (C=16/32 narrow-lane blocks both waste the VPU and, at
C=32, failed Mosaic compilation outright); lane position j then holds
channel j % C, and the one-hot (L, G) group matrix is built per lane
position, so the statistics are exactly the per-group sums regardless
of packing.  For C >= 128 (multiples of 128) the natural L = C is used.

Backward = jax.custom_vjp via the XLA reference implementation's VJP
(same policy as kernels/fusion_block.py: the fused forward also serves
the no-grad D-net guidance pass of stage 2).  Equivalence with
ops/groupnorm.py is enforced by tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdn_tpu.ops.groupnorm import _group_matrix, group_norm_act


def _row_block(rows: int, target: int = 2048) -> int:
    """Largest divisor of ``rows`` that is <= target and a multiple of 8
    (sublane tile); falls back to ``rows`` (no chunking)."""
    if rows <= target:
        return rows
    for rb in range(target, 7, -1):
        if rows % rb == 0 and rb % 8 == 0:
            return rb
    return rows


def _gn_elu_kernel(x_ref, gmat_ref, scale_ref, bias_ref, out_ref,
                   *, eps, n_per_group, row_block):
    rows = x_ref.shape[1]
    gmat = gmat_ref[:]  # (lane, G) one-hot, fp32
    # Pass 1: moment partial sums over row blocks.  Chunking bounds the
    # fp32 transients: a monolithic (rows, lane) value graph blew scoped
    # VMEM at full resolution (Mosaic keeps the upcast copies live).
    s1 = jnp.zeros((1, x_ref.shape[2]), jnp.float32)
    s2 = jnp.zeros((1, x_ref.shape[2]), jnp.float32)
    for r0 in range(0, rows, row_block):
        xb = x_ref[0, r0 : r0 + row_block, :].astype(jnp.float32)
        s1 = s1 + jnp.sum(xb, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(xb * xb, axis=0, keepdims=True)
    mean_g = jnp.dot(s1, gmat, preferred_element_type=jnp.float32) / n_per_group
    ex2_g = jnp.dot(s2, gmat, preferred_element_type=jnp.float32) / n_per_group
    # clamp: cancellation can dip below zero -> rsqrt NaN (see ops/groupnorm)
    var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, gmat.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, gmat.T, preferred_element_type=jnp.float32)
    scale_c = inv_c * scale_ref[:]
    # Pass 2: normalize + affine + ELU per row block (x stays in VMEM;
    # the blocks only bound fp32 transients, not HBM traffic).
    for r0 in range(0, rows, row_block):
        xb = x_ref[0, r0 : r0 + row_block, :].astype(jnp.float32)
        yn = (xb - mean_c) * scale_c + bias_ref[:]
        # ELU; exp(x)-1 instead of expm1 (no Mosaic expm1 lowering)
        y = jnp.where(yn > 0, yn, jnp.exp(jnp.minimum(yn, 0.0)) - 1.0)
        out_ref[0, r0 : r0 + row_block, :] = y.astype(out_ref.dtype)


def _reference(x, scale, bias, groups, eps):
    """XLA reference: ops/groupnorm 'grouped' + ELU (fp32 stats)."""
    import flax.linen as nn

    return group_norm_act(
        x, scale, bias, groups, activation=nn.elu, impl="grouped", eps=eps
    )


def _lane_layout(hw: int, c: int):
    """(rows, lane) packing for one (HW, C) image: full 128 lanes when
    C divides 128 and the element count allows; else the natural C."""
    if c % 128 == 0:
        return hw, c, 1
    if 128 % c == 0:
        pack = 128 // c
        if hw % pack == 0:
            return hw // pack, 128, pack
    return hw, c, 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm_elu(
    x, scale, bias, groups: int = 8, eps: float = 1e-6,
    interpret: bool = False,
):
    """Fused GroupNorm + ELU.

    Args:
      x: (B, H, W, C) any float dtype; stats in fp32, output in x.dtype.
      scale/bias: (C,) fp32 affine.
    Returns (B, H, W, C) in x.dtype.
    """
    b, h, w, c = x.shape
    assert c % groups == 0, (c, groups)
    hw = h * w
    rows, lane, pack = _lane_layout(hw, c)
    # Row-major merges/splits only — XLA-side, never inside the kernel.
    x2 = x.reshape(b, rows, lane)
    cg = c // groups
    # one-hot (lane, G): lane position j holds channel j % c
    base = _group_matrix(c, groups)  # (C, G)
    gmat = jnp.asarray(
        base if pack == 1 else
        jnp.tile(jnp.asarray(base), (pack, 1))
    )
    scale_l = jnp.tile(scale.astype(jnp.float32), pack).reshape(1, lane)
    bias_l = jnp.tile(bias.astype(jnp.float32), pack).reshape(1, lane)
    kernel = functools.partial(
        _gn_elu_kernel, eps=eps, n_per_group=float(hw * cg),
        row_block=_row_block(rows),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, lane), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lane, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lane), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lane), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, lane), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, lane), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * hw * c * 12,
            bytes_accessed=b * hw * c * 2 * x.dtype.itemsize,
            transcendentals=b * hw * c,
        ),
    )(x2, gmat, scale_l, bias_l)
    return out.reshape(b, h, w, c)


def fits_vmem(h: int, w: int, c: int, itemsize: int = 4) -> bool:
    """Input + output blocks per image within the VMEM budget, with the
    fp32 transient bound taken from the ACTUAL row block the kernel
    will use (the fallback rb=rows is unbounded)."""
    rows, lane, _ = _lane_layout(h * w, c)
    rb = _row_block(rows)
    return (
        rows * lane * 2 * itemsize + 4 * rb * lane * 4
        < 12 * 1024 * 1024
    )


def kernel_supported(h: int, w: int, c: int, itemsize: int = 4) -> bool:
    """Full gate for fused_group_norm_elu on TPU: VMEM budget AND a lane
    layout Mosaic compiles (narrow unpacked lanes failed outright at
    C=32; C>=64 compiles)."""
    _, lane, _ = _lane_layout(h * w, c)
    return lane >= 64 and fits_vmem(h, w, c, itemsize)


def _gn_fwd(x, scale, bias, groups, eps, interpret):
    out = fused_group_norm_elu(x, scale, bias, groups, eps, interpret)
    return out, (x, scale, bias)


def _gn_bwd(groups, eps, interpret, residuals, g):
    x, scale, bias = residuals
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _reference(x_, s_, b_, groups, eps),
        x, scale, bias,
    )
    return vjp(g)


fused_group_norm_elu.defvjp(_gn_fwd, _gn_bwd)
