"""Fused GroupNorm+ELU Pallas kernel — attacks the profiled step floor.

Round-2 profiling (BASELINE.md) showed the per-step batch-independent
cost is dominated by GroupNorm statistic reduce fusions (~85 µs of
latency EACH, ~95 of them) plus ELU selects — XLA leaves the chain
norm-stats → normalize → affine → ELU as 3-4 separate latency-bound
fusions per layer.  This kernel is ONE op per layer: a single VMEM pass
per image computes both moments, combines channels into groups with a
one-hot (C, G) MXU matmul (reshape-free — Mosaic cannot split/merge the
lane dim), normalizes, applies the affine + ELU, and writes once.

Layout: the caller reshapes (B, H, W, C) -> (B, H*W, C) (a leading-dim
merge, Mosaic/XLA-safe) so each grid program owns one (HW, C) image:
sublane reductions along HW are the efficient TPU axis, and C stays on
the lanes untouched.

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


def _gn_elu_kernel(x_ref, gmat_ref, scale_ref, bias_ref, out_ref,
                   *, eps, n_per_group):
    x = x_ref[0]  # (HW, C), input dtype
    xf = x.astype(jnp.float32)
    gmat = gmat_ref[:]  # (C, G) one-hot, fp32
    s1 = jnp.sum(xf, axis=0, keepdims=True)            # (1, C)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)       # (1, C)
    mean_g = jnp.dot(s1, gmat, preferred_element_type=jnp.float32) / n_per_group
    ex2_g = jnp.dot(s2, gmat, preferred_element_type=jnp.float32) / n_per_group
    # clamp: cancellation can dip below zero -> rsqrt NaN (see ops/groupnorm)
    var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, gmat.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, gmat.T, preferred_element_type=jnp.float32)
    yn = (xf - mean_c) * inv_c * scale_ref[:] + bias_ref[:]
    # ELU; exp(x)-1 instead of expm1 (no Mosaic expm1 lowering)
    y = jnp.where(yn > 0, yn, jnp.exp(jnp.minimum(yn, 0.0)) - 1.0)
    out_ref[0] = y.astype(out_ref.dtype)


def _reference(x, scale, bias, groups, eps):
    """XLA reference: ops/groupnorm 'grouped' + ELU (fp32 stats)."""
    import flax.linen as nn

    return group_norm_act(
        x, scale, bias, groups, activation=nn.elu, impl="grouped", eps=eps
    )


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
    x2 = x.reshape(b, hw, c)  # leading-dim merge: Mosaic/XLA-safe
    gmat = jnp.asarray(_group_matrix(c, groups))
    kernel = functools.partial(
        _gn_elu_kernel, eps=eps, n_per_group=float(hw * (c // groups))
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * hw * c * 12,
            bytes_accessed=b * hw * c * 2 * x.dtype.itemsize,
            transcendentals=b * hw * c,
        ),
    )(x2, gmat, scale.reshape(1, c).astype(jnp.float32),
      bias.reshape(1, c).astype(jnp.float32))
    return out.reshape(b, h, w, c)


def fits_vmem(h: int, w: int, c: int, itemsize: int = 4) -> bool:
    """Input block + fp32 working copy per image within the VMEM budget."""
    return h * w * c * (itemsize + 8) < 12 * 1024 * 1024


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
