"""GroupNorm (+ fused activation) — the profiled hot spot of the nets.

Round-2 profiling (BASELINE.md "Profile-backed decomposition") showed
the G-net forward spends ~8-10 ms/step in GroupNorm statistic reduce
fusions and ~3 ms in ELU selects, nearly independent of batch size —
each XLA reduce fusion carries ~85 µs of latency, so the chains are
op-latency-bound, not bandwidth-bound.  This module centralizes the GN
math (previously duplicated between flax ``nn.GroupNorm`` in ConvBlock
and ``_group_norm_act`` in models/blocks.py) and offers two XLA
formulations selected by ``ModelConfig.gn_impl``:

- ``grouped``  (default): reshape to (B, HW, G, C/G), reduce over axes
  (1, 3) — the natural formulation, what flax does.
- ``chanreduce``: reduce (B, HW, C) over the single contiguous HW axis
  to (B, C) sums, then combine channels into groups with a tiny one-hot
  (C, G) matmul.  Reductions over one major axis lower to cleaner TPU
  reduce kernels than the strided (1, 3)-axis pair.
(A "both moments in ONE variadic lax.reduce pass" variant was tried
and measured 2x SLOWER end-to-end on TPU — variadic reduces fall out
of XLA's fusion path and materialize fp32 copies; keep the two fused
single-operand reduces.)

Both are numerically equivalent (tests/test_ops.py) — statistics in
float32, full-resolution elementwise math in the input dtype.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def pick_groups(features: int, preferred: int) -> int:
    """Largest divisor of ``features`` that is <= preferred (>=1) — the
    shared group-count rule for every GN site (blocks.py)."""
    g = max(1, min(preferred, features))
    while features % g:
        g -= 1
    return g


def _group_matrix(c: int, groups: int) -> np.ndarray:
    """(C, G) one-hot channel→group matrix (fp32, trace-time constant)."""
    return np.kron(np.eye(groups), np.ones((c // groups, 1))).astype(
        np.float32
    )


def group_norm_act(
    y: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    impl: str = "grouped",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm over (B, H, W, C) + optional fused activation.

    Statistics accumulate in float32 (tiny (B, G) tensors); all
    full-resolution elementwise math stays in ``y.dtype`` (the train
    step is HBM-bound; fp32 intermediates would double the bytes).
    E[y^2]-mean^2 is clamped >= 0: float cancellation can dip negative
    and a negative operand makes rsqrt NaN (observed at full res ~step
    150 in round 1).
    """
    b, h, w, c = y.shape
    if impl == "chanreduce":
        cg = c // groups
        yf = y.reshape(b, h * w, c)
        s1 = jnp.sum(yf, axis=1, dtype=jnp.float32)  # (B, C)
        s2 = jnp.sum(jnp.square(yf.astype(jnp.float32)), axis=1)
        gmat = jnp.asarray(_group_matrix(c, groups))
        n = h * w * cg
        mean_g = (s1 @ gmat) / n  # (B, G)
        ex2_g = (s2 @ gmat) / n
        var_g = jnp.maximum(ex2_g - jnp.square(mean_g), 0.0)
        inv_g = jax.lax.rsqrt(var_g + eps)
        mean_c = (mean_g @ gmat.T).astype(y.dtype)  # (B, C)
        inv_c = (inv_g @ gmat.T).astype(y.dtype)
        yn = (yf - mean_c[:, None, :]) * inv_c[:, None, :]
        yn = yn.reshape(b, h, w, c)
    elif impl == "grouped":
        # Two-pass variance E[(y-mean)^2]: numerically stabler than the
        # single-pass E[y^2]-mean^2 (no cancellation → no clamp needed),
        # matching flax GroupNorm bit-behavior; costs one extra read of
        # the tensor, which is why "chanreduce" (above) and the Pallas
        # kernel use the single-pass form for speed.
        cg = c // groups
        yg = y.reshape(b, h * w, groups, cg)
        mean = jnp.mean(yg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
        var = jnp.mean(
            jnp.square(yg.astype(jnp.float32) - mean), axis=(1, 3),
            keepdims=True, dtype=jnp.float32,
        )
        inv = jax.lax.rsqrt(var + eps)
        yn = (yg - mean.astype(yg.dtype)) * inv.astype(yg.dtype)
        yn = yn.reshape(b, h, w, c)
    else:
        raise ValueError(f"unknown gn_impl {impl!r}")
    yn = yn * scale.astype(y.dtype) + bias.astype(y.dtype)
    return activation(yn) if activation is not None else yn


# ---------------------------------------------------------------------------
# Analytic custom-VJP GroupNorm+ELU (ModelConfig.gn_analytic_vjp)
#
# The GN statistic chains are the profiled residual of the step floor
# (BASELINE.md round-3 closing profile: 18.5 ms of convert_reduce_fusion
# at B=128).  Autodiff of the chanreduce graph saves the conv output y
# AND the ELU pre-activation as residuals and emits separate reduce
# chains for d_scale, d_bias and the two group means.  The analytic pair
# below instead:
#   - saves only yn (normalized, compute dtype) + the tiny (B, C) fp32
#     inv — the conv output y and the ELU exp are never materialized for
#     the backward;
#   - needs only TWO full-tensor reduces in the backward (S_dz, S_dzyn):
#     because d_yn = dz * scale is channelwise-linear in dz, the group
#     means AND d_scale/d_bias are all tiny contractions of those two
#     (B, C) partial sums.
# Forward math is bit-identical to group_norm_act(impl="chanreduce",
# activation=elu).  Gradient deviates from autodiff only where the
# var>=0 clamp is active (degenerate all-equal groups).
# ---------------------------------------------------------------------------


def _gn_elu_impl(y, scale, bias, groups: int, eps: float):
    b, h, w, c = y.shape
    cg = c // groups
    yf = y.reshape(b, h * w, c)
    s1 = jnp.sum(yf, axis=1, dtype=jnp.float32)  # (B, C)
    s2 = jnp.sum(jnp.square(yf.astype(jnp.float32)), axis=1)
    gmat = jnp.asarray(_group_matrix(c, groups))
    n = h * w * cg
    mean_g = (s1 @ gmat) / n  # (B, G)
    ex2_g = (s2 @ gmat) / n
    var_g = jnp.maximum(ex2_g - jnp.square(mean_g), 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = (mean_g @ gmat.T).astype(y.dtype)  # (B, C)
    inv_c32 = inv_g @ gmat.T  # (B, C) fp32 — kept as the residual
    yn = (yf - mean_c[:, None, :]) * inv_c32.astype(y.dtype)[:, None, :]
    yn = yn.reshape(b, h, w, c)
    z = yn * scale.astype(y.dtype) + bias.astype(y.dtype)
    return jax.nn.elu(z), yn, inv_c32


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm_elu_analytic(
    y: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm + ELU with a hand-written minimal-residual backward.

    Value-identical to ``group_norm_act(y, scale, bias, groups,
    activation=elu, impl="chanreduce")``; see the block comment above
    for why the backward is cheaper than autodiff's.
    """
    a, _, _ = _gn_elu_impl(y, scale, bias, groups, eps)
    return a


def _gn_elu_fwd(y, scale, bias, groups: int, eps: float):
    a, yn, inv_c32 = _gn_elu_impl(y, scale, bias, groups, eps)
    return a, (yn, inv_c32, scale, bias)


def _gn_elu_bwd(groups: int, eps: float, res, da):
    yn, inv_c32, scale, bias = res
    b, h, w, c = yn.shape
    cg = c // groups
    dt = yn.dtype
    sc = scale.astype(dt)
    z = yn * sc + bias.astype(dt)
    # ELU'(z) = 1 for z > 0 else exp(z); exp(min(z, 0)) avoids overflow.
    dz = jnp.where(z > 0, da, da * jnp.exp(jnp.minimum(z, 0)))
    dzf = dz.reshape(b, h * w, c)
    ynf = yn.reshape(b, h * w, c)
    # The ONLY full-tensor reductions of the backward (elementwise math
    # in the compute dtype, accumulation fp32 — same policy as forward).
    s_dz = jnp.sum(dzf, axis=1, dtype=jnp.float32)  # (B, C)
    s_dzyn = jnp.sum(dzf * ynf, axis=1, dtype=jnp.float32)  # (B, C)
    dbias = jnp.sum(s_dz, axis=0)
    dscale = jnp.sum(s_dzyn, axis=0)
    gmat = jnp.asarray(_group_matrix(c, groups))
    n = h * w * cg
    scale32 = scale.astype(jnp.float32)
    # mean over the group of d_yn and of d_yn*yn, expanded to channels.
    m1_c = (((s_dz * scale32) @ gmat) / n) @ gmat.T  # (B, C)
    m2_c = (((s_dzyn * scale32) @ gmat) / n) @ gmat.T
    dyf = (
        dzf * sc
        - m1_c.astype(dt)[:, None, :]
        - ynf * m2_c.astype(dt)[:, None, :]
    ) * inv_c32.astype(dt)[:, None, :]
    return dyf.reshape(b, h, w, c), dscale, dbias


group_norm_elu_analytic.defvjp(_gn_elu_fwd, _gn_elu_bwd)
