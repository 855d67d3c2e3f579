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
# Budget for the bt/s2 pickers, whose accounting includes Mosaic's
# double-buffering of streamed blocks (measured honest to ~5%, always
# conservative): 15 MB of the 16 MB scoped-VMEM hardware limit.
_VMEM_BUDGET_BT = 15 * 1024 * 1024


def supported(h: int, w: int, cin: int, cout: int) -> bool:
    """Lane-aligned channels (no 128-pad tax) and VMEM fit per image.

    Streamed blocks (the per-image input and output) count TWICE:
    Mosaic double-buffers grid-streamed operands/results (measured on
    hardware — see pick_batch_tile below)."""
    if cin % 128 or cout % 128:
        return False
    wp = tap_width(w) + 8
    work = (2 * (h + 2) * wp * cin           # input block (2-buf)
            + 3 * h * tap_width(w) * cout    # acc scratch + output (2-buf)
            + 9 * cin * cout) * 4
    return work < _VMEM_BUDGET_BT


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


def _reference(x, w, scale, bias, groups, eps, strides=(1, 1)):
    """XLA reference: conv3x3 SAME -> GroupNorm(grouped) -> ELU."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), strides, "SAME",
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


# ---------------------------------------------------------------------------
# v2: batch-tiled + column-packed + analytic-VJP fused conv3x3+GN+ELU
#
# The round-3 per-image kernel above closed VERDICT r2 item 2 as a
# measured negative for two structural reasons (BASELINE.md):
#   1. grid=(B,) serializes B tiny matmuls per tap — at B=128 the MXU
#      never fills ("per-image grid underfill");
#   2. narrow channels (C=32/64 — the blocks holding most of the GN stat
#      bytes) required pad_lanes to 128, a 4x/2x padded HBM copy that
#      erased the fusion win ("128-lane padding tax");
#   3. its backward recomputed the XLA reference forward.
# This variant removes all three:
#   1. BATCH TILING: T images' spatially pre-padded rows are stacked
#      along the row axis (each image carries its own zero border, so a
#      dy-shifted tap never mixes images) and each of the 9 tap matmuls
#      contracts over the full (T*(H+2), W_e) row block — T x larger MXU
#      ops, grid=(B/T,).
#   2. COLUMN PACKING: for C < 128 the (H, W, C) map is viewed as
#      (H, W/p, p*C) — a free, contiguous XLA reshape, NOT a padded
#      copy — and the 3x3 conv becomes 9 packed taps with
#      block-structured weights Wp[dy,dp][(a*Cin+ci),(b*Cout+co)] =
#      K[dy, dp*p+a-b+1, ci, co]: same tap count, 128 busy lanes, and
#      HBM traffic of exactly the real tensor.
#   3. ANALYTIC VJP: the backward never recomputes the forward — it is
#      the ops/groupnorm.py group_norm_elu_analytic backward (output-
#      form ELU', two full-tensor reduces) followed by the standard XLA
#      conv input/weight gradients, with residuals (yn, inv) emitted by
#      the forward kernel itself.
# ---------------------------------------------------------------------------


def _pack_factor(cin: int, cout: int) -> int:
    """Smallest p making both p*cin and p*cout multiples of 128 lanes."""
    p = 1
    while (p * cin) % 128 or (p * cout) % 128:
        p *= 2
        if p > 128:
            raise ValueError(f"unpackable channels {cin}->{cout}")
    return p


def _pack_weights(k: jnp.ndarray, p: int) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (3, 3, p*Cin, p*Cout) column-packed taps.

    Output col J of the packed layout holds real cols J*p+b; tap dp of
    packed input col J+dp lane (a*Cin+ci) contributes K[dy, dx, ci, co]
    with dx = dp*p + a - b + 1 when 0 <= dx < 3 (algebra verified
    against lax.conv in tests)."""
    if p == 1:
        return k
    import numpy as np

    sel = np.zeros((3, p, p, 3), np.float32)  # (dp, a, b, dx)
    for dpi, dp in enumerate((-1, 0, 1)):
        for a in range(p):
            for b in range(p):
                dx = dp * p + a - b + 1
                if 0 <= dx < 3:
                    sel[dpi, a, b, dx] = 1.0
    wp = jnp.einsum("yxio,pabx->ypaibo", k, jnp.asarray(sel))
    return wp.reshape(3, 3, p * k.shape[2], p * k.shape[3])


def pick_batch_tile(
    b: int, h: int, w: int, cin: int, cout: int,
    budget: int = _VMEM_BUDGET_BT,
) -> int:
    """Largest T in {8,4,2,1} dividing b whose working set fits VMEM."""
    p = _pack_factor(cin, cout)
    li, lo = p * cin, p * cout
    wpk = w // p
    w_e = tap_width(wpk)
    wp_cols = w_e + 8
    for t in (8, 4, 2, 1):
        if b % t:
            continue
        rows = t * (h + 2)
        # Mosaic DOUBLE-BUFFERS grid-streamed operands/results (measured
        # on-TPU: the t=4 16x52x256 case allocates bf16[2,74,64,256] for
        # the input window and OOMs scoped VMEM at 16.71/16.00 MB) — so
        # streamed blocks count twice; only scratch + weights are single.
        work = (
            2 * (rows + 2) * wp_cols * li * 2  # input block (bf16, 2-buf)
            + rows * w_e * lo * 4              # fp32 accumulator scratch
            + 2 * 2 * rows * w_e * lo * 2      # a + yn outputs (bf16, 2-buf)
            + 9 * li * lo * 2                  # packed weights (bf16)
        )
        if work < budget:
            return t
    return 0


def supported_bt(b: int, h: int, w: int, cin: int, cout: int) -> bool:
    """Gate: packable channels, packed width divisible, VMEM fit."""
    try:
        p = _pack_factor(cin, cout)
    except ValueError:
        return False
    if w % p:
        return False
    return pick_batch_tile(b, h, w, cin, cout) > 0


def _kernel_bt(x_ref, w_ref, scale_ref, bias_ref, a_ref, yn_ref, inv_ref,
               acc_ref, *, groups, eps, cout, pack, img_h, wpk, t,
               tap_dtype, out_dtype):
    """One grid step: T stacked images -> conv taps -> per-image GN
    stats -> normalize + affine + ELU -> (a, yn, inv)."""
    rows = acc_ref.shape[0]          # T*(img_h+2)
    w_e, lo = acc_ref.shape[1], acc_ref.shape[2]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    # x_ref: (rows+2, wp, L_in) — row r of acc reads x rows r..r+2.
    _conv3x3_rolled(x_ref.at[0], w_ref, acc_ref, rows, w_e, tap_dtype)
    acc = acc_ref[...]               # (rows, w_e, L_out) fp32

    # --- per-image GroupNorm statistics (masked to real cols/rows) ---
    colmask = (
        jax.lax.broadcasted_iota(jnp.int32, (w_e, lo), 0) < wpk
    ).astype(jnp.float32)
    y = acc * colmask
    rs1 = jnp.sum(y, axis=1)         # (rows, L)
    rs2 = jnp.sum(y * y, axis=1)
    hp2 = img_h + 2
    # valid rows are 1..img_h inside each image's (img_h+2) band
    rix = jax.lax.broadcasted_iota(jnp.int32, (t, hp2, lo), 1)
    rmask = ((rix >= 1) & (rix <= img_h)).astype(jnp.float32)
    s1 = jnp.sum(rs1.reshape(t, hp2, lo) * rmask, axis=1)   # (T, L)
    s2 = jnp.sum(rs2.reshape(t, hp2, lo) * rmask, axis=1)
    # lane -> group one-hot: packed lane j holds channel j % cout
    cg = cout // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (lo, groups), 0) % cout
    gid = jax.lax.broadcasted_iota(jnp.int32, (lo, groups), 1)
    gmat = ((ch // cg) == gid).astype(jnp.float32)          # (L, G)
    n = jnp.float32(img_h * wpk * pack * cg)
    mean_g = jnp.dot(s1, gmat, preferred_element_type=jnp.float32) / n
    ex2_g = jnp.dot(s2, gmat, preferred_element_type=jnp.float32) / n
    var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, gmat.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, gmat.T, preferred_element_type=jnp.float32)
    # (T, L) fp32 residual, zero-padded to the 8-sublane block tile
    inv_ref[0] = jnp.pad(inv_c, ((0, 8 - t), (0, 0)))

    # --- normalize + affine + ELU, write valid rows per image ---
    mean_r = jnp.broadcast_to(mean_c[:, None, :], (t, hp2, lo)).reshape(
        rows, lo
    )
    inv_r = jnp.broadcast_to(inv_c[:, None, :], (t, hp2, lo)).reshape(
        rows, lo
    )
    yn = (acc - mean_r[:, None, :]) * inv_r[:, None, :]
    z = yn * scale_ref[...] + bias_ref[...]
    a = jnp.where(z > 0, z, jnp.exp(jnp.minimum(z, 0.0)) - 1.0)
    a4 = a.reshape(t, hp2, w_e, lo)
    yn4 = yn.reshape(t, hp2, w_e, lo)
    a_ref[...] = a4[:, 1:img_h + 1].astype(out_dtype)
    yn_ref[...] = yn4[:, 1:img_h + 1].astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_conv_gn_elu_bt(
    x, w, scale, bias, groups: int = 8, eps: float = 1e-6,
    batch_tile: int = 4, interpret: bool = False,
    tap_dtype: str = "bfloat16",
):
    """Batch-tiled column-packed fused conv3x3(SAME) + GroupNorm + ELU.

    Args: x (B, H, W, Cin) compute dtype; w (3, 3, Cin, Cout) fp32;
    scale/bias (Cout,) fp32.  Returns (B, H, W, Cout) in x.dtype.
    Training backward is analytic (never recomputes the forward); see
    the module block comment.
    """
    out, _, _ = _conv_gn_elu_bt_all(
        x, w, scale, bias, groups, eps, batch_tile, interpret, tap_dtype
    )
    return out


def _conv_gn_elu_bt_all(
    x, w, scale, bias, groups, eps, batch_tile, interpret, tap_dtype
):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    t = batch_tile
    assert b % t == 0, (b, t)
    p = _pack_factor(cin, cout)
    assert wd % p == 0, (wd, p)
    li, lo = p * cin, p * cout
    wpk = wd // p
    w_e = tap_width(wpk)
    tdt = jnp.bfloat16 if tap_dtype == "bfloat16" else jnp.float32
    # free, contiguous reshape — the packed view, NOT a padded copy
    xp = pad_spatial1(x.reshape(b, h, wpk, li))
    wp_cols = xp.shape[2]
    rows = t * (h + 2)
    xs = xp.reshape(b // t, rows, wp_cols, li)
    xs = jnp.pad(xs, ((0, 0), (1, 1), (0, 0), (0, 0)))  # tap row margin
    wpacked = _pack_weights(w, p).astype(tdt)
    scale_l = jnp.tile(scale.astype(jnp.float32), p).reshape(1, lo)
    bias_l = jnp.tile(bias.astype(jnp.float32), p).reshape(1, lo)
    kernel = functools.partial(
        _kernel_bt, groups=groups, eps=eps, cout=cout, pack=p,
        img_h=h, wpk=wpk, t=t, tap_dtype=tdt, out_dtype=x.dtype,
    )
    a, yn, inv = pl.pallas_call(
        kernel,
        grid=(b // t,),
        in_specs=[
            pl.BlockSpec((1, rows + 2, wp_cols, li), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, li, lo), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lo), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lo), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, h, w_e, lo), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, h, w_e, lo), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, lo), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w_e, lo), x.dtype),
            jax.ShapeDtypeStruct((b, h, w_e, lo), x.dtype),
            jax.ShapeDtypeStruct((b // t, 8, lo), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, w_e, lo), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * 18 * h * wd * cin * cout,
            bytes_accessed=b * h * wd * (cin + 2 * cout) * x.dtype.itemsize,
            transcendentals=b * h * wd * cout,
        ),
    )(xs, wpacked, scale_l, bias_l)
    # unpack: col-slice the real packed cols, then a free reshape
    a = a[:, :, :wpk, :].reshape(b, h, wd, cout)
    yn = yn[:, :, :wpk, :].reshape(b, h, wd, cout)
    # drop the sublane padding; packed lanes repeat the per-channel inv
    inv = inv[:, :t, :cout].reshape(b, cout)
    return a, yn, inv


def _bt_fwd(x, w, scale, bias, groups, eps, batch_tile, interpret,
            tap_dtype):
    a, yn, inv = _conv_gn_elu_bt_all(
        x, w, scale, bias, groups, eps, batch_tile, interpret, tap_dtype
    )
    return a, (x, w, scale, bias, a, yn, inv)


def _bt_bwd(groups, eps, batch_tile, interpret, tap_dtype, res, da):
    return _analytic_bwd(res, da, groups, strides=(1, 1))


def _analytic_bwd(res, da, groups, strides):
    """Analytic backward: output-form ELU' -> two-reduce GN backward
    (the ops/groupnorm.py group_norm_elu_analytic math, driven by the
    kernel-emitted yn/inv residuals) -> standard XLA conv gradients.
    The forward is never recomputed.  Shared by the stride-1 bt and
    stride-2 s2 fused kernels (only the conv strides differ)."""
    x, w, scale, bias, a, yn, inv = res
    b, h, wd, c = yn.shape
    cg = c // groups
    dt = yn.dtype
    sc = scale.astype(dt)
    # ELU'(z) from the OUTPUT alone: a > 0 -> 1 else a + 1 (exact).
    dz = jnp.where(a > 0, da, da * (a + 1.0))
    dzf = dz.reshape(b, h * wd, c)
    ynf = yn.reshape(b, h * wd, c)
    s_dz = jnp.sum(dzf, axis=1, dtype=jnp.float32)          # (B, C)
    s_dzyn = jnp.sum(dzf * ynf, axis=1, dtype=jnp.float32)  # (B, C)
    dbias = jnp.sum(s_dz, axis=0)
    dscale = jnp.sum(s_dzyn, axis=0)
    from gdn_tpu.ops.groupnorm import _group_matrix

    gmat = jnp.asarray(_group_matrix(c, groups))
    n = h * wd * cg
    scale32 = scale.astype(jnp.float32)
    m1_c = (((s_dz * scale32) @ gmat) / n) @ gmat.T
    m2_c = (((s_dzyn * scale32) @ gmat) / n) @ gmat.T
    dy = (
        dzf * sc
        - m1_c.astype(dt)[:, None, :]
        - ynf * m2_c.astype(dt)[:, None, :]
    ) * inv.astype(dt)[:, None, :]
    dy = dy.reshape(b, h, wd, c)
    # conv gradients via the linear conv's VJP (primal output is dead
    # code — XLA DCEs it; the backward runs exactly the standard
    # input/weight gradient convs in the compute dtype).
    conv = lambda xx, ww: jax.lax.conv_general_dilated(
        xx, ww, strides, "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    _, conv_vjp = jax.vjp(conv, x, w.astype(dt))
    dx, dw = conv_vjp(dy)
    return dx.astype(x.dtype), dw.astype(w.dtype), dscale, dbias


fused_conv_gn_elu_bt.defvjp(_bt_fwd, _bt_bwd)


# ---------------------------------------------------------------------------
# v2s: stride-2 variant — the encoder's OTHER conv+GN+ELU half.
#
# Every DownBlock pairs a stride-2 conv with the stride-1 refine conv
# the bt kernel covers; both produce the same-sized feature map, so the
# stride-2 convs hold the other ~half of the encoder GN stat bytes
# (and with the deconv decoder default the decoder has no GN at all —
# the encoder IS the GN stat budget).  Same three ideas as bt, plus
# two stride-2-specific layout tricks that keep every tap a static
# ref slice:
#   - W direction: stride 2 rides the SAME packed view.  With input
#     packed by an even P and output packed by P/2, real output col
#     J = j*(P/2) + b reads input cols 2J+dx, which live in packed
#     cols j+dp for dp in {0, 1} only: dx = dp*P + a - 2b.  Lane
#     counts: li = P*Cin, lo = (P/2)*Cout.
#   - H direction: the (2M, W', L) row-padded map is VIEWED as
#     (M, 2*W', L) — a free reshape merging each row PAIR into the
#     column axis.  Output row i taps rows 2i, 2i+1, 2i+2 = pair i
#     (both halves) and pair i+1 (first half): three row taps at
#     column offsets {0, W', 0} and leading offsets {0, 0, 1}.  All
#     six (row, dp) taps are static slices of the proven bt layout.
# SAME padding for stride 2 / kernel 3 is (low 0, high 1) in both
# dims.  FLOP overhead vs the real conv is 2P/3 (the packed weight
# matrix is block-sparse); the covered blocks are latency/
# bandwidth-bound, not MXU-bound, so the trade is the same one bt
# makes.  Backward shares _analytic_bwd with strides=(2, 2).
# ---------------------------------------------------------------------------


def _pack_factor_s2(cin: int, cout: int) -> int:
    """Smallest EVEN input pack P with P*cin and (P/2)*cout both
    multiples of 128 lanes."""
    p = 2
    while (p * cin) % 128 or ((p // 2) * cout) % 128:
        p *= 2
        if p > 256:
            raise ValueError(f"unpackable s2 channels {cin}->{cout}")
    return p


def _pack_weights_s2(k: jnp.ndarray, p: int) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (3, 2, P*Cin, (P/2)*Cout) packed taps.

    Output packed col j lane (b*Cout+co) holds real out col j*(P/2)+b;
    row tap rt (= orig dy) at packed input col j+dp lane (a*Cin+ci)
    contributes K[rt, dx, ci, co] with dx = dp*P + a - 2b when
    0 <= dx < 3 (verified against the strided lax.conv in tests)."""
    import numpy as np

    po = p // 2
    sel = np.zeros((2, p, po, 3), np.float32)  # (dp, a, b, dx)
    for dp in range(2):
        for a in range(p):
            for b in range(po):
                dx = dp * p + a - 2 * b
                if 0 <= dx < 3:
                    sel[dp, a, b, dx] = 1.0
    wp = jnp.einsum("yxio,dabx->ydaibo", k, jnp.asarray(sel))
    return wp.reshape(3, 2, p * k.shape[2], po * k.shape[3])


def pick_batch_tile_s2(
    b: int, h: int, w: int, cin: int, cout: int,
    budget: int = _VMEM_BUDGET_BT,
) -> int:
    """Largest T in {8,4,2,1} dividing b whose working set fits VMEM."""
    p = _pack_factor_s2(cin, cout)
    li, lo = p * cin, (p // 2) * cout
    wpk = w // p
    w_e = tap_width(wpk)
    wp_cols = w_e + 8
    h2 = h // 2
    m = h2 + 1
    for t in (8, 4, 2, 1):
        if b % t:
            continue
        # streamed blocks are double-buffered by Mosaic (see
        # pick_batch_tile) — input and a/yn outputs count twice.
        work = (
            2 * (t * m + 1) * 2 * wp_cols * li * 2  # input block (2-buf)
            + t * m * w_e * lo * 4              # fp32 accumulator scratch
            + 2 * 2 * t * h2 * w_e * lo * 2     # a + yn outputs (2-buf)
            + 6 * li * lo * 2                   # packed weights (bf16)
        )
        if work < budget:
            return t
    return 0


def supported_s2(b: int, h: int, w: int, cin: int, cout: int) -> bool:
    """Gate: even H, packable channels, packed width divisible, VMEM."""
    if h % 2:
        return False
    try:
        p = _pack_factor_s2(cin, cout)
    except ValueError:
        return False
    if w % p:
        return False
    return pick_batch_tile_s2(b, h, w, cin, cout) > 0


def _kernel_s2(x_ref, w_ref, scale_ref, bias_ref, a_ref, yn_ref, inv_ref,
               acc_ref, *, groups, eps, cout, h2, wpk, wp_cols, t,
               tap_dtype, out_dtype):
    """One grid step: T stacked images -> 6 static tap matmuls ->
    per-image GN stats -> normalize + affine + ELU -> (a, yn, inv)."""
    rows = acc_ref.shape[0]          # T*M, M = h2+1 (last row garbage)
    w_e, lo = acc_ref.shape[1], acc_ref.shape[2]
    m = h2 + 1
    acc_ref[...] = jnp.zeros_like(acc_ref)
    # six static taps: rt in {0,1,2} (orig dy), dp in {0,1}
    for rt in range(3):
        pair_off, r = rt // 2, rt % 2
        for dp in range(2):
            col = r * wp_cols + dp
            src = x_ref[0, pair_off:pair_off + rows,
                        col:col + w_e, :].astype(tap_dtype)
            wtap = w_ref[pl.ds(rt, 1), dp].reshape(
                w_ref.shape[2], w_ref.shape[3]
            ).astype(tap_dtype)
            acc_ref[...] += jax.lax.dot_general(
                src, wtap,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc_ref[...]               # (rows, w_e, L_out) fp32

    # --- per-image GroupNorm statistics (masked to real cols/rows) ---
    colmask = (
        jax.lax.broadcasted_iota(jnp.int32, (w_e, lo), 0) < wpk
    ).astype(jnp.float32)
    y = acc * colmask
    rs1 = jnp.sum(y, axis=1)         # (rows, L)
    rs2 = jnp.sum(y * y, axis=1)
    # valid rows are 0..h2-1 inside each image's M-row band
    rix = jax.lax.broadcasted_iota(jnp.int32, (t, m, lo), 1)
    rmask = (rix < h2).astype(jnp.float32)
    s1 = jnp.sum(rs1.reshape(t, m, lo) * rmask, axis=1)   # (T, L)
    s2 = jnp.sum(rs2.reshape(t, m, lo) * rmask, axis=1)
    # lane -> group one-hot: packed lane j holds channel j % cout
    cg = cout // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (lo, groups), 0) % cout
    gid = jax.lax.broadcasted_iota(jnp.int32, (lo, groups), 1)
    gmat = ((ch // cg) == gid).astype(jnp.float32)        # (L, G)
    n = jnp.float32(h2 * wpk * (lo // cout) * cg)
    mean_g = jnp.dot(s1, gmat, preferred_element_type=jnp.float32) / n
    ex2_g = jnp.dot(s2, gmat, preferred_element_type=jnp.float32) / n
    var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, gmat.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, gmat.T, preferred_element_type=jnp.float32)
    inv_ref[0] = jnp.pad(inv_c, ((0, 8 - t), (0, 0)))

    # --- normalize + affine + ELU, write valid rows per image ---
    mean_r = jnp.broadcast_to(mean_c[:, None, :], (t, m, lo)).reshape(
        rows, lo
    )
    inv_r = jnp.broadcast_to(inv_c[:, None, :], (t, m, lo)).reshape(
        rows, lo
    )
    yn = (acc - mean_r[:, None, :]) * inv_r[:, None, :]
    z = yn * scale_ref[...] + bias_ref[...]
    a = jnp.where(z > 0, z, jnp.exp(jnp.minimum(z, 0.0)) - 1.0)
    a4 = a.reshape(t, m, w_e, lo)
    yn4 = yn.reshape(t, m, w_e, lo)
    a_ref[...] = a4[:, :h2].astype(out_dtype)
    yn_ref[...] = yn4[:, :h2].astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_conv_gn_elu_s2(
    x, w, scale, bias, groups: int = 8, eps: float = 1e-6,
    batch_tile: int = 4, interpret: bool = False,
    tap_dtype: str = "bfloat16",
):
    """Batch-tiled column-packed fused conv3x3(stride 2, SAME) +
    GroupNorm + ELU.

    Args: x (B, H, W, Cin) compute dtype, H even, W % P == 0;
    w (3, 3, Cin, Cout) fp32; scale/bias (Cout,) fp32.
    Returns (B, H/2, W/2, Cout) in x.dtype.  Training backward is
    analytic (shared _analytic_bwd, strides=(2, 2))."""
    out, _, _ = _conv_gn_elu_s2_all(
        x, w, scale, bias, groups, eps, batch_tile, interpret, tap_dtype
    )
    return out


def _conv_gn_elu_s2_all(
    x, w, scale, bias, groups, eps, batch_tile, interpret, tap_dtype
):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    t = batch_tile
    assert b % t == 0, (b, t)
    assert h % 2 == 0, h
    p = _pack_factor_s2(cin, cout)
    po = p // 2
    assert wd % p == 0, (wd, p)
    li, lo = p * cin, po * cout
    wpk = wd // p
    w_e = tap_width(wpk)
    wp_cols = w_e + 8
    h2 = h // 2
    m = h2 + 1
    tdt = jnp.bfloat16 if tap_dtype == "bfloat16" else jnp.float32
    # rows: pad (0, 2) so pair m-1 = rows (h, h+1), both zero (SAME
    # high pad); cols: packed view then right-pad only (SAME low pad
    # is 0 for stride 2 / kernel 3)
    xp = x.reshape(b, h, wpk, li)
    xp = jnp.pad(xp, ((0, 0), (0, 2), (0, wp_cols - wpk), (0, 0)))
    # free reshape: merge each row pair into the column axis
    xp = xp.reshape(b, m, 2 * wp_cols, li)
    xs = xp.reshape(b // t, t * m, 2 * wp_cols, li)
    xs = jnp.pad(xs, ((0, 0), (0, 1), (0, 0), (0, 0)))  # cross-image tap
    wpacked = _pack_weights_s2(w, p).astype(tdt)
    scale_l = jnp.tile(scale.astype(jnp.float32), po).reshape(1, lo)
    bias_l = jnp.tile(bias.astype(jnp.float32), po).reshape(1, lo)
    kernel = functools.partial(
        _kernel_s2, groups=groups, eps=eps, cout=cout,
        h2=h2, wpk=wpk, wp_cols=wp_cols, t=t, tap_dtype=tdt,
        out_dtype=x.dtype,
    )
    a, yn, inv = pl.pallas_call(
        kernel,
        grid=(b // t,),
        in_specs=[
            pl.BlockSpec((1, t * m + 1, 2 * wp_cols, li),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 2, li, lo), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lo), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lo), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, h2, w_e, lo), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, h2, w_e, lo), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, lo), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h2, w_e, lo), x.dtype),
            jax.ShapeDtypeStruct((b, h2, w_e, lo), x.dtype),
            jax.ShapeDtypeStruct((b // t, 8, lo), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((t * m, w_e, lo), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * h2 * wpk * 12 * li * lo,
            bytes_accessed=b * (h * wd * cin + 2 * h2 * (wd // 2) * cout)
            * x.dtype.itemsize,
            transcendentals=b * h2 * (wd // 2) * cout,
        ),
    )(xs, wpacked, scale_l, bias_l)
    # unpack: col-slice the real packed cols, then a free reshape
    w2 = wd // 2
    a = a[:, :, :wpk, :].reshape(b, h2, w2, cout)
    yn = yn[:, :, :wpk, :].reshape(b, h2, w2, cout)
    inv = inv[:, :t, :cout].reshape(b, cout)
    return a, yn, inv


def _s2_fwd(x, w, scale, bias, groups, eps, batch_tile, interpret,
            tap_dtype):
    a, yn, inv = _conv_gn_elu_s2_all(
        x, w, scale, bias, groups, eps, batch_tile, interpret, tap_dtype
    )
    return a, (x, w, scale, bias, a, yn, inv)


def _s2_bwd(groups, eps, batch_tile, interpret, tap_dtype, res, da):
    return _analytic_bwd(res, da, groups, strides=(2, 2))


fused_conv_gn_elu_s2.defvjp(_s2_fwd, _s2_bwd)
