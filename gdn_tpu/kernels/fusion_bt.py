"""Batch-tiled column-packed fused FusionBlock kernel (v2 recipe).

The guidance FusionBlock (models/blocks.py::FusionBlock; SURVEY.md §2.3
"guidance feature fusion: concat + conv") is concat(x, lateral) ->
conv3x3 -> GroupNorm -> ELU.  With the deconv decoder default the
FusionBlocks hold ALL of the decoder's GroupNorm statistics traffic
(the deconv branch itself has no norm), so they are the decoder half of
the GN-stat producer-fusion campaign that kernels/conv_gn_elu.py's
``bt``/``s2`` kernels wage on the encoder.

This kernel is ONE op per block and never materializes the concat:

- the two inputs stay separate refs; the 3x3 conv over the concatenated
  channel axis is algebraically split into two accumulations with the
  corresponding kernel halves (same trick as the round-1 fusion kernel,
  kernels/fusion_block.py:165) — the (Cx+Cl)-channel tensor that XLA
  writes+reads around its conv never exists;
- BATCH TILING + COLUMN PACKING are inherited verbatim from
  kernels/conv_gn_elu.py (see that module's block comment): T images'
  spatially pre-padded rows stack along the row axis, and C < 128 maps
  are VIEWED as (H, W/p, p*C) with block-structured packed tap weights,
  so the narrow decoder widths run at 128 busy lanes with exact-tensor
  HBM traffic;
- the backward is ANALYTIC (never recomputes the forward): output-form
  ELU' -> the two-reduce GroupNorm backward driven by kernel-emitted
  (yn, inv) residuals -> standard XLA conv input/weight gradients
  through the split-weight linear conv pair.

HBM traffic per block: read x + lateral + weights, write out (+ the
bf16 yn residual for training).  The XLA chain writes+reads the concat,
writes+reads the conv output around the stat reduces, then writes the
activated map: ~3 extra full-map round-trips, each carrying ~85 µs/op
fusion-chain latency at these sizes (BASELINE.md step-floor profile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdn_tpu.kernels.conv_gn_elu import _pack_factor, _pack_weights
from gdn_tpu.kernels.fusion_block import (
    _conv3x3_rolled, pad_spatial1, tap_width,
)

# Includes Mosaic's double-buffering of streamed blocks in the
# accounting (see conv_gn_elu.pick_batch_tile) -> 15 MB of the 16 MB
# scoped-VMEM hardware limit.
_VMEM_BUDGET = 15 * 1024 * 1024


def _pack_factor_fb(cx: int, cl: int, cout: int) -> int:
    """Smallest p making p*cx, p*cl and p*cout all multiples of 128."""
    p = 1
    while (p * cx) % 128 or (p * cl) % 128 or (p * cout) % 128:
        p *= 2
        if p > 128:
            raise ValueError(f"unpackable channels ({cx}+{cl})->{cout}")
    return p


def pick_batch_tile_fb(
    b: int, h: int, w: int, cx: int, cl: int, cout: int,
    budget: int = _VMEM_BUDGET,
) -> int:
    """Largest T in {8,4,2,1} dividing b whose working set fits VMEM."""
    try:
        p = _pack_factor_fb(cx, cl, cout)
    except ValueError:
        return 0
    lx, ll, lo = p * cx, p * cl, p * cout
    wpk = w // p
    w_e = tap_width(wpk)
    wp_cols = w_e + 8
    for t in (8, 4, 2, 1):
        if b % t:
            continue
        rows = t * (h + 2)
        # streamed blocks are double-buffered by Mosaic (see
        # conv_gn_elu.pick_batch_tile) — inputs and outputs count twice.
        work = (
            2 * (rows + 2) * wp_cols * (lx + ll) * 2  # input blocks (2-buf)
            + rows * w_e * lo * 4                 # fp32 accumulator scratch
            + 2 * 2 * rows * w_e * lo * 2         # a + yn outputs (2-buf)
            + 9 * (lx + ll) * lo * 2              # both packed weights (bf16)
        )
        if work < budget:
            return t
    return 0


def supported_fb(b: int, h: int, w: int, cx: int, cl: int, cout: int) -> bool:
    """Gate: packable channels, packed width divisible, VMEM fit."""
    try:
        p = _pack_factor_fb(cx, cl, cout)
    except ValueError:
        return False
    if w % p:
        return False
    return pick_batch_tile_fb(b, h, w, cx, cl, cout) > 0


def _kernel_fb(x_ref, l_ref, wx_ref, wl_ref, scale_ref, bias_ref,
               a_ref, yn_ref, inv_ref, acc_ref, *, groups, eps, cout,
               pack, img_h, wpk, t, tap_dtype, out_dtype):
    """One grid step: T stacked image pairs -> split-weight conv taps
    -> per-image GN stats -> normalize + affine + ELU -> (a, yn, inv)."""
    rows = acc_ref.shape[0]          # T*(img_h+2)
    w_e, lo = acc_ref.shape[1], acc_ref.shape[2]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    _conv3x3_rolled(x_ref.at[0], wx_ref, acc_ref, rows, w_e, tap_dtype)
    _conv3x3_rolled(l_ref.at[0], wl_ref, acc_ref, rows, w_e, tap_dtype)
    acc = acc_ref[...]               # (rows, w_e, L_out) fp32

    # --- per-image GroupNorm statistics (masked to real cols/rows) ---
    colmask = (
        jax.lax.broadcasted_iota(jnp.int32, (w_e, lo), 0) < wpk
    ).astype(jnp.float32)
    y = acc * colmask
    rs1 = jnp.sum(y, axis=1)         # (rows, L)
    rs2 = jnp.sum(y * y, axis=1)
    hp2 = img_h + 2
    rix = jax.lax.broadcasted_iota(jnp.int32, (t, hp2, lo), 1)
    rmask = ((rix >= 1) & (rix <= img_h)).astype(jnp.float32)
    s1 = jnp.sum(rs1.reshape(t, hp2, lo) * rmask, axis=1)   # (T, L)
    s2 = jnp.sum(rs2.reshape(t, hp2, lo) * rmask, axis=1)
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


def _reference_fb(x, lat, wx, wl, scale, bias, groups, eps):
    """XLA reference: concat -> conv3x3 SAME -> GroupNorm -> ELU."""
    from gdn_tpu.kernels.conv_gn_elu import _reference

    full = jnp.concatenate(
        [x.astype(jnp.float32), lat.astype(jnp.float32)], axis=-1
    )
    w = jnp.concatenate([wx, wl], axis=2)
    return _reference(full, w, scale, bias, groups, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_fusion_bt(
    x, lat, wx, wl, scale, bias, groups: int = 8, eps: float = 1e-6,
    batch_tile: int = 4, interpret: bool = False,
    tap_dtype: str = "bfloat16",
):
    """Batch-tiled column-packed fused concat-conv3x3 + GroupNorm + ELU.

    Args: x (B, H, W, Cx), lat (B, H, W, Cl) compute dtype;
    wx (3, 3, Cx, Cout), wl (3, 3, Cl, Cout) fp32 (the two halves of
    the concat conv kernel); scale/bias (Cout,) fp32.
    Returns (B, H, W, Cout) in x.dtype.  Training backward is analytic
    (never recomputes the forward); see the module block comment.
    """
    out, _, _ = _fusion_bt_all(
        x, lat, wx, wl, scale, bias, groups, eps, batch_tile, interpret,
        tap_dtype,
    )
    return out


def _fusion_bt_all(
    x, lat, wx, wl, scale, bias, groups, eps, batch_tile, interpret,
    tap_dtype,
):
    b, h, wd, cx = x.shape
    cl = lat.shape[-1]
    cout = wx.shape[-1]
    t = batch_tile
    assert b % t == 0, (b, t)
    p = _pack_factor_fb(cx, cl, cout)
    assert wd % p == 0, (wd, p)
    lx, ll, lo = p * cx, p * cl, p * cout
    wpk = wd // p
    w_e = tap_width(wpk)
    tdt = jnp.bfloat16 if tap_dtype == "bfloat16" else jnp.float32

    def stack_rows(v, lanes):
        vp = pad_spatial1(v.reshape(b, h, wpk, lanes))
        rows = t * (h + 2)
        vs = vp.reshape(b // t, rows, vp.shape[2], lanes)
        return jnp.pad(vs, ((0, 0), (1, 1), (0, 0), (0, 0)))

    xs = stack_rows(x, lx)
    ls = stack_rows(lat.astype(x.dtype), ll)
    wp_cols = xs.shape[2]
    rows = t * (h + 2)
    wxp = _pack_weights(wx, p).astype(tdt)
    wlp = _pack_weights(wl, p).astype(tdt)
    scale_l = jnp.tile(scale.astype(jnp.float32), p).reshape(1, lo)
    bias_l = jnp.tile(bias.astype(jnp.float32), p).reshape(1, lo)
    kernel = functools.partial(
        _kernel_fb, groups=groups, eps=eps, cout=cout, pack=p,
        img_h=h, wpk=wpk, t=t, tap_dtype=tdt, out_dtype=x.dtype,
    )
    a, yn, inv = pl.pallas_call(
        kernel,
        grid=(b // t,),
        in_specs=[
            pl.BlockSpec((1, rows + 2, wp_cols, lx), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows + 2, wp_cols, ll), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, lx, lo), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ll, lo), lambda i: (0, 0, 0, 0),
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
            flops=b * 18 * h * wd * (cx + cl) * cout,
            bytes_accessed=b * h * wd * (cx + cl + 2 * cout)
            * x.dtype.itemsize,
            transcendentals=b * h * wd * cout,
        ),
    )(xs, ls, wxp, wlp, scale_l, bias_l)
    a = a[:, :, :wpk, :].reshape(b, h, wd, cout)
    yn = yn[:, :, :wpk, :].reshape(b, h, wd, cout)
    inv = inv[:, :t, :cout].reshape(b, cout)
    return a, yn, inv


def _fb_fwd(x, lat, wx, wl, scale, bias, groups, eps, batch_tile,
            interpret, tap_dtype):
    a, yn, inv = _fusion_bt_all(
        x, lat, wx, wl, scale, bias, groups, eps, batch_tile, interpret,
        tap_dtype,
    )
    return a, (x, lat, wx, wl, scale, bias, a, yn, inv)


def _fb_bwd(groups, eps, batch_tile, interpret, tap_dtype, res, da):
    """Analytic backward: output-form ELU' -> two-reduce GN backward
    (kernel-emitted yn/inv residuals) -> XLA conv gradients through the
    split-weight linear conv pair.  The forward is never recomputed;
    the concat is never materialized (two separate weight-grad convs,
    same total FLOPs as the concat conv's)."""
    x, lat, wx, wl, scale, bias, a, yn, inv = res
    b, h, wd, c = yn.shape
    cg = c // groups
    dt = yn.dtype
    sc = scale.astype(dt)
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

    conv = lambda xx, ww: jax.lax.conv_general_dilated(
        xx, ww, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    pair = lambda xx, ll, wwx, wwl: conv(xx, wwx) + conv(ll, wwl)
    _, pair_vjp = jax.vjp(
        pair, x, lat.astype(x.dtype), wx.astype(dt), wl.astype(dt)
    )
    dx, dlat, dwx, dwl = pair_vjp(dy)
    return (
        dx.astype(x.dtype), dlat.astype(lat.dtype),
        dwx.astype(wx.dtype), dwl.astype(wl.dtype), dscale, dbias,
    )


fused_fusion_bt.defvjp(_fb_fwd, _fb_bwd)
