"""Pallas kernel vs XLA-reference numerical equivalence (SURVEY.md §4).

Runs in interpreter mode on CPU (same arithmetic, no TPU needed); the
real-TPU path is exercised by bench/verify drives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdn_tpu import losses
from gdn_tpu.kernels.fused_loss import fused_loss_terms


def _data(rng, b=2, h=32, w=48, holes=True):
    pred = rng.uniform(1, 79, size=(b, h, w)).astype(np.float32)
    gt = rng.uniform(1, 79, size=(b, h, w)).astype(np.float32)
    mask = (
        (rng.uniform(size=(b, h, w)) > 0.2).astype(np.float32)
        if holes
        else np.ones((b, h, w), np.float32)
    )
    return jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)


def _jnp_terms(pred, gt, mask, max_depth=80.0):
    return {
        "recon": losses.masked_l1(pred, gt, mask),
        "grad0": losses.gradient_loss(pred, gt, mask, num_scales=1),
        "ssim": losses.ssim_loss(pred, gt, max_depth),
    }


def test_fused_forward_matches_jnp(rng):
    pred, gt, mask = _data(rng)
    fused = fused_loss_terms(pred, gt, mask, 80.0, interpret=True)
    ref = _jnp_terms(pred, gt, mask)
    for k in ("recon", "grad0", "ssim"):
        assert float(fused[k]) == pytest.approx(float(ref[k]), rel=1e-5), k


def test_fused_forward_4d_inputs(rng):
    pred, gt, mask = _data(rng, b=1)
    f4 = fused_loss_terms(pred[..., None], gt[..., None], mask[..., None], 80.0, interpret=True)
    f3 = fused_loss_terms(pred, gt, mask, 80.0, interpret=True)
    for k in f3:
        assert float(f4[k]) == float(f3[k])


def test_fused_gradient_matches_jnp(rng):
    pred, gt, mask = _data(rng, b=2, h=24, w=32)
    w_r, w_g, w_s = 1.0, 0.7, 0.4

    def fused_total(p):
        t = fused_loss_terms(p, gt, mask, 80.0, interpret=True)
        return w_r * t["recon"] + w_g * t["grad0"] + w_s * t["ssim"]

    def jnp_total(p):
        t = _jnp_terms(p, gt, mask)
        return w_r * t["recon"] + w_g * t["grad0"] + w_s * t["ssim"]

    gf = jax.grad(fused_total)(pred)
    gr = jax.grad(jnp_total)(pred)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=1e-7)


def test_fused_gradient_perfect_pred_is_ssim_only(rng):
    pred, gt, mask = _data(rng, b=1, h=16, w=24, holes=False)

    def fused_total(p):
        t = fused_loss_terms(p, gt, mask, 80.0, interpret=True)
        return t["recon"] + t["grad0"] + t["ssim"]

    g = jax.grad(fused_total)(gt)  # pred == gt
    # SSIM grad at identity is 0; L1/grad signs are 0 at equality.
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_fused_in_jit(rng):
    pred, gt, mask = _data(rng, b=1, h=16, w=24)

    @jax.jit
    def f(p):
        return fused_loss_terms(p, gt, mask, 80.0, interpret=True)["recon"]

    assert np.isfinite(float(f(pred)))


def test_fused_multiscale_composition_matches_gradient_loss(rng):
    """total_loss's fused path composes kernel grad0 + jnp coarse scales;
    verify that composition equals the pure-jnp multi-scale loss."""
    from gdn_tpu.losses import _gradient_scale_losses

    pred, gt, mask = _data(rng, b=2, h=32, w=48)
    fused = fused_loss_terms(pred, gt, mask, 80.0, interpret=True)
    coarse = _gradient_scale_losses(pred, gt, mask, 4, skip_first=True)
    composed = (fused["grad0"] + sum(coarse)) / 4
    ref = losses.gradient_loss(pred, gt, mask, num_scales=4)
    assert float(composed) == pytest.approx(float(ref), rel=1e-6)


def _fusion_data(rng, b=2, h=16, w=24, cx=8, cl=4, cout=8):
    x = rng.normal(size=(b, h, w, cx)).astype(np.float32)
    lat = rng.normal(size=(b, h, w, cl)).astype(np.float32)
    wx = (rng.normal(size=(3, 3, cx, cout)) * 0.1).astype(np.float32)
    wl = (rng.normal(size=(3, 3, cl, cout)) * 0.1).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, size=(cout,)).astype(np.float32)
    bias = rng.normal(size=(cout,)).astype(np.float32)
    return map(jnp.asarray, (x, lat, wx, wl, scale, bias))


def test_fused_fusion_block_matches_reference(rng):
    from gdn_tpu.kernels.fusion_block import _reference, fused_fusion_block

    x, lat, wx, wl, scale, bias = _fusion_data(rng)
    out = fused_fusion_block(x, lat, wx, wl, scale, bias, 4, 1e-6, True)
    ref = _reference(x, lat, wx, wl, scale, bias, 4, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_fusion_block_bf16_taps(rng):
    """bf16-tap variant (single-pass MXU matmuls, fp32 accumulate):
    same math to bf16-mantissa tolerance on unit-scale data."""
    from gdn_tpu.kernels.fusion_block import _reference, fused_fusion_block

    x, lat, wx, wl, scale, bias = _fusion_data(rng)
    out = fused_fusion_block(
        x, lat, wx, wl, scale, bias, 4, 1e-6, True, "bfloat16"
    )
    ref = _reference(x, lat, wx, wl, scale, bias, 4, 1e-6)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0.08, atol=0.08
    )


def test_fused_fusion_block_gradients(rng):
    from gdn_tpu.kernels.fusion_block import _reference, fused_fusion_block

    x, lat, wx, wl, scale, bias = _fusion_data(rng, b=1, h=8, w=12)

    def f_fused(x, wx, scale):
        return jnp.sum(
            fused_fusion_block(x, lat, wx, wl, scale, bias, 4, 1e-6, True) ** 2
        )

    def f_ref(x, wx, scale):
        return jnp.sum(_reference(x, lat, wx, wl, scale, bias, 4, 1e-6) ** 2)

    gf = jax.grad(f_fused, argnums=(0, 1, 2))(x, wx, scale)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, wx, scale)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_fusion_block_module_xla_path_matches_kernel_reference(rng):
    """The flax FusionBlock (XLA path on CPU) must equal the kernel's
    _reference given the same params — proving kernel<->module parity
    transitively."""
    import flax
    from gdn_tpu.config import ModelConfig
    from gdn_tpu.kernels.fusion_block import _reference
    from gdn_tpu.models.blocks import FusionBlock

    cfg = ModelConfig(dtype="float32", group_norm_groups=4)
    x, lat, wx, wl, scale, bias = _fusion_data(rng, cout=8)
    block = FusionBlock(features=8, cfg=cfg)
    params = block.init(jax.random.PRNGKey(0), x, lat)
    kernel = jnp.concatenate([wx, wl], axis=2)
    params = flax.core.copy(
        params, {"params": {"kernel": kernel, "scale": scale, "bias": bias}}
    )
    out = block.apply(params, x, lat)
    ref = _reference(x, lat, wx, wl, scale, bias, 4, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_upsample_conv_matches_reference(rng):
    from gdn_tpu.kernels.upsample import _reference as up_ref, fused_upsample_conv

    x = jnp.asarray(rng.normal(size=(2, 8, 12, 8)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 8, 8)) * 0.1).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(8,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    out = fused_upsample_conv(x, w, scale, bias, 4, 1e-6, True)
    ref = up_ref(x, w, scale, bias, 4, 1e-6)
    assert out.shape == (2, 16, 24, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_upsample_conv_bf16_taps(rng):
    from gdn_tpu.kernels.upsample import _reference as up_ref, fused_upsample_conv

    x = jnp.asarray(rng.normal(size=(2, 8, 12, 8)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 8, 8)) * 0.1).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(8,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    out = fused_upsample_conv(x, w, scale, bias, 4, 1e-6, True, "bfloat16")
    ref = up_ref(x, w, scale, bias, 4, 1e-6)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0.08, atol=0.08
    )


def test_fused_upsample_conv_gradients(rng):
    from gdn_tpu.kernels.upsample import _reference as up_ref, fused_upsample_conv

    x = jnp.asarray(rng.normal(size=(1, 6, 8, 4)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 4, 4)) * 0.1).astype(np.float32))
    scale = jnp.ones((4,), jnp.float32)
    bias = jnp.zeros((4,), jnp.float32)

    gf = jax.grad(lambda x, w: jnp.sum(fused_upsample_conv(x, w, scale, bias, 2, 1e-6, True) ** 2), argnums=(0, 1))(x, w)
    gr = jax.grad(lambda x, w: jnp.sum(up_ref(x, w, scale, bias, 2, 1e-6) ** 2), argnums=(0, 1))(x, w)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_group_norm_elu_matches_reference(rng):
    from gdn_tpu.kernels.groupnorm import _reference, fused_group_norm_elu

    x = jnp.asarray(rng.normal(size=(3, 10, 14, 16)).astype(np.float32) * 2 + 1)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(16,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    out = fused_group_norm_elu(x, scale, bias, 4, 1e-6, True)
    ref = _reference(x, scale, bias, 4, 1e-6)
    assert out.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_group_norm_elu_bf16(rng):
    from gdn_tpu.kernels.groupnorm import _reference, fused_group_norm_elu

    x = jnp.asarray(rng.normal(size=(2, 8, 12, 8)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    scale = jnp.ones((8,), jnp.float32)
    bias = jnp.zeros((8,), jnp.float32)
    out = fused_group_norm_elu(x, scale, bias, 4, 1e-6, True)
    ref = _reference(x, scale, bias, 4, 1e-6)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_fused_group_norm_elu_packed_lanes(rng):
    """C=32 divides 128 -> the kernel packs 4 rows per 128-lane tile
    (the unpacked C=32 form failed Mosaic TPU compilation); statistics
    must be exact under packing."""
    from gdn_tpu.kernels.groupnorm import _lane_layout, _reference, fused_group_norm_elu

    assert _lane_layout(16 * 32, 32) == (16 * 32 // 4, 128, 4)
    assert _lane_layout(10 * 14, 16) == (140, 16, 1)  # 140 % 8 != 0
    assert _lane_layout(64, 256) == (64, 256, 1)

    x = jnp.asarray(rng.normal(size=(2, 16, 32, 32)).astype(np.float32) * 2 + 1)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(32,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    out = fused_group_norm_elu(x, scale, bias, 8, 1e-6, True)
    ref = _reference(x, scale, bias, 8, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_group_norm_elu_gradients(rng):
    from gdn_tpu.kernels.groupnorm import _reference, fused_group_norm_elu

    x = jnp.asarray(rng.normal(size=(1, 6, 8, 8)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(8,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    gf = jax.grad(
        lambda x, s, b: jnp.sum(fused_group_norm_elu(x, s, b, 2, 1e-6, True) ** 2),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    gr = jax.grad(
        lambda x, s, b: jnp.sum(_reference(x, s, b, 2, 1e-6) ** 2),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_upsample_exactly_matches_resize_bilinear(rng):
    """The concat-shift upsample algebra inside the kernel must equal
    ops.resize.resize_bilinear at exactly 2x (clamp semantics)."""
    from gdn_tpu.kernels.upsample import _upsample2x_clamp
    from gdn_tpu.ops.resize import resize_bilinear

    x = jnp.asarray(rng.uniform(0, 80, (7, 9, 3)).astype(np.float32))
    ours = _upsample2x_clamp(x)
    ref = resize_bilinear(x, (14, 18))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-6, atol=1e-5)


def test_fits_vmem_gate():
    from gdn_tpu.kernels.upsample import fits_vmem

    assert fits_vmem(16, 52, 256, 128)     # small decoder scale
    assert not fits_vmem(64, 208, 32, 32)  # large scale falls back


def _convgn_data(rng, b=2, h=10, w=14, cin=16, cout=16):
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
    w_ = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=cout).astype(np.float32) * 0.1)
    return x, w_, scale, bias


def test_fused_conv_gn_elu_matches_reference(rng):
    from gdn_tpu.kernels.conv_gn_elu import _reference, fused_conv_gn_elu

    x, w_, scale, bias = _convgn_data(rng)
    out = fused_conv_gn_elu(x, w_, scale, bias, 4, 1e-6, True)
    ref = _reference(x, w_, scale, bias, 4, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_conv_gn_elu_gradients(rng):
    from gdn_tpu.kernels.conv_gn_elu import _reference, fused_conv_gn_elu

    x, w_, scale, bias = _convgn_data(rng, b=1, h=8, w=12)

    def f_fused(x, w_, scale):
        return jnp.sum(fused_conv_gn_elu(x, w_, scale, bias, 4, 1e-6, True) ** 2)

    def f_ref(x, w_, scale):
        return jnp.sum(_reference(x, w_, scale, bias, 4, 1e-6) ** 2)

    gf = jax.grad(f_fused, argnums=(0, 1, 2))(x, w_, scale)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, w_, scale)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_fused_conv_gn_elu_supported_gate():
    from gdn_tpu.kernels.conv_gn_elu import supported

    assert supported(32, 104, 128, 128)
    assert not supported(32, 104, 64, 64)   # narrow lanes: padding tax
    assert not supported(128, 416, 128, 128)  # VMEM blow-up per image


@pytest.mark.parametrize(
    "b,h,w,cin,cout,groups,t",
    [
        (4, 8, 16, 32, 32, 8, 2),    # pack p=4
        (4, 6, 12, 64, 64, 8, 4),    # p=2, tile 4
        (2, 8, 16, 128, 128, 8, 2),  # p=1 (lane-native)
        (4, 8, 16, 32, 64, 8, 2),    # p=4 with cin != cout
        (4, 5, 16, 16, 16, 4, 2),    # p=8, odd H
    ],
)
def test_fused_conv_gn_elu_bt_matches_reference(
    rng, b, h, w, cin, cout, groups, t
):
    """Batch-tiled column-packed variant: forward AND analytic VJP vs
    the XLA reference autodiff, across pack factors 1/2/4/8."""
    from gdn_tpu.kernels.conv_gn_elu import _reference, fused_conv_gn_elu_bt

    x, w_, scale, bias = _convgn_data(rng, b=b, h=h, w=w, cin=cin, cout=cout)
    out = fused_conv_gn_elu_bt(x, w_, scale, bias, groups, 1e-6, t, True,
                               "float32")
    ref = _reference(x, w_, scale, bias, groups, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    def f_fused(x, w_, scale, bias):
        o = fused_conv_gn_elu_bt(x, w_, scale, bias, groups, 1e-6, t, True,
                                 "float32")
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    def f_ref(x, w_, scale, bias):
        o = _reference(x, w_, scale, bias, groups, 1e-6)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    gf = jax.grad(f_fused, argnums=(0, 1, 2, 3))(x, w_, scale, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, w_, scale, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-5)


def test_fused_conv_gn_elu_bt_gate():
    from gdn_tpu.kernels.conv_gn_elu import pick_batch_tile, supported_bt

    # KITTI stage-2 encoder ladder at B=128: every refine conv admits
    # a tile (the narrow C=32/64 blocks pack to 128 lanes for free).
    assert supported_bt(128, 64, 208, 32, 32)
    assert supported_bt(128, 32, 104, 64, 64)
    assert supported_bt(128, 16, 52, 128, 128)
    assert supported_bt(128, 8, 26, 256, 256)
    assert supported_bt(128, 4, 13, 512, 512)
    # t=2 at the widest narrow shape computes to ~16.04 MB with the
    # measured double-buffer accounting (hardware limit 16 MB) -> t=1.
    assert pick_batch_tile(128, 64, 208, 32, 32) >= 1
    # width not divisible by the pack factor -> unsupported
    assert not supported_bt(128, 64, 207, 32, 32)
    # c=48 needs p=8 (384 lanes); w=52 % 8 != 0 -> unsupported
    assert not supported_bt(128, 16, 52, 48, 48)


@pytest.mark.parametrize(
    "b,h,w,cin,cout,groups,t",
    [
        (4, 8, 16, 32, 32, 8, 2),    # P=8 (down0 pattern: cin==cout)
        (4, 8, 16, 32, 64, 8, 2),    # P=4 (channel-doubling DownBlock)
        (4, 6, 12, 64, 128, 8, 2),   # P=2, odd H2
        (2, 8, 16, 128, 128, 8, 2),  # P=2 (lane-native cin)
        (4, 8, 16, 16, 32, 4, 4),    # P=8, tile 4
    ],
)
def test_fused_conv_gn_elu_s2_matches_reference(
    rng, b, h, w, cin, cout, groups, t
):
    """Stride-2 packed variant: forward AND analytic VJP vs the XLA
    strided reference autodiff, across pack factors 2/4/8."""
    from gdn_tpu.kernels.conv_gn_elu import _reference, fused_conv_gn_elu_s2

    x, w_, scale, bias = _convgn_data(rng, b=b, h=h, w=w, cin=cin, cout=cout)
    out = fused_conv_gn_elu_s2(x, w_, scale, bias, groups, 1e-6, t, True,
                               "float32")
    ref = _reference(x, w_, scale, bias, groups, 1e-6, strides=(2, 2))
    assert out.shape == (b, h // 2, w // 2, cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    def f_fused(x, w_, scale, bias):
        o = fused_conv_gn_elu_s2(x, w_, scale, bias, groups, 1e-6, t, True,
                                 "float32")
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    def f_ref(x, w_, scale, bias):
        o = _reference(x, w_, scale, bias, groups, 1e-6, strides=(2, 2))
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    gf = jax.grad(f_fused, argnums=(0, 1, 2, 3))(x, w_, scale, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, w_, scale, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-5)


def test_fused_conv_gn_elu_s2_gate():
    from gdn_tpu.kernels.conv_gn_elu import pick_batch_tile_s2, supported_s2

    # KITTI stage-2 encoder DownBlock ladder at B=128 (128x416 input):
    # every stride-2 conv admits a tile.
    assert supported_s2(128, 128, 416, 32, 32)    # down0, P=8
    assert supported_s2(128, 64, 208, 32, 64)     # down1, P=4
    assert supported_s2(128, 32, 104, 64, 128)    # down2, P=2
    assert supported_s2(128, 16, 52, 128, 256)    # down3, P=2
    assert supported_s2(128, 8, 26, 256, 512)     # down4, P=2
    assert pick_batch_tile_s2(128, 32, 104, 64, 128) >= 2
    # odd H -> unsupported
    assert not supported_s2(128, 63, 416, 32, 32)
    # width not divisible by the pack factor -> unsupported
    assert not supported_s2(128, 128, 412, 32, 32)
