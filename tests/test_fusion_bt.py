"""Equivalence tests for the batch-tiled fused FusionBlock kernel
(kernels/fusion_bt.py) — forward and analytic VJP vs the XLA
concat->conv->GN->ELU reference, across pack factors, in interpret
mode (the TPU-parity check happens at coarser tolerance on hardware;
see CLAUDE.md MXU-precision note)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _fb_data(rng, b, h, w, cx, cl, cout):
    x = jnp.asarray(rng.normal(size=(b, h, w, cx)).astype(np.float32))
    lat = jnp.asarray(rng.normal(size=(b, h, w, cl)).astype(np.float32))
    wx = jnp.asarray(rng.normal(size=(3, 3, cx, cout)).astype(np.float32) * 0.1)
    wl = jnp.asarray(rng.normal(size=(3, 3, cl, cout)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=cout).astype(np.float32) * 0.1)
    return x, lat, wx, wl, scale, bias


@pytest.mark.parametrize(
    "b,h,w,cx,cl,cout,groups,t",
    [
        (4, 8, 16, 32, 32, 32, 8, 2),    # p=4 (decoder up3 pattern)
        (4, 6, 12, 64, 64, 64, 8, 4),    # p=2, tile 4
        (2, 8, 16, 128, 128, 128, 8, 2),  # p=1 (lane-native)
        (4, 8, 16, 16, 32, 16, 4, 2),    # p=8, mixed cx != cl (up4 pattern)
        (4, 5, 16, 32, 64, 32, 8, 2),    # odd H, channel-mixed
    ],
)
def test_fused_fusion_bt_matches_reference(rng, b, h, w, cx, cl, cout,
                                           groups, t):
    from gdn_tpu.kernels.fusion_bt import _reference_fb, fused_fusion_bt

    x, lat, wx, wl, scale, bias = _fb_data(rng, b, h, w, cx, cl, cout)
    out = fused_fusion_bt(x, lat, wx, wl, scale, bias, groups, 1e-6, t,
                          True, "float32")
    ref = _reference_fb(x, lat, wx, wl, scale, bias, groups, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    def f_fused(x, lat, wx, wl, scale, bias):
        o = fused_fusion_bt(x, lat, wx, wl, scale, bias, groups, 1e-6, t,
                            True, "float32")
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    def f_ref(x, lat, wx, wl, scale, bias):
        o = _reference_fb(x, lat, wx, wl, scale, bias, groups, 1e-6)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    gf = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4, 5))(
        x, lat, wx, wl, scale, bias
    )
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4, 5))(
        x, lat, wx, wl, scale, bias
    )
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-5)


def test_fused_fusion_bt_gate():
    from gdn_tpu.kernels.fusion_bt import pick_batch_tile_fb, supported_fb

    # KITTI stage-2 decoder fusion ladder at B=128 (deconv default):
    # every scale except the full-res finest admits a tile.
    assert supported_fb(128, 8, 26, 256, 256, 256)     # up0, p=1
    assert supported_fb(128, 16, 52, 128, 128, 128)    # up1, p=1
    assert supported_fb(128, 32, 104, 64, 64, 64)      # up2, p=2
    assert supported_fb(128, 64, 208, 32, 32, 32)      # up3, p=4
    assert pick_batch_tile_fb(128, 8, 26, 256, 256, 256) >= 4
    # finest scale (128x416, cx=16 cl=32): VMEM working set exceeds the
    # budget at t=1 -> falls back to XLA (documented)
    assert not supported_fb(128, 128, 416, 16, 32, 16)
    # width not divisible by the pack factor -> unsupported
    assert not supported_fb(128, 64, 207, 32, 32, 32)
    # unpackable channel triple (48 needs p=8 -> 384 lanes)
    assert not supported_fb(128, 16, 52, 48, 48, 48)


def test_fused_fusion_bt_bf16_path(rng):
    """bf16 inputs + bf16 taps (the production configuration) stay
    within MXU-noise tolerance of the fp32 reference in interpret
    mode, and the output dtype follows x."""
    from gdn_tpu.kernels.fusion_bt import _reference_fb, fused_fusion_bt

    x, lat, wx, wl, scale, bias = _fb_data(rng, 4, 8, 16, 32, 32, 32)
    out = fused_fusion_bt(
        x.astype(jnp.bfloat16), lat.astype(jnp.bfloat16), wx, wl,
        scale, bias, 8, 1e-6, 2, True, "bfloat16",
    )
    assert out.dtype == jnp.bfloat16
    ref = _reference_fb(x, lat, wx, wl, scale, bias, 8, 1e-6)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.1, atol=0.06
    )
