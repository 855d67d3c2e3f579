"""Model shape/dtype/transfer contracts (SURVEY.md §4 unit tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdn_tpu.config import ModelConfig
from gdn_tpu.models import Decoder, DtoDNet, Encoder, RtoDNet

SMALL = ModelConfig(
    image_size=(32, 64),
    enc_channels=(8, 16, 32),
    dec_channels=(16, 8, 8),
    dtype="float32",
    max_depth=80.0,
)


def _init(model, shape, seed=0):
    x = jnp.zeros(shape, jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), x)
    return params, x


def test_dtod_shapes():
    model = DtoDNet(cfg=SMALL)
    params, x = _init(model, (2, 32, 64, 1))
    out = model.apply(params, x)
    assert out["depth"].shape == (2, 32, 64, 1)
    assert out["depth"].dtype == jnp.float32
    assert out["latent"].shape == (2, 4, 8, 32)  # /8 with 3 stages
    assert len(out["dec_feats"]) == 3
    assert len(out["skips"]) == 3
    d = np.asarray(out["depth"])
    assert d.min() >= 0.0 and d.max() <= SMALL.max_depth


def test_rtod_shapes():
    model = RtoDNet(cfg=SMALL)
    params, x = _init(model, (2, 32, 64, 3))
    out = model.apply(params, x)
    assert out["depth"].shape == (2, 32, 64, 1)
    assert out["latent"].shape == (2, 4, 8, 32)


def test_feature_contract_matches_across_stages():
    """G-net features must be zip-compatible with D-net features for the
    guidance loss (SURVEY.md §2.3 feature contract)."""
    d_model, g_model = DtoDNet(cfg=SMALL), RtoDNet(cfg=SMALL)
    dp, dx = _init(d_model, (1, 32, 64, 1))
    gp, gx = _init(g_model, (1, 32, 64, 3))
    do, go = d_model.apply(dp, dx), g_model.apply(gp, gx)
    assert do["latent"].shape == go["latent"].shape
    for a, b in zip(do["dec_feats"], go["dec_feats"]):
        assert a.shape == b.shape


def test_decoder_params_transferable():
    """Decoder param subtrees must be shape-identical between stages so
    stage-1 -> stage-2 transfer is a plain copy."""
    d_model, g_model = DtoDNet(cfg=SMALL), RtoDNet(cfg=SMALL)
    dp, _ = _init(d_model, (1, 32, 64, 1))
    gp, _ = _init(g_model, (1, 32, 64, 3))
    d_dec = dp["params"]["decoder"]
    g_dec = gp["params"]["decoder"]
    d_shapes = jax.tree.map(lambda a: a.shape, d_dec)
    g_shapes = jax.tree.map(lambda a: a.shape, g_dec)
    assert d_shapes == g_shapes


def test_odd_resolution_roundtrip():
    """NYU-style sizes that are not multiples of 2^k must round-trip
    exactly (resize-to-skip-size decoder)."""
    cfg = ModelConfig(
        image_size=(57, 76), enc_channels=(4, 8, 16), dec_channels=(8, 4, 4),
        dtype="float32", max_depth=10.0,
    )
    model = RtoDNet(cfg=cfg)
    params, x = _init(model, (1, 57, 76, 3))
    out = model.apply(params, x)
    assert out["depth"].shape == (1, 57, 76, 1)


def test_deconv_upsample_variant():
    cfg = ModelConfig(
        image_size=(32, 64), enc_channels=(4, 8), dec_channels=(8, 4),
        dtype="float32", upsample="deconv",
    )
    model = DtoDNet(cfg=cfg)
    params, x = _init(model, (1, 32, 64, 1))
    out = model.apply(params, x)
    assert out["depth"].shape == (1, 32, 64, 1)


def test_add_fusion_variant():
    cfg = ModelConfig(
        image_size=(32, 64), enc_channels=(4, 8), dec_channels=(8, 4),
        dtype="float32", fusion="add",
    )
    model = DtoDNet(cfg=cfg)
    params, x = _init(model, (1, 32, 64, 1))
    assert model.apply(params, x)["depth"].shape == (1, 32, 64, 1)


def test_bf16_compute_fp32_params_and_output():
    cfg = ModelConfig(
        image_size=(32, 64), enc_channels=(4, 8), dec_channels=(8, 4),
        dtype="bfloat16",
    )
    model = DtoDNet(cfg=cfg)
    params, x = _init(model, (1, 32, 64, 1))
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32
    out = model.apply(params, x)
    assert out["depth"].dtype == jnp.float32  # head forces fp32
    assert out["latent"].dtype == jnp.bfloat16


def test_model_is_jittable_and_differentiable():
    model = DtoDNet(cfg=SMALL)
    params, x = _init(model, (1, 32, 64, 1))
    x = jnp.full_like(x, 10.0)

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, x)
        return jnp.mean((out["depth"] - x) ** 2)

    g = jax.grad(loss_fn)(params)
    flat = [np.asarray(l) for l in jax.tree.leaves(g)]
    assert all(np.all(np.isfinite(a)) for a in flat)
    assert any(np.abs(a).sum() > 0 for a in flat)


TINY_MC = ModelConfig(
    image_size=(16, 32), enc_channels=(8, 16), dec_channels=(16, 8),
    dtype="float32",
)


def test_convblock_param_tree_layout_stable():
    """Checkpoint-compat regression: the round-3 ConvBlock restructure
    (owned kernel param routed through XLA or the fused Pallas kernel)
    must keep the historical tree layout .../Conv_0/kernel +
    gn_scale/gn_bias — round-2 checkpoints restore against it."""
    m = DtoDNet(cfg=TINY_MC)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 1)))["params"]
    stem = p["encoder"]["stem"]
    assert set(stem.keys()) == {"Conv_0", "gn_scale", "gn_bias"}
    assert set(stem["Conv_0"].keys()) == {"kernel"}
    assert stem["Conv_0"]["kernel"].shape == (7, 7, 1, 8)
    down = p["encoder"]["down0"]["ConvBlock_0"]
    assert set(down.keys()) == {"Conv_0", "gn_scale", "gn_bias"}


def test_deconv_gn_variant_forward_and_tree():
    """deconv_gn adds the GN epilogue params to UpBlocks and keeps the
    default (off) tree free of them (round-2 deconv ckpt compat)."""
    import dataclasses

    base = dataclasses.replace(TINY_MC, upsample="deconv")
    withgn = dataclasses.replace(base, deconv_gn=True)
    x = jnp.ones((1, 16, 32, 1))
    for cfg, has_gn in ((base, False), (withgn, True)):
        m = DtoDNet(cfg=cfg)
        p = m.init(jax.random.PRNGKey(0), x)["params"]
        up0 = p["decoder"]["up0"]
        assert ("deconv_gn_scale" in up0) == has_gn
        # ConvTranspose bias present exactly when the GN epilogue is off
        assert ("bias" in up0["ConvTranspose_0"]) == (not has_gn)
        out = m.apply({"params": p}, x)
        assert out["depth"].shape == (1, 16, 32, 1)
        assert np.isfinite(np.asarray(out["depth"])).all()


def test_multiscale_heads_shapes_and_default_off():
    import dataclasses

    m_off = DtoDNet(cfg=TINY_MC)
    x = jnp.ones((1, 16, 32, 1))
    p_off = m_off.init(jax.random.PRNGKey(0), x)["params"]
    out = m_off.apply({"params": p_off}, x)
    assert out["depth_scales"] == []
    assert "head0" not in p_off["decoder"]

    mc = dataclasses.replace(TINY_MC, multiscale_heads=True)
    m_on = DtoDNet(cfg=mc)
    p_on = m_on.init(jax.random.PRNGKey(0), x)["params"]
    out = m_on.apply({"params": p_on}, x)
    scales = out["depth_scales"]
    # 2 decoder scales -> 1 coarse head + the final depth
    assert len(scales) == 2
    assert scales[0].shape == (1, 8, 16, 1)   # coarse scale
    assert scales[-1].shape == (1, 16, 32, 1)
    np.testing.assert_array_equal(
        np.asarray(scales[-1]), np.asarray(out["depth"])
    )
    assert "head0" in p_on["decoder"]


def test_deconv_bilinear_init_composes_resize_conv():
    """deconv_init="bilinear": the 6x6 stride-2 ConvTranspose kernel
    composed by ops.resize.compose_bilinear_deconv_kernel must make the
    flax deconv branch compute conv3x3(resize_bilinear_2x(x)) on
    interior pixels at init (the resize_conv branch's function — the
    de-confounded starting point for the convergence comparison)."""
    import dataclasses

    from gdn_tpu.models.blocks import UpBlock
    from gdn_tpu.ops.resize import (
        compose_bilinear_deconv_kernel,
        resize_bilinear,
    )

    rng = np.random.RandomState(0)
    cin, cout, h, w = 16, 8, 8, 12
    x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
    k3 = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)

    ref = jax.lax.conv_general_dilated(
        resize_bilinear(x, (2 * h, 2 * w)), k3, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ref = jax.nn.elu(ref)

    cfg = dataclasses.replace(
        SMALL, upsample="deconv", deconv_init="bilinear", deconv_gn=False
    )
    blk = UpBlock(cout, cfg=cfg)
    variables = blk.init(jax.random.PRNGKey(1), x, (2 * h, 2 * w))
    # kernel shape sanity: the bilinear-composed 6x6
    assert variables["params"]["ConvTranspose_0"]["kernel"].shape == (
        6, 6, cin, cout,
    )
    params = jax.tree.map(lambda t: t, variables["params"])
    params["ConvTranspose_0"]["kernel"] = compose_bilinear_deconv_kernel(k3)
    params["ConvTranspose_0"]["bias"] = jnp.zeros((cout,), jnp.float32)
    got = blk.apply({"params": params}, x, (2 * h, 2 * w))
    np.testing.assert_allclose(
        np.asarray(got)[:, 3:-3, 3:-3, :],
        np.asarray(ref)[:, 3:-3, 3:-3, :],
        rtol=1e-5, atol=1e-5,
    )


def test_norm_none_forward_and_decoder_transfer():
    """The no-norm ConvBlock path (--norm none, measured +6.6% step,
    BASELINE.md) must run both models and keep the transfer contract."""
    import jax.numpy as jnp

    from gdn_tpu.checkpoint import transfer_stage1_decoder
    from gdn_tpu.config import Config, ModelConfig, TrainConfig
    from gdn_tpu.models import DtoDNet, RtoDNet
    from gdn_tpu.train import create_state

    cfg = Config(
        model=ModelConfig(
            image_size=(32, 64), enc_channels=(8, 16), dec_channels=(16, 8),
            dtype="float32", norm="none",
        ),
        train=TrainConfig(ckpt_dir=""),
    )
    d = create_state(DtoDNet(cfg=cfg.model), (1, 32, 64, 1), cfg.train, 1)
    g = create_state(RtoDNet(cfg=cfg.model), (1, 32, 64, 3), cfg.train, 1)
    out = RtoDNet(cfg=cfg.model).apply(
        {"params": transfer_stage1_decoder(g.params, d.params)},
        jnp.ones((2, 32, 64, 3)),
    )
    assert out["depth"].shape == (2, 32, 64, 1)
    assert bool(jnp.isfinite(out["depth"]).all())
