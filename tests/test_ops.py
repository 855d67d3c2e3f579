"""Pinned-op semantics vs the torch fp32 oracle (SURVEY.md §7 hard
part: "resize kernels differ between PIL/cv2 and jax.image — must pin
the exact interpolation").

Established contract: the framework's bilinear (ops/resize.py,
jax.image "bilinear") == torch ``F.interpolate(..., mode="bilinear",
align_corners=False, antialias=True)`` to float32 ulp, on both up- and
downscale.  The native C++ decoder's triangle-filter resize and PIL's
BILINEAR match the same convention (tests/test_data.py).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gdn_tpu.ops.resize import resize_bilinear, resize_nearest


@pytest.mark.parametrize("size", [(128, 192), (32, 48), (375, 1242)])
def test_bilinear_matches_torch_antialias(rng, size):
    x = rng.uniform(0, 80, (64, 96)).astype(np.float32)
    ours = np.asarray(resize_bilinear(x, size))
    ref = F.interpolate(
        torch.from_numpy(x)[None, None], size=size, mode="bilinear",
        align_corners=False, antialias=True,
    )[0, 0].numpy()
    # tolerance ~ fp32 eps * value range (80 m): accumulation order differs
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_bilinear_batched_channels(rng):
    x = rng.uniform(0, 1, (2, 64, 96, 3)).astype(np.float32)
    out = np.asarray(resize_bilinear(x, (32, 48)))
    assert out.shape == (2, 32, 48, 3)
    ref = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(32, 48),
        mode="bilinear", align_corners=False, antialias=True,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_nearest_preserves_values(rng):
    # sparse LiDAR-like map: nearest must not invent in-between values
    x = np.zeros((64, 96), np.float32)
    idx = rng.integers(0, 64 * 96, 200)
    vals = rng.uniform(1, 80, 200).astype(np.float32)
    x.flat[idx] = vals
    out = np.asarray(resize_nearest(x, (32, 48)))
    assert set(np.round(np.unique(out), 4)) <= set(np.round(np.unique(x), 4))


def test_resize_preserves_dtype(rng):
    import jax.numpy as jnp

    x = jnp.asarray(rng.uniform(0, 1, (16, 16)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    assert resize_bilinear(x, (8, 8)).dtype == jnp.bfloat16


def test_upsample2x_matches_resize_bilinear(rng):
    from gdn_tpu.ops.resize import resize_bilinear, upsample2x_bilinear

    x = rng.uniform(0, 80, (2, 7, 9, 3)).astype(np.float32)
    ours = np.asarray(upsample2x_bilinear(x))
    ref = np.asarray(resize_bilinear(x, (14, 18)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-5)


def test_group_norm_impls_agree_and_match_torch(rng):
    """ops/groupnorm: 'grouped' and 'chanreduce' formulations must agree
    with each other and with torch.nn.functional.group_norm (fp32)."""
    import jax.numpy as jnp
    from gdn_tpu.ops.groupnorm import group_norm_act

    b, h, w, c, g = 3, 10, 14, 16, 4
    x = rng.normal(size=(b, h, w, c)).astype(np.float32) * 3 + 1
    scale = rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32)
    bias = rng.normal(size=(c,)).astype(np.float32)

    a = np.asarray(group_norm_act(jnp.asarray(x), jnp.asarray(scale),
                                  jnp.asarray(bias), g, impl="grouped"))
    bv = np.asarray(group_norm_act(jnp.asarray(x), jnp.asarray(scale),
                                   jnp.asarray(bias), g, impl="chanreduce"))
    np.testing.assert_allclose(a, bv, rtol=1e-4, atol=1e-5)

    ref = F.group_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), g,
        torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-6,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(a, ref, rtol=1e-3, atol=1e-4)


def test_group_norm_activation_fused(rng):
    import jax.numpy as jnp
    import flax.linen as nn
    from gdn_tpu.ops.groupnorm import group_norm_act

    x = jnp.asarray(rng.normal(size=(2, 6, 8, 8)).astype(np.float32))
    s = jnp.ones((8,), jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    plain = group_norm_act(x, s, b, 2, impl="chanreduce")
    with_act = group_norm_act(x, s, b, 2, activation=nn.elu, impl="chanreduce")
    np.testing.assert_allclose(
        np.asarray(with_act), np.asarray(nn.elu(plain)), rtol=1e-6, atol=1e-6
    )


def test_group_norm_elu_analytic_value_and_grad(rng):
    """group_norm_elu_analytic: forward bit-matches the chanreduce+ELU
    path; its hand-written VJP matches autodiff of that path (fp32)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from gdn_tpu.ops.groupnorm import group_norm_act, group_norm_elu_analytic

    b, h, w, c, g = 2, 6, 10, 16, 4
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32) * 2 - 0.5)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))

    def ref(x, s, bi):
        return group_norm_act(x, s, bi, g, activation=nn.elu, impl="chanreduce")

    def ours(x, s, bi):
        return group_norm_elu_analytic(x, s, bi, g)

    np.testing.assert_array_equal(
        np.asarray(ours(x, scale, bias)), np.asarray(ref(x, scale, bias))
    )
    # weighted-sum scalar so the cotangent exercises every element
    g_ref = jax.grad(lambda *a: jnp.vdot(ref(*a), ct), argnums=(0, 1, 2))(
        x, scale, bias
    )
    g_ours = jax.grad(lambda *a: jnp.vdot(ours(*a), ct), argnums=(0, 1, 2))(
        x, scale, bias
    )
    for got, want in zip(g_ours, g_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )


def test_gn_analytic_vjp_step_matches_default(rng):
    """A stage-1 train step with cfg.model.gn_analytic_vjp=True produces
    the same loss and (to fp32 tolerance) the same updated params as the
    autodiff default — the flag only changes HOW gradients are computed."""
    import dataclasses
    import jax.numpy as jnp
    from gdn_tpu.config import kitti_config
    from gdn_tpu.data.synthetic import synthetic_batch
    from gdn_tpu.models import DtoDNet
    from gdn_tpu.train import create_state, make_stage1_step
    import jax

    def run(analytic: bool):
        cfg = kitti_config(**{
            "model.image_size": (32, 64),
            "model.dtype": "float32",
            "data.batch_size": 2,
            "train.ckpt_dir": "",
        })
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, gn_analytic_vjp=analytic)
        )
        state = create_state(DtoDNet(cfg=cfg.model), (1, 32, 64, 1), cfg.train, 1)
        step = make_stage1_step(cfg)
        batch = synthetic_batch(jax.random.PRNGKey(0), 2, 32, 64, 80.0)
        state, terms = step(state, batch)
        return float(terms["total"]), state.params

    loss_a, params_a = run(False)
    loss_b, params_b = run(True)
    assert loss_a == loss_b  # forward is bit-identical
    flat_a = jax.tree_util.tree_leaves(params_a)
    flat_b = jax.tree_util.tree_leaves(params_b)
    for pa, pb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=5e-3, atol=2e-5
        )


def test_elu_saveout_value_and_grad(rng):
    """ops/elu.elu_saveout: forward bit-equal to jax.nn.elu; gradient
    exact vs autodiff (elu' from the OUTPUT: y>0 ? 1 : y+1)."""
    import jax
    import jax.numpy as jnp

    from gdn_tpu.ops.elu import elu_saveout

    for dtype in (np.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((4, 8, 8, 16)), dtype) * 3.0
        np.testing.assert_array_equal(
            np.asarray(elu_saveout(x), np.float32),
            np.asarray(jax.nn.elu(x), np.float32),
        )
        g = jnp.asarray(rng.standard_normal((4, 8, 8, 16)), dtype)
        ga = jax.vjp(jax.nn.elu, x)[1](g)[0]
        gb = jax.vjp(elu_saveout, x)[1](g)[0]
        # exp(x) vs y+1: identical reals, one bf16 rounding apart
        np.testing.assert_allclose(
            np.asarray(ga, np.float32), np.asarray(gb, np.float32),
            rtol=2e-2 if dtype == jnp.bfloat16 else 1e-6, atol=1e-6,
        )


def test_elu_outform_vjp_step_matches_default(rng):
    """elu_outform_vjp=True must not change the stage-1 forward (bit)
    nor the parameter update beyond dtype-rounding noise."""
    import dataclasses

    import jax

    from gdn_tpu.config import kitti_config
    from gdn_tpu.data.synthetic import synthetic_batch
    from gdn_tpu.models import DtoDNet
    from gdn_tpu.train.state import create_state
    from gdn_tpu.train.steps import make_stage1_step

    def run(outform):
        cfg = kitti_config(**{
            "model.image_size": (32, 64),
            "data.batch_size": 2,
            "train.ckpt_dir": "",
        })
        # upsample="deconv" explicitly: the outform ELU VJP lives on the
        # deconv branch (the overall default is resize_conv since the
        # round-4 full-res convergence revert).
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, elu_outform_vjp=outform, upsample="deconv")
        )
        state = create_state(DtoDNet(cfg=cfg.model), (1, 32, 64, 1),
                             cfg.train, 1)
        step = make_stage1_step(cfg)
        batch = synthetic_batch(jax.random.PRNGKey(0), 2, 32, 64, 80.0)
        state, terms = step(state, batch)
        return float(terms["total"]), state.params

    loss_a, params_a = run(False)
    loss_b, params_b = run(True)
    assert loss_a == loss_b  # forward is bit-identical
    for pa, pb in zip(jax.tree_util.tree_leaves(params_a),
                      jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=5e-3, atol=2e-5
        )


@pytest.mark.parametrize("hw", [(9, 13), (4, 13), (16, 52), (2, 2)])
def test_composed_resize_conv2x_exact(rng, hw):
    """composed_resize_conv2x == conv3x3_SAME(resize_bilinear_2x(x))
    EVERYWHERE — including the boundary (the thin-slab edge fix), at
    float-rounding tolerance, for values and both gradients.  This
    exactness is what lets ModelConfig.resize_conv_composed swap the
    execution without new convergence evidence (same trained
    function, same checkpoints)."""
    import jax
    import jax.numpy as jnp

    from gdn_tpu.ops.resize import composed_resize_conv2x

    h, w = hw
    cin, cout = 6, 4
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
    k3 = jnp.asarray(
        rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)

    def ref(x, k):
        up = resize_bilinear(x, (2 * h, 2 * w))
        return jax.lax.conv_general_dilated(
            up, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    r, g = ref(x, k3), composed_resize_conv2x(x, k3)
    np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                               rtol=1e-4, atol=1e-5)

    gr = jax.grad(lambda x, k: jnp.sum(ref(x, k) ** 2), (0, 1))(x, k3)
    gg = jax.grad(lambda x, k: jnp.sum(composed_resize_conv2x(x, k) ** 2),
                  (0, 1))(x, k3)
    for a, b in zip(gr, gg):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 1e-5


def test_composed_resize_conv_model_equivalence(rng):
    """Full RtoD forward with resize_conv_composed on vs off: identical
    param tree (checkpoints interchangeable across the flag) and equal
    outputs at fp32."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gdn_tpu.config import ModelConfig
    from gdn_tpu.models import RtoDNet

    # base must EXPLICITLY disable the flag — it defaults to True, so
    # relying on the default would compare the composed path to itself.
    base = ModelConfig(
        image_size=(32, 64), enc_channels=(8, 16), dec_channels=(16, 8),
        dtype="float32", use_pallas=False, resize_conv_composed=False,
    )
    on = dataclasses.replace(base, resize_conv_composed=True)
    x = jnp.asarray(rng.normal(size=(2, 32, 64, 3)).astype(np.float32))

    p = RtoDNet(cfg=base).init(jax.random.PRNGKey(0), x)["params"]
    p_on = RtoDNet(cfg=on).init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        p_on)

    out_off = RtoDNet(cfg=base).apply({"params": p}, x)
    out_on = RtoDNet(cfg=on).apply({"params": p}, x)
    np.testing.assert_allclose(
        np.asarray(out_on["depth"]), np.asarray(out_off["depth"]),
        rtol=1e-4, atol=1e-4,
    )
