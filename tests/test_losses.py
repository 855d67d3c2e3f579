"""Loss terms vs a torch-CPU oracle (fp32 parity harness, SURVEY.md §4).

The oracle is an independent re-implementation of the reference's loss
math in torch (test oracle only — NOT a port): masked L1, gradient L1,
and Gaussian-window SSIM via conv2d.  Our SSIM uses band-matrix matmuls
instead of convs, so matching the conv oracle to ~1e-5 validates the
MXU formulation.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gdn_tpu import losses
from gdn_tpu.config import LossConfig
from gdn_tpu.ops.ssim import gaussian_window, ssim


def torch_ssim(pred, gt, max_val=1.0, window=11, sigma=1.5):
    w = torch.from_numpy(gaussian_window(window, sigma)).reshape(1, 1, window, window)
    p = torch.from_numpy(pred).unsqueeze(1)
    g = torch.from_numpy(gt).unsqueeze(1)
    pad = window // 2
    # reflect padding matches ops/ssim.blur_matrix's boundary handling
    p = F.pad(p, (pad,) * 4, mode="reflect")
    g = F.pad(g, (pad,) * 4, mode="reflect")
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    mu_x, mu_y = F.conv2d(p, w), F.conv2d(g, w)
    sxx = F.conv2d(p * p, w) - mu_x**2
    syy = F.conv2d(g * g, w) - mu_y**2
    sxy = F.conv2d(p * g, w) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2)
    return (num / den).mean().item()


def test_ssim_matches_torch_conv_oracle(rng):
    pred = rng.uniform(0, 1, size=(2, 64, 96)).astype(np.float32)
    gt = np.clip(pred + rng.normal(0, 0.05, size=pred.shape), 0, 1).astype(np.float32)
    ours = float(ssim(pred, gt, max_val=1.0))
    ref = torch_ssim(pred, gt)
    assert ours == pytest.approx(ref, abs=2e-5)


def test_ssim_identity_is_one(rng):
    x = rng.uniform(0, 1, size=(1, 48, 48)).astype(np.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-6)


def test_masked_l1_oracle(rng):
    pred = rng.uniform(0, 80, size=(3, 32, 48)).astype(np.float32)
    gt = rng.uniform(0, 80, size=pred.shape).astype(np.float32)
    mask = (rng.uniform(size=pred.shape) > 0.4).astype(np.float32)
    ours = float(losses.masked_l1(pred, gt, mask))
    tp, tg, tm = map(torch.from_numpy, (pred, gt, mask))
    ref = ((tp - tg).abs() * tm).sum() / tm.sum()
    assert ours == pytest.approx(ref.item(), rel=1e-6)


def test_gradient_loss_single_scale_oracle(rng):
    pred = rng.uniform(0, 10, size=(2, 16, 24)).astype(np.float32)
    gt = rng.uniform(0, 10, size=pred.shape).astype(np.float32)
    mask = np.ones_like(pred)
    ours = float(losses.gradient_loss(pred, gt, mask, num_scales=1))
    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)
    pdx, gdx = tp[:, :, 1:] - tp[:, :, :-1], tg[:, :, 1:] - tg[:, :, :-1]
    pdy, gdy = tp[:, 1:, :] - tp[:, :-1, :], tg[:, 1:, :] - tg[:, :-1, :]
    ref = (pdx - gdx).abs().mean() + (pdy - gdy).abs().mean()
    assert ours == pytest.approx(ref.item(), rel=1e-5)


def test_gradient_loss_zero_for_identical(rng):
    x = rng.uniform(0, 10, size=(1, 32, 32)).astype(np.float32)
    m = np.ones_like(x)
    assert float(losses.gradient_loss(x, x, m, num_scales=4)) == 0.0


def test_gradient_loss_respects_mask(rng):
    pred = rng.uniform(0, 10, size=(1, 16, 16)).astype(np.float32)
    gt = pred.copy()
    gt[0, 5, 5] += 100.0  # corrupt one pixel...
    mask = np.ones_like(pred)
    mask[0, 5, 5] = 0.0  # ...and mask it out
    val = float(losses.gradient_loss(pred, gt, mask, num_scales=1))
    assert val == pytest.approx(0.0, abs=1e-6)


def test_total_loss_composition(rng):
    cfg = LossConfig(w_recon=1.0, w_grad=0.5, w_ssim=0.25, w_latent=0.1)
    pred = rng.uniform(1, 79, size=(2, 32, 64)).astype(np.float32)
    gt = rng.uniform(1, 79, size=pred.shape).astype(np.float32)
    mask = np.ones_like(pred)
    lat_a = [rng.normal(size=(2, 4, 13, 8)).astype(np.float32)]
    lat_b = [rng.normal(size=(2, 4, 13, 8)).astype(np.float32)]
    t = losses.total_loss(pred, gt, mask, cfg, 80.0, lat_a, lat_b)
    expect = (
        1.0 * float(t["recon"]) + 0.5 * float(t["grad"])
        + 0.25 * float(t["ssim"]) + 0.1 * float(t["latent"])
    )
    assert float(t["total"]) == pytest.approx(expect, rel=1e-6)


def test_loss_is_differentiable(rng):
    import jax
    import jax.numpy as jnp

    cfg = LossConfig()
    gt = jnp.asarray(rng.uniform(1, 79, size=(1, 32, 32)).astype(np.float32))
    mask = jnp.ones_like(gt)

    def f(p):
        return losses.total_loss(p, gt, mask, cfg, 80.0)["total"]

    g = jax.grad(f)(gt * 0.9)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_padded_image_contributes_nothing(rng):
    """An all-zero-mask image (pad-and-mask row from loop=False loaders,
    data/batching.py) must contribute nothing to ANY loss term — incl.
    the unmasked-per-pixel SSIM via per-image validity weighting — and
    receive zero gradient."""
    import jax
    import jax.numpy as jnp
    from gdn_tpu.config import LossConfig
    from gdn_tpu.losses import total_loss

    cfg = LossConfig(grad_scales=2, use_pallas=False)
    pred3 = jnp.asarray(rng.uniform(1, 79, (3, 16, 24)).astype(np.float32))
    gt3 = jnp.asarray(rng.uniform(1, 79, (3, 16, 24)).astype(np.float32))
    mask3 = jnp.ones((3, 16, 24), jnp.float32).at[2].set(0.0)  # row 2 padded

    t3 = total_loss(pred3, gt3, mask3, cfg, 80.0)
    t2 = total_loss(pred3[:2], gt3[:2], mask3[:2], cfg, 80.0)
    for k in ("recon", "grad", "ssim", "total"):
        assert float(t3[k]) == pytest.approx(float(t2[k]), rel=1e-6), k

    g = jax.grad(
        lambda p: total_loss(p, gt3, mask3, cfg, 80.0)["total"]
    )(pred3)
    np.testing.assert_array_equal(np.asarray(g[2]), 0.0)
    assert float(jnp.sum(jnp.abs(g[:2]))) > 0.0


def test_padded_image_contributes_nothing_fused(rng):
    """Same contract through the fused Pallas kernel (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from gdn_tpu.kernels.fused_loss import fused_loss_terms

    pred3 = jnp.asarray(rng.uniform(1, 79, (3, 16, 24)).astype(np.float32))
    gt3 = jnp.asarray(rng.uniform(1, 79, (3, 16, 24)).astype(np.float32))
    mask3 = jnp.ones((3, 16, 24), jnp.float32).at[2].set(0.0)

    f3 = fused_loss_terms(pred3, gt3, mask3, 80.0, interpret=True)
    f2 = fused_loss_terms(pred3[:2], gt3[:2], mask3[:2], 80.0, interpret=True)
    for k in ("recon", "grad0", "ssim"):
        assert float(f3[k]) == pytest.approx(float(f2[k]), rel=1e-6), k

    g = jax.grad(
        lambda p: sum(
            fused_loss_terms(p, gt3, mask3, 80.0, interpret=True).values()
        )
    )(pred3)
    np.testing.assert_array_equal(np.asarray(g[2]), 0.0)


def test_multiscale_depth_loss_perfect_and_weighting():
    import jax.numpy as jnp

    from gdn_tpu.losses import multiscale_depth_loss
    from gdn_tpu.ops.resize import resize_nearest

    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(1, 79, (2, 16, 32)).astype(np.float32))
    mask = jnp.ones((2, 16, 32), jnp.float32)
    perfect = [
        resize_nearest(gt[..., None], (8, 16)),
        gt[..., None],
    ]
    assert float(multiscale_depth_loss(perfect, gt, mask)) == 0.0

    # off-by-c at the coarse scale only: weighted (0.5*c)/(1.5)
    c = 3.0
    preds = [perfect[0] + c, perfect[1]]
    val = float(multiscale_depth_loss(preds, gt, mask))
    assert val == pytest.approx(0.5 * c / 1.5, rel=1e-6)


def test_total_loss_scales_term_wiring():
    import jax.numpy as jnp

    from gdn_tpu.config import LossConfig
    from gdn_tpu.losses import total_loss

    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(1, 79, (1, 16, 32, 1)).astype(np.float32))
    mask = jnp.ones_like(gt)
    pred = gt * 1.1
    coarse = jnp.asarray(
        rng.uniform(1, 79, (1, 8, 16, 1)).astype(np.float32)
    )
    cfg = LossConfig(use_pallas=False, grad_scales=2, w_scales=0.7)
    base = total_loss(pred, gt, mask, cfg, 80.0)
    with_s = total_loss(pred, gt, mask, cfg, 80.0, scale_preds=[coarse])
    assert "scales" not in base
    assert float(with_s["total"]) == pytest.approx(
        float(base["total"]) + 0.7 * float(with_s["scales"]), rel=1e-6
    )
