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
