"""Custom-VJP shared guided-decoder pass (TrainConfig.fused_guidance_vjp).

The fused-guidance formulation (train/steps._stage2_loss_fused) runs the
frozen transferred decoder ONCE on the batch-concatenated D+G encoder
outputs — halving the decoder's forward op count, which is the profiled
per-op-latency step floor (BASELINE.md).  But autodiff then pulls the
backward through the full 2B-wide decoder even though the d-half carries
zero cotangent (its outputs are consumed under stop_gradient) — the
measured -21% at B=128.

This pair keeps the 2B-wide forward and hand-writes the backward:
recompute the g-half forward (B-wide) under ``jax.vjp`` and pull only
the g-half cotangents through that.  Valid because the decoder is
per-sample (convs + per-sample GroupNorm): ``decode(concat(d, g))[b:]``
equals ``decode(g)`` elementwise, so gradients evaluated at the
recomputed activations are the true ones.

Caller contract (enforced by _stage2_loss_fused's structure, tested in
tests/test_train.py):
  - the d-half outputs are consumed only under stop_gradient (their
    cotangents are zero; this backward drops them);
  - the decoder is frozen (freeze_decoder) — a zero cotangent is
    returned for ``dec_params``.

Cost: fwd(2B) + fwd(B) + input-bwd(B) versus autodiff's fwd(2B) +
bwd(2B); the B-wide recompute also halves the decoder's saved-residual
memory (nothing from the 2B forward is kept).
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from gdn_tpu.config import ModelConfig

DecoderOut = Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]


def _decode(cfg: ModelConfig, dec_params, latent, skips) -> DecoderOut:
    from gdn_tpu.models.decoder import Decoder

    return Decoder(cfg=cfg).apply({"params": dec_params}, latent, list(skips))


def _decode_concat(cfg, dec_params, d_latent, g_latent, d_skips, g_skips):
    latent = jnp.concatenate([d_latent, g_latent])
    skips = [jnp.concatenate([d, g]) for d, g in zip(d_skips, g_skips)]
    return _decode(cfg, dec_params, latent, skips)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def shared_guided_decoder(
    cfg: ModelConfig,
    dec_params: Any,
    d_latent: jnp.ndarray,
    g_latent: jnp.ndarray,
    d_skips: Sequence[jnp.ndarray],
    g_skips: Sequence[jnp.ndarray],
) -> DecoderOut:
    """Decode the concatenated (D, G) batch; outputs are 2B-wide with
    the d-half first.  See the module docstring for the VJP contract."""
    return _decode_concat(cfg, dec_params, d_latent, g_latent, d_skips, g_skips)


def _fwd(cfg, dec_params, d_latent, g_latent, d_skips, g_skips):
    out = _decode_concat(cfg, dec_params, d_latent, g_latent, d_skips, g_skips)
    return out, (dec_params, g_latent, g_skips)


def _bwd(cfg, res, ct):
    dec_params, g_latent, g_skips = res
    b = g_latent.shape[0]
    ct_g = jax.tree.map(lambda t: t[b:], ct)
    _, vjp = jax.vjp(
        lambda gl, gs: _decode(cfg, dec_params, gl, gs), g_latent, g_skips
    )
    d_g_latent, d_g_skips = vjp(ct_g)
    return (
        jax.tree.map(jnp.zeros_like, dec_params),  # frozen by contract
        jnp.zeros_like(g_latent),  # d_latent: same shape ladder as g
        d_g_latent,
        # cotangent structures must mirror the primal args' (lists)
        [jnp.zeros_like(s) for s in g_skips],
        d_g_skips,
    )


shared_guided_decoder.defvjp(_fwd, _bwd)
