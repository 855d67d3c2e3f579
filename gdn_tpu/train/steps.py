"""Jitted, mesh-aware train/eval steps for both stages.

Replaces the reference's per-batch Python loops + autograd + DataParallel
scatter/gather (SURVEY.md §3.1/§3.2/§3.5) with single fused XLA programs:
forward + loss + backward + Adam update compile into one executable per
stage; under a multi-chip mesh the batch is sharded on "data", params
are replicated, and XLA inserts the gradient all-reduce over ICI.

Batches are dicts:
  depth: (B, H, W, 1) float32 metric depth (GT)
  mask:  (B, H, W, 1) float32 validity
  rgb:   (B, H, W, 3) float32 in [0, 1]  (stage 2 / eval)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from gdn_tpu.config import Config
from gdn_tpu.losses import total_loss
from gdn_tpu.parallel.mesh import (
    batch_sharding, replicated, spatial_size, stacked_batch_sharding,
)
from gdn_tpu.train.state import TrainState

Batch = Dict[str, jnp.ndarray]


def _refuse_quant(cfg: Config) -> None:
    """quant="int8" is deployment-time PTQ: jnp.round has a zero
    gradient, so a quantized TRAIN step would silently learn nothing.
    Fail loudly here instead (ops/quant.py docstring)."""
    if cfg.model.quant != "none":
        raise ValueError(
            f"training with model.quant={cfg.model.quant!r} is not "
            "supported (post-training quantization is inference-only; "
            "train with quant='none' and quantize at deployment)"
        )


def _spatial_safe_cfg(cfg: Config, mesh: Optional[Mesh]) -> Config:
    """On a spatial mesh, route the loss through the jnp path: a Pallas
    custom call has no SPMD partitioning rule, so under height-sharded
    inputs XLA would have to all-gather around it — the jnp SSIM/grad
    losses partition natively (the blur convs get halo exchanges, the
    reductions become psums).

    Also forces ``resize_conv_composed=False``: with height-sharded
    inputs the SPMD partitioner MISCOMPILES the composed op's kernel
    gradient (measured dk rel-err 0.16 on the (2,4) CPU mesh — the
    combined contributions from the conv_transpose + edge-slab convs
    onto the shared 3x3 parameter are reduced wrong; each piece alone
    and the unfused path are exact, and 1-D data meshes are exact).
    The flag is execution-only (same function, same params —
    tests/test_ops.py), so flipping it per-mesh changes no math.
    """
    if spatial_size(mesh) <= 1:
        return cfg
    if cfg.loss.use_pallas:
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, use_pallas=False)
        )
    if cfg.model.resize_conv_composed:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, resize_conv_composed=False)
        )
    return cfg


def _model_apply_override(orig: Config, safe: Config, net_cls):
    """When :func:`_spatial_safe_cfg` changed the MODEL config
    (execution-only flags like ``resize_conv_composed``),
    ``state.apply_fn`` — bound at ``create_state`` time from the
    original cfg — must be replaced by an apply built from the safe
    one.  The param tree is identical across these flags
    (tests/test_ops.py model-equivalence test), so the swap changes
    execution strategy only."""
    if safe.model == orig.model:
        return None
    return net_cls(cfg=safe.model).apply


def _apply_update(state: TrainState, grads, cfg: Config) -> TrainState:
    """apply_gradients + the optional EMA (Polyak) parameter average.

    The EMA update is two fused elementwise ops per leaf inside the
    same jitted step (no extra dispatch); with ema_decay unset it is
    a no-op and the program is unchanged.
    """
    new_state = state.apply_gradients(grads=grads)
    d = cfg.train.ema_decay
    if d and state.ema_params is not None:
        new_ema = jax.tree.map(
            lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
            state.ema_params,
            new_state.params,
        )
        if cfg.train.grad_accum > 1:
            # EMA averages optimizer UPDATES: on pure-accumulation
            # micro-steps (params unchanged) keep the old average.
            # MultiSteps is the outermost transform, so its state heads
            # the opt_state; mini_step wraps to 0 right after an apply.
            applied = _multisteps_state(new_state.opt_state).mini_step == 0
            new_ema = jax.tree.map(
                lambda ne, e: jnp.where(applied, ne, e),
                new_ema, state.ema_params,
            )
        new_state = new_state.replace(ema_params=new_ema)
    return new_state


def _multisteps_state(opt_state):
    """The optax.MultiStepsState, whether or not flax wrapped the chain."""
    if isinstance(opt_state, optax.MultiStepsState):
        return opt_state
    return opt_state[0]


def _maybe_remat(apply_fn, cfg: Config):
    """Wrap a flax apply in jax.checkpoint when cfg.train.remat: the
    backward then recomputes the forward instead of reading stored
    activations — recompute FLOPs for HBM bytes (the step is
    bandwidth-bound past B~128, BASELINE.md)."""
    if not cfg.train.remat:
        return apply_fn
    policy = getattr(jax.checkpoint_policies, cfg.train.remat_policy)
    return jax.checkpoint(apply_fn, policy=policy)


def _stage1_loss(params, apply_fn, batch: Batch, cfg: Config):
    out = _maybe_remat(apply_fn, cfg)({"params": params}, batch["depth"])
    terms = total_loss(
        out["depth"], batch["depth"], batch["mask"],
        cfg.loss, cfg.model.max_depth,
        # coarse heads only: the finest entry IS out["depth"], already
        # covered by the recon/grad/SSIM terms (empty when the
        # multiscale_heads flag is off)
        scale_preds=out["depth_scales"][:-1],
    )
    return terms["total"], terms


def _freeze_decoder_params(params, cfg: Config):
    """With cfg.train.freeze_decoder the optimizer routes decoder leaves
    to set_to_zero (state.py), so their gradients are computed by
    autodiff and then discarded.  Stop-gradding the frozen subtree here
    lets XLA dead-code-eliminate every decoder weight-gradient conv —
    identical updates (the clip/Adam chain only ever sees trainable
    leaves inside the multi_transform), measurably less backward work.
    """
    if cfg.train.freeze_decoder and "decoder" in params:
        return {**params, "decoder": jax.lax.stop_gradient(params["decoder"])}
    return params


def _stage2_loss(params, d_params, apply_fn, d_apply_fn, batch: Batch, cfg: Config):
    params = _freeze_decoder_params(params, cfg)
    # Frozen D-net runs on GT depth (no grad) to produce guidance targets.
    d_out = d_apply_fn({"params": d_params}, batch["depth"])
    g_out = _maybe_remat(apply_fn, cfg)({"params": params}, batch["rgb"])
    stop = jax.lax.stop_gradient
    terms = total_loss(
        g_out["depth"], batch["depth"], batch["mask"],
        cfg.loss, cfg.model.max_depth,
        pred_latents=[g_out["latent"], *g_out["dec_feats"]],
        target_latents=[stop(d_out["latent"]), *map(stop, d_out["dec_feats"])],
        scale_preds=g_out["depth_scales"][:-1],
    )
    return terms["total"], terms


def _stage2_loss_fused(params, d_params, batch: Batch, cfg: Config):
    """Stage-2 loss with ONE shared decoder pass (TrainConfig.
    fused_guidance): the D-net encoder (no grad) and the G-net encoder
    run separately, then the frozen transferred decoder — identical
    params in both nets by the freeze_decoder contract — runs ONCE on
    the batch-concatenated (latent, skips).  Math is bit-identical to
    the two-net formulation (convs and GroupNorm are per-sample), with
    half the decoder's op count (the profiled per-op-latency floor).
    """
    from gdn_tpu.models.decoder import Decoder
    from gdn_tpu.models.encoder import Encoder

    params = _freeze_decoder_params(params, cfg)
    stop = jax.lax.stop_gradient
    enc = Encoder(cfg=cfg.model)
    dec = Decoder(cfg=cfg.model)
    b = batch["depth"].shape[0]

    if cfg.train.fused_encoders:
        from gdn_tpu.train.fused_encoders import paired_encoders

        d_latent, g_latent, d_skips, g_skips = paired_encoders(
            stop(batch["depth"]) / cfg.model.max_depth,
            batch["rgb"] * 2.0 - 1.0,
            d_params["encoder"], params["encoder"], cfg.model,
        )
    else:
        d_latent, d_skips = enc.apply(
            {"params": d_params["encoder"]},
            stop(batch["depth"]) / cfg.model.max_depth,
        )
        g_latent, g_skips = enc.apply(
            {"params": params["encoder"]}, batch["rgb"] * 2.0 - 1.0
        )
    d_latent = stop(d_latent)
    d_skips = [stop(s) for s in d_skips]

    if cfg.train.fused_guidance_vjp:
        # custom-VJP pair: 2B-wide forward, g-half-only recompute
        # backward — removes the 2B-wide decoder backward that made
        # fused_guidance lose at B=128 (train/guided_decoder.py).
        from gdn_tpu.train.guided_decoder import shared_guided_decoder

        depth, dec_feats, depth_scales = shared_guided_decoder(
            cfg.model, params["decoder"], d_latent, g_latent, d_skips, g_skips
        )
    else:
        latent = jnp.concatenate([d_latent, g_latent])
        skips = [jnp.concatenate([d, g]) for d, g in zip(d_skips, g_skips)]
        depth, dec_feats, depth_scales = dec.apply(
            {"params": params["decoder"]}, latent, skips
        )
    g_depth = depth[b:]
    g_feats = [f[b:] for f in dec_feats]
    d_feats = [stop(f[:b]) for f in dec_feats]
    terms = total_loss(
        g_depth, batch["depth"], batch["mask"],
        cfg.loss, cfg.model.max_depth,
        pred_latents=[g_latent, *g_feats],
        target_latents=[d_latent, *d_feats],
        scale_preds=[p[b:] for p in depth_scales[:-1]],
    )
    return terms["total"], terms


def make_stage1_step(
    cfg: Config, mesh: Optional[Mesh] = None, state_sharding=None,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted stage-1 (D-net) train step.

    With a mesh: donated replicated state, batch sharded on "data"
    (and H on "spatial" for 2-D meshes).  ``state_sharding`` (a
    NamedSharding pytree matching the TrainState, from
    ``parallel.mesh.shard_state``) overrides the replicated default —
    the TP (channel-sharded) and FSDP placements ride through here."""
    from gdn_tpu.models import DtoDNet

    _refuse_quant(cfg)
    orig, cfg = cfg, _spatial_safe_cfg(cfg, mesh)
    override = _model_apply_override(orig, cfg, DtoDNet)

    def step(state: TrainState, batch: Batch):
        grad_fn = jax.value_and_grad(_stage1_loss, has_aux=True)
        (_, terms), grads = grad_fn(
            state.params, override or state.apply_fn, batch, cfg
        )
        new_state = _apply_update(state, grads, cfg)
        return new_state, terms

    return _jit_step(step, mesh, donate_state=True,
                     state_sharding=state_sharding)


def make_stage2_step(
    cfg: Config, mesh: Optional[Mesh] = None,
    state_sharding=None, d_sharding=None,
) -> Callable[
    [TrainState, Any, Batch], Tuple[TrainState, Dict[str, jnp.ndarray]]
]:
    """Build the jitted stage-2 (G-net) train step.

    Signature: step(state, d_params, batch).  ``d_params`` is the frozen
    stage-1 D-net parameter tree (guidance targets); the G-net decoder
    inside ``state`` is additionally frozen via the optimizer mask when
    cfg.train.freeze_decoder.  ``state_sharding``/``d_sharding`` pin
    TP/FSDP placements (see make_stage1_step).
    """
    from gdn_tpu.models import DtoDNet, RtoDNet

    _refuse_quant(cfg)
    orig, cfg = cfg, _spatial_safe_cfg(cfg, mesh)
    override = _model_apply_override(orig, cfg, RtoDNet)
    d_apply = DtoDNet(cfg=cfg.model).apply
    if cfg.train.fused_encoders:
        assert cfg.train.fused_guidance, (
            "fused_encoders requires fused_guidance (it feeds the shared "
            "decoder pass)"
        )
    if cfg.train.fused_guidance:
        assert cfg.train.freeze_decoder, (
            "fused_guidance requires freeze_decoder: the shared-decoder "
            "pass is only valid while both nets' decoder params stay equal"
        )

        def step(state: TrainState, d_params, batch: Batch):
            grad_fn = jax.value_and_grad(_stage2_loss_fused, has_aux=True)
            (_, terms), grads = grad_fn(state.params, d_params, batch, cfg)
            new_state = _apply_update(state, grads, cfg)
            return new_state, terms
    else:
        def step(state: TrainState, d_params, batch: Batch):
            grad_fn = jax.value_and_grad(_stage2_loss, has_aux=True)
            (_, terms), grads = grad_fn(
                state.params, d_params, override or state.apply_fn,
                d_apply, batch, cfg
            )
            new_state = _apply_update(state, grads, cfg)
            return new_state, terms

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    # `rep`/`data` act as pytree prefixes over the state/batch subtrees;
    # a state_sharding/d_sharding tree (TP/FSDP) replaces the prefix.
    return jax.jit(
        step,
        in_shardings=(
            state_sharding if state_sharding is not None else rep,
            d_sharding if d_sharding is not None else rep,
            data,
        ),
        out_shardings=(
            state_sharding if state_sharding is not None else rep, rep
        ),
        donate_argnums=(0,),
    )


def make_stage1_multistep(
    cfg: Config, steps_per_call: int, mesh: Optional[Mesh] = None,
    state_sharding=None,
):
    """Stage-1 step scanning `steps_per_call` optimizer updates inside
    ONE jitted call (see make_stage2_multistep for the rationale).

    Signature: step(state, batches) with batches stacked {k: (S,B,...)}.
    """
    from gdn_tpu.models import DtoDNet

    _refuse_quant(cfg)
    orig, cfg = cfg, _spatial_safe_cfg(cfg, mesh)
    override = _model_apply_override(orig, cfg, DtoDNet)

    def step(state: TrainState, batches: Batch):
        s = jax.tree.leaves(batches)[0].shape[0]
        assert s == steps_per_call, (
            f"stacked batch has {s} steps, expected steps_per_call="
            f"{steps_per_call}"
        )

        def body(carry, batch):
            state = carry
            grad_fn = jax.value_and_grad(_stage1_loss, has_aux=True)
            (_, terms), grads = grad_fn(
                state.params, override or state.apply_fn, batch, cfg
            )
            return _apply_update(state, grads, cfg), terms

        state, terms = jax.lax.scan(body, state, batches)
        last = jax.tree.map(lambda t: t[-1], terms)
        return state, last

    return _jit_multistep(step, mesh, n_extra=0,
                          state_sharding=state_sharding)


def make_stage2_multistep(
    cfg: Config, steps_per_call: int, mesh: Optional[Mesh] = None,
    state_sharding=None, d_sharding=None,
):
    """Stage-2 step scanning `steps_per_call` optimizer updates inside
    ONE jitted call.

    Batches arrive stacked on a leading axis: {k: (S, B, H, W, C)}.
    One host dispatch then drives S full updates — on remote-attached
    TPUs (and generally) this amortizes per-call dispatch latency, and
    XLA can overlap the scan iterations' transfers.  Loss terms are
    returned for the LAST step (matching what a per-step loop logs).
    """
    from gdn_tpu.models import DtoDNet, RtoDNet

    _refuse_quant(cfg)
    orig, cfg = cfg, _spatial_safe_cfg(cfg, mesh)
    override = _model_apply_override(orig, cfg, RtoDNet)
    d_apply = DtoDNet(cfg=cfg.model).apply
    if cfg.train.fused_encoders:
        assert cfg.train.fused_guidance, "fused_encoders requires fused_guidance"
    if cfg.train.fused_guidance:
        assert cfg.train.freeze_decoder, "fused_guidance requires freeze_decoder"

    def step(state: TrainState, d_params, batches: Batch):
        s = jax.tree.leaves(batches)[0].shape[0]
        assert s == steps_per_call, (
            f"stacked batch has {s} steps, expected steps_per_call="
            f"{steps_per_call}"
        )

        def body(carry, batch):
            state = carry
            if cfg.train.fused_guidance:
                grad_fn = jax.value_and_grad(_stage2_loss_fused, has_aux=True)
                (_, terms), grads = grad_fn(state.params, d_params, batch, cfg)
                return _apply_update(state, grads, cfg), terms
            grad_fn = jax.value_and_grad(_stage2_loss, has_aux=True)
            (_, terms), grads = grad_fn(
                state.params, d_params, override or state.apply_fn,
                d_apply, batch, cfg
            )
            return _apply_update(state, grads, cfg), terms

        state, terms = jax.lax.scan(body, state, batches)
        last = jax.tree.map(lambda t: t[-1], terms)
        return state, last

    return _jit_multistep(step, mesh, n_extra=1,
                          state_sharding=state_sharding,
                          extra_shardings=(d_sharding,))


def _jit_multistep(step, mesh: Optional[Mesh], n_extra: int,
                   state_sharding=None, extra_shardings=()):
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    rep = replicated(mesh)
    ss = state_sharding if state_sharding is not None else rep
    extras = [
        (e if e is not None else rep)
        for e in (extra_shardings or [None] * n_extra)
    ]
    assert len(extras) == n_extra
    # batches: leading scan axis replicated, batch axis sharded (and H
    # on "spatial" for 2-D meshes)
    data = stacked_batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(ss, *extras, data),
        out_shardings=(ss, rep),
        donate_argnums=(0,),
    )


def make_eval_forward(
    cfg: Config, model=None, flip_tta: bool = False, quant_scales=None,
) -> Callable[[Any, jnp.ndarray], jnp.ndarray]:
    """Jitted eval forward: rgb (B,H,W,3) -> depth (B,H,W,1) fp32.

    Runs the G-net at train resolution; the eval harness resizes to GT
    resolution afterwards (SURVEY.md §3.3).

    ``flip_tta``: horizontal-flip test-time augmentation — the standard
    monodepth post-processing (predict on the image and its mirror,
    un-mirror, average).  ONE jitted program: the (B) and flipped (B)
    batches run as a single (2B) forward so the device sees one
    dispatch, and XLA's batched convs amortize the second pass.
    """
    from gdn_tpu.models import RtoDNet

    model = model or RtoDNet(cfg=cfg.model)
    if cfg.model.quant != "none" and quant_scales is None:
        raise ValueError(
            "model.quant='int8' needs calibrated activation scales: "
            "pass quant_scales=ops.quant.calibrate_quant(model, params, "
            "batches)"
        )
    extra = {"quant": quant_scales} if quant_scales is not None else {}

    @jax.jit
    def forward(params, rgb):
        if not flip_tta:
            return model.apply({"params": params, **extra}, rgb)["depth"]
        both = jnp.concatenate([rgb, rgb[:, :, ::-1, :]], axis=0)
        depth = model.apply({"params": params, **extra}, both)["depth"]
        b = rgb.shape[0]
        return 0.5 * (depth[:b] + depth[b:, :, ::-1, :])

    return forward


def _jit_step(step, mesh: Optional[Mesh], donate_state: bool,
              state_sharding=None):
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate_state else ())
    rep = replicated(mesh)
    ss = state_sharding if state_sharding is not None else rep
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(ss, data),
        out_shardings=(ss, rep),
        donate_argnums=(0,) if donate_state else (),
    )
