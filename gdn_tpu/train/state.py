"""Train state and optimizer construction.

Mirrors the reference trainers' optimization surface (SURVEY.md §2.6):
Adam with a step-decay LR schedule, per-stage parameter selection —
stage 2 freezes the transferred decoder, which in this functional
framework is an ``optax.multi_transform`` that routes decoder leaves to
``set_to_zero`` (the SURVEY.md §7 'optax masked updates' hard part).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from gdn_tpu.config import TrainConfig


class TrainState(train_state.TrainState):
    """Flax TrainState + optional EMA (Polyak) parameter average.

    ``ema_params`` is None when TrainConfig.ema_decay is unset — the
    state pytree is then identical to round-2 checkpoints (backward
    compatible); when set, the steps update it after every
    apply_gradients and the checkpoint payload carries it.
    """

    ema_params: Any = None


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int) -> optax.Schedule:
    """cfg.schedule: "step" = lr * gamma^(epoch // decay_epochs) (the
    reference's decay), "cosine" = cosine to 0 over epochs *
    steps_per_epoch, or "constant"; optionally preceded by a linear
    0 -> lr warmup (cfg.warmup_steps).

    decay_epochs/warmup_steps are documented in TRAIN-LOOP steps
    (micro-steps).  Under grad_accum>1 the schedule counter only
    advances on APPLIED updates (optax.MultiSteps calls the inner
    transform once per k micro-steps), so the transition points are
    converted to update units here — otherwise the decay would fire
    grad_accum x too late in wall-clock epochs."""
    accum = max(1, cfg.grad_accum)
    warmup_updates = max(1, cfg.warmup_steps // accum) if cfg.warmup_steps else 0
    if cfg.schedule == "step":
        decay = optax.exponential_decay(
            init_value=cfg.lr,
            transition_steps=max(1, cfg.decay_epochs * steps_per_epoch // accum),
            decay_rate=cfg.decay_gamma,
            staircase=True,
        )
    elif cfg.schedule == "cosine":
        total_updates = max(1, cfg.epochs * steps_per_epoch // accum)
        decay = optax.cosine_decay_schedule(
            init_value=cfg.lr,
            decay_steps=max(1, total_updates - warmup_updates),
        )
    elif cfg.schedule == "constant":
        decay = optax.constant_schedule(cfg.lr)
    else:
        raise ValueError(
            f"unknown schedule {cfg.schedule!r} (step|cosine|constant)"
        )
    if warmup_updates:
        warmup = optax.linear_schedule(
            init_value=0.0,
            end_value=cfg.lr,
            transition_steps=warmup_updates,
        )
        return optax.join_schedules([warmup, decay], [warmup_updates])
    return decay


def create_optimizer(
    cfg: TrainConfig,
    steps_per_epoch: int,
    freeze_decoder: bool = False,
) -> optax.GradientTransformation:
    schedule = lr_schedule(cfg, steps_per_epoch)
    parts = []
    if cfg.grad_clip:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.weight_decay:
        parts.append(
            optax.adamw(
                schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
                weight_decay=cfg.weight_decay,
            )
        )
    else:
        parts.append(optax.adam(schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps))
    tx = optax.chain(*parts)
    if cfg.flatten_optimizer:
        # One fused vector op instead of ~10 tiny fusions per leaf
        # (latency-bound on TPU; see BASELINE.md step-floor profile).
        tx = optax.flatten(tx)
    if freeze_decoder:
        def label_fn(params):
            return {
                k: ("frozen" if k == "decoder" else "trainable")
                for k in params
            }

        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, label_fn
        )
    if cfg.grad_accum and cfg.grad_accum > 1:
        # Outermost: clip/Adam/freeze all see the k-averaged gradient,
        # applied once every k micro-steps (identity in between).
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def create_state(
    model: nn.Module,
    input_shape: tuple,
    cfg: TrainConfig,
    steps_per_epoch: int,
    freeze_decoder: bool = False,
    params: Optional[Any] = None,
    rng: Optional[jax.Array] = None,
) -> TrainState:
    """Initialize params (unless given, e.g. transferred from stage 1)
    and build the train state."""
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        # jit the init: tracing the full-res model op-by-op on device is
        # slow (observed ~2 min unjitted on TPU at 128x416).
        variables = jax.jit(model.init)(
            rng, jnp.zeros(input_shape, jnp.float32)
        )
        params = variables["params"]
    tx = create_optimizer(cfg, steps_per_epoch, freeze_decoder)
    # EMA starts equal to the initial params (standard Polyak init).
    # Real copies, not views: the train step donates the state, and
    # aliased params/ema buffers would be donated twice.
    ema = (
        jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        if cfg.ema_decay else None
    )
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, ema_params=ema
    )
