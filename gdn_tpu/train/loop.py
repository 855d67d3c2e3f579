"""Epoch-based training loops for both stages (SURVEY.md §2.6).

``train_stage1`` pretrains the D-net on GT depth; ``train_stage2``
transfers the stage-1 decoder into a fresh G-net, freezes it (optax
mask), and trains the RGB encoder + fusion path with the full loss
incl. the guidance term.  Per-step scalars (loss terms, imgs/sec/chip)
go through utils.logging; checkpoints per epoch through orbax.
"""

from __future__ import annotations

import signal
import time
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np

from gdn_tpu import checkpoint as ckpt
from gdn_tpu.config import Config
from gdn_tpu.models import DtoDNet, RtoDNet
from gdn_tpu.parallel.mesh import (
    create_mesh, param_mode, shard_batch, shard_stacked_batch, shard_state,
)
from gdn_tpu.train.state import create_state
from gdn_tpu.train.steps import (
    make_stage1_multistep,
    make_stage1_step,
    make_stage2_multistep,
    make_stage2_step,
)
from gdn_tpu.utils.logging import MetricLogger


class PreemptionHandler:
    """Preemption-safe training (SURVEY §5 failure-detection row):
    SIGTERM/SIGINT set a flag; the epoch loop finishes the in-flight
    step, the trainer checkpoints, and the process exits cleanly.
    Combined with the deterministic data-order resume ((seed, step) →
    batch stream), a preempted run restarted with --resume continues
    exactly where it stopped — the TPU-pod preemption story.

    Installed once per training run (``install``); the previous
    handlers are restored by ``uninstall`` so library users (and
    pytest) are unaffected outside the loop.
    """

    def __init__(self):
        self.requested = False
        self._prev = {}

    def _on_signal(self, signum, frame):
        self.requested = True
        print(f"[train] received signal {signum}: will checkpoint and "
              "stop after the current step", flush=True)

    def install(self) -> "PreemptionHandler":
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._on_signal)
            except ValueError:  # non-main thread: no signal handling
                pass
        return self

    def uninstall(self) -> None:
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev = {}


def _epoch_loop(
    step_fn,
    state,
    data_iter,
    steps: int,
    logger: MetricLogger,
    batch_size: int,
    log_every: int,
    mesh=None,
    extra_args=(),
    steps_per_call: int = 1,
    preemption: Optional[PreemptionHandler] = None,
):
    """Drive `steps` optimizer updates.  With steps_per_call=K>1,
    `step_fn` must be a multistep (scan) step taking batches stacked on
    a leading axis; K host batches are pulled and stacked per call."""
    import jax.numpy as jnp

    if steps % steps_per_call != 0:
        raise ValueError(
            f"steps_per_epoch={steps} not divisible by "
            f"steps_per_call={steps_per_call}"
        )
    n_calls = steps // steps_per_call
    log_calls = max(1, log_every // steps_per_call)
    t_start = time.perf_counter()
    timed_from = 0
    for i in range(n_calls):
        if steps_per_call == 1:
            batch = next(data_iter)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
        else:
            group = [next(data_iter) for _ in range(steps_per_call)]
            batch = jax.tree.map(lambda *xs: jnp.stack(xs), *group)
            if mesh is not None:
                # Explicit (S, B_sharded, ...) placement: leaving it to
                # jit's in_shardings would funnel one unsharded copy
                # through device 0 on real multi-chip meshes.
                batch = shard_stacked_batch(batch, mesh)
        state, terms = step_fn(state, *extra_args, batch)
        if i == 0:
            # restart the clock after the first step so jit compile time
            # doesn't pollute the reported imgs/sec
            jax.tree.map(float, jax.device_get(terms))
            t_start = time.perf_counter()
            timed_from = 1
        if (i + 1) % log_calls == 0 or i == n_calls - 1:
            terms = jax.tree.map(float, jax.device_get(terms))
            elapsed = max(time.perf_counter() - t_start, 1e-9)
            timed_calls = i + 1 - timed_from
            log_kw = dict(step=int(state.step), **terms)
            if timed_calls > 0:
                # the first (compile) call is excluded from the clock;
                # until a timed call lands there is no rate to report
                log_kw["imgs_per_sec"] = (
                    batch_size * steps_per_call * timed_calls / elapsed
                )
            logger.log(**log_kw)
        if preemption is not None and preemption.requested:
            break
    return state


import functools


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _val_terms(apply_fn, params, batch, loss_cfg, max_depth, input_key):
    from gdn_tpu.losses import total_loss

    out = apply_fn({"params": params}, batch[input_key])
    return total_loss(
        out["depth"], batch["depth"], batch["mask"], loss_cfg, max_depth,
        scale_preds=out["depth_scales"][:-1],
    )


def _validate(cfg, state, val_iter, steps, logger, d_params=None):
    """Periodic validation (SURVEY.md §2.6): average loss terms over
    `steps` held-out batches, no gradient.  Jitted; cache key is the
    model's apply_fn, so repeated epochs reuse the compiled program."""
    input_key = "depth" if d_params is None else "rgb"
    sums, n = {}, 0
    for _ in range(steps):
        try:
            batch = next(val_iter)
        except StopIteration:
            # finite val iterable shorter than `steps`: average over
            # what exists instead of killing the training run mid-epoch
            break
        terms = _val_terms(
            state.apply_fn, state.params, batch,
            cfg.loss, cfg.model.max_depth, input_key,
        )
        terms = jax.tree.map(float, jax.device_get(terms))
        for k, v in terms.items():
            sums[k] = sums.get(k, 0.0) + v
        n += 1
    avg = {f"val_{k}": v / max(n, 1) for k, v in sums.items()}
    logger.log(step=int(state.step), **avg)
    return avg


def _place_state(state, mesh, cfg: Config):
    """TP/FSDP placement (MeshConfig.model_devices / .fsdp): shard the
    state (or any param tree) onto the mesh and return the sharding
    tree for the step builders.  Replicated mode (the default) returns
    (state, None) — the builders' replicated prefix handles placement
    as before."""
    mode = param_mode(cfg.mesh)
    if mesh is None or mode == "replicated":
        return state, None
    return shard_state(state, mesh, mode)


def train_stage1(
    cfg: Config,
    data_iter: Iterable[Dict[str, Any]],
    use_mesh: bool = True,
    epochs: Optional[int] = None,
    state=None,
    logger: Optional[MetricLogger] = None,
    val_iter: Optional[Iterable[Dict[str, Any]]] = None,
    val_steps: int = 10,
    mesh=None,
    loader_state_fn=None,
):
    """D-net pretraining.  Returns the final TrainState.

    Pass ``mesh`` when the input pipeline already shards batches onto it
    (scripts/train.py does) — the in-loop shard_batch is then a no-op
    placement check, not a second transfer.

    ``loader_state_fn(step) -> Optional[dict]``: capture the host
    loader's cursor as of `step` consumed batches; rides each epoch
    checkpoint so multiprocess loaders resume exactly
    (checkpoint.load_loader_state).
    """
    h, w = cfg.model.image_size
    if mesh is None:
        mesh = create_mesh(
            cfg.mesh.num_devices, spatial=cfg.mesh.spatial_devices,
            model=cfg.mesh.model_devices,
        ) if use_mesh else None
    model = DtoDNet(cfg=cfg.model)
    if state is None:
        state = create_state(
            model, (1, h, w, 1), cfg.train, cfg.train.steps_per_epoch
        )
    state, state_sharding = _place_state(state, mesh, cfg)
    k = cfg.train.steps_per_call
    step_fn = (
        make_stage1_multistep(cfg, k, mesh, state_sharding=state_sharding)
        if k > 1
        else make_stage1_step(cfg, mesh, state_sharding=state_sharding)
    )
    if cfg.train.check_numerics:
        from gdn_tpu.utils.guards import GuardedStep

        step_fn = GuardedStep(step_fn)
    logger = logger or MetricLogger(prefix="stage1")
    data_iter = iter(data_iter)
    preempt = PreemptionHandler().install()
    try:
        for epoch in range(
            epochs if epochs is not None else cfg.train.epochs
        ):
            state = _epoch_loop(
                step_fn, state, data_iter, cfg.train.steps_per_epoch,
                logger, cfg.data.batch_size, cfg.train.log_every, mesh,
                steps_per_call=cfg.train.steps_per_call,
                preemption=preempt,
            )
            if val_iter is not None and not preempt.requested:
                _validate(cfg, state, iter(val_iter), val_steps, logger)
            if cfg.train.ckpt_dir:
                ckpt.save_checkpoint(
                    f"{cfg.train.ckpt_dir}/stage1", int(state.step), state,
                    cfg.train.keep_ckpts,
                    use_async=cfg.train.async_ckpt, cfg=cfg,
                    loader_state=(
                        loader_state_fn(int(state.step))
                        if loader_state_fn else None
                    ),
                )
            if preempt.requested:
                print(
                    f"[train] preempted: checkpoint saved at step "
                    f"{int(state.step)}; resume with --resume",
                    flush=True,
                )
                break
    finally:
        preempt.uninstall()
        if cfg.train.ckpt_dir:
            # durability barrier: async saves must land before the
            # process can exit (incl. the preemption path — the ckpt
            # the SIGTERM handler promised must be on disk).
            ckpt.wait_for_checkpoints(cfg.train.ckpt_dir)
    return state


def train_stage2(
    cfg: Config,
    data_iter: Iterable[Dict[str, Any]],
    d_params: Any,
    use_mesh: bool = True,
    epochs: Optional[int] = None,
    state=None,
    logger: Optional[MetricLogger] = None,
    val_iter: Optional[Iterable[Dict[str, Any]]] = None,
    val_steps: int = 10,
    mesh=None,
    eval_dataset=None,
    eval_every: int = 1,
    eval_max_images: Optional[int] = None,
    loader_state_fn=None,
):
    """Guided G-net training: transfer + freeze the stage-1 decoder,
    train with guidance targets from the frozen D-net.

    ``eval_dataset``: optional zero-arg callable returning an eval-split
    iterable ({'rgb' (1,H,W,3), 'gt' (1,Hg,Wg)}); every ``eval_every``
    epochs the FULL eval protocol (evaluate.py: upsample→crop/cap→
    7-metric table) runs on it and the metrics are logged as
    ``eval_*`` — the reference's train-then-eval-script loop as one
    command."""
    h, w = cfg.model.image_size
    if mesh is None:
        mesh = create_mesh(
            cfg.mesh.num_devices, spatial=cfg.mesh.spatial_devices,
            model=cfg.mesh.model_devices,
        ) if use_mesh else None
    model = RtoDNet(cfg=cfg.model)
    if state is None:
        state = create_state(
            model, (1, h, w, 3), cfg.train, cfg.train.steps_per_epoch,
            freeze_decoder=cfg.train.freeze_decoder,
        )
        transferred = ckpt.transfer_stage1_decoder(state.params, d_params)
        state = state.replace(params=transferred)
    state, state_sharding = _place_state(state, mesh, cfg)
    d_params, d_sharding = _place_state(d_params, mesh, cfg)
    k = cfg.train.steps_per_call
    step_fn = (
        make_stage2_multistep(
            cfg, k, mesh,
            state_sharding=state_sharding, d_sharding=d_sharding,
        )
        if k > 1
        else make_stage2_step(
            cfg, mesh,
            state_sharding=state_sharding, d_sharding=d_sharding,
        )
    )
    if cfg.train.check_numerics:
        from gdn_tpu.utils.guards import GuardedStep

        step_fn = GuardedStep(step_fn)
    logger = logger or MetricLogger(prefix="stage2")
    data_iter = iter(data_iter)
    best_rmse = float("inf")
    evaluator = None  # persistent across eval epochs (compile + cache reuse)
    eval_host_fed = False  # set when the split exceeds the HBM cache gate
    preempt = PreemptionHandler().install()
    try:
        for epoch in range(
            epochs if epochs is not None else cfg.train.epochs
        ):
            state = _epoch_loop(
                step_fn, state, data_iter, cfg.train.steps_per_epoch,
                logger, cfg.data.batch_size, cfg.train.log_every, mesh,
                extra_args=(d_params,),
                steps_per_call=cfg.train.steps_per_call,
                preemption=preempt,
            )
            if val_iter is not None and not preempt.requested:
                _validate(cfg, state, iter(val_iter), val_steps, logger,
                          d_params=d_params)
            if (
                eval_dataset is not None
                and (epoch + 1) % max(eval_every, 1) == 0
                and not preempt.requested
            ):
                from gdn_tpu.evaluate import Evaluator
                from gdn_tpu.train.steps import make_eval_forward

                if evaluator is None:
                    # ONE Evaluator for the whole run: the compiled
                    # forward + per-resolution eval steps are reused
                    # every eval epoch (rebuilding them per epoch paid
                    # a full retrace+compile each time), and the split
                    # goes device-resident when it fits the 2 GiB gate
                    # (per-pass H2D drops to zero).
                    evaluator = Evaluator(cfg, make_eval_forward(cfg, model))
                    try:
                        evaluator.cache_dataset(
                            eval_dataset(), max_images=eval_max_images
                        )
                    except ValueError as e:
                        eval_host_fed = True
                        print(f"in-training eval stays host-fed: {e}")
                out = evaluator.run(
                    state.params,
                    eval_dataset() if eval_host_fed else None,
                    max_images=eval_max_images,
                    verbose=False,
                )
                logger.log(
                    step=int(state.step),
                    **{f"eval_{k}": v for k, v in out.items()},
                )
                # best-model tracking (the reference family's
                # "save best" habit): a separate stage2_best dir
                # keyed on eval RMSE so long runs keep their best
                # weights even after later epochs regress.
                if cfg.train.ckpt_dir and out.get("rmse", float("inf")) < best_rmse:
                    best_rmse = out["rmse"]
                    ckpt.save_checkpoint(
                        f"{cfg.train.ckpt_dir}/stage2_best",
                        int(state.step), state, keep=1,
                        use_async=cfg.train.async_ckpt, cfg=cfg,
                    )
                    logger.log(step=int(state.step),
                               best_rmse=float(best_rmse))
            if cfg.train.ckpt_dir:
                ckpt.save_checkpoint(
                    f"{cfg.train.ckpt_dir}/stage2", int(state.step), state,
                    cfg.train.keep_ckpts,
                    use_async=cfg.train.async_ckpt, cfg=cfg,
                    loader_state=(
                        loader_state_fn(int(state.step))
                        if loader_state_fn else None
                    ),
                )
            if preempt.requested:
                print(
                    f"[train] preempted: checkpoint saved at step "
                    f"{int(state.step)}; resume with --resume",
                    flush=True,
                )
                break
    finally:
        preempt.uninstall()
        if cfg.train.ckpt_dir:
            # durability barrier for async saves (see train_stage1).
            ckpt.wait_for_checkpoints(cfg.train.ckpt_dir)
    return state
