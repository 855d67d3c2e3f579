"""Checkpointing and the stage-1 -> stage-2 weight-transfer API.

The reference checkpoints with per-epoch ``torch.save(state_dict)`` and
stage 2 consumes the stage-1 file (SURVEY.md §2.9).  Here checkpoints
go through orbax (async-capable, multi-host-safe): params + opt_state +
step round-trip, and ``transfer_stage1_decoder`` implements the
explicit decoder hand-off (SURVEY.md §5 checkpoint/resume row).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True, enable_async_checkpointing=False
        ),
    )


def save_checkpoint(ckpt_dir: str, step: int, state: Any, keep: int = 3) -> None:
    """Save {params, opt_state, step} at `step`."""
    mgr = _manager(ckpt_dir, keep)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        # normalize: step may be a python int (fresh state) or an array
        "step": jnp.asarray(state.step, jnp.int32),
    }
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(
    ckpt_dir: str, state: Any, step: Optional[int] = None
) -> Any:
    """Restore into an abstract/concrete `state` template; returns the
    updated TrainState (resume covers params+opt_state+step)."""
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": jnp.asarray(state.step, jnp.int32),
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )


def load_params(ckpt_dir: str, params_template: Any, step: Optional[int] = None):
    """Load only the params tree (eval/demo path)."""
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    restored = mgr.restore(
        step,
        args=ocp.args.PyTreeRestore(
            {"params": params_template}, partial_restore=True
        ),
    )
    mgr.close()
    return restored["params"]


def transfer_stage1_decoder(
    g_params: Dict[str, Any], d_params: Dict[str, Any]
) -> Dict[str, Any]:
    """Copy the trained D-net decoder subtree into fresh G-net params.

    Shapes are identical by construction (models/decoder.py); verified
    here so a config mismatch fails loudly instead of silently training
    a random decoder.
    """
    d_dec = d_params["decoder"]
    g_dec = g_params["decoder"]
    d_shapes = jax.tree.map(lambda a: a.shape, d_dec)
    g_shapes = jax.tree.map(lambda a: a.shape, g_dec)
    if d_shapes != g_shapes:
        raise ValueError(
            "stage-1 decoder is not shape-compatible with the stage-2 "
            f"decoder: {d_shapes} vs {g_shapes}"
        )
    # Deep copy: the G-net state is donated by the train step while the
    # same D-net tree is passed alongside as guidance params — aliased
    # buffers would trip XLA's donation check (`f(donate(a), a)`).
    return {**g_params, "decoder": jax.tree.map(jnp.copy, d_dec)}
