"""Checkpointing and the stage-1 -> stage-2 weight-transfer API.

The reference checkpoints with per-epoch ``torch.save(state_dict)`` and
stage 2 consumes the stage-1 file (SURVEY.md §2.9).  Here checkpoints
go through orbax (async-capable, multi-host-safe): params + opt_state +
step round-trip, and ``transfer_stage1_decoder`` implements the
explicit decoder hand-off (SURVEY.md §5 checkpoint/resume row).

COMPATIBILITY: the ConvBlock GroupNorm parameters moved from flax's
auto-named ``GroupNorm_0: {scale, bias}`` subtree to explicit
``gn_scale``/``gn_bias`` leaves in round 2 (GN consolidation).
Checkpoints written before that change do not restore against the new
tree; no such checkpoints ship with the repo, but if one exists, remap
``.../GroupNorm_0/{scale,bias}`` -> ``.../{gn_scale,gn_bias}``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


_MANAGERS: dict = {}


def _manager(
    ckpt_dir: str, keep: int = 3, use_async: bool = False, kind: str = "std"
) -> ocp.CheckpointManager:
    """Cached per-directory manager (a fresh manager per save would
    re-scan the directory and, for async saves, lose the in-flight
    commit).  `kind` separates managers by handler type: a manager
    binds its item handler on first use, so Standard and PyTree
    restores need distinct instances.  ``keep`` is part of the cache
    key: a restore (default keep) followed by saves with a different
    retention setting must NOT reuse the restore's manager — orbax
    would silently delete down to the stale max_to_keep."""
    key = (os.path.abspath(ckpt_dir), keep, use_async, kind)
    if key not in _MANAGERS:
        _MANAGERS[key] = ocp.CheckpointManager(
            os.path.abspath(ckpt_dir),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True,
                enable_async_checkpointing=use_async,
            ),
        )
    return _MANAGERS[key]


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    state: Any,
    keep: int = 3,
    use_async: bool = False,
    cfg: Any = None,
    loader_state: Optional[Dict[str, Any]] = None,
) -> None:
    """Save {params, opt_state, step} at `step`.

    use_async=True overlaps the write with subsequent training (orbax
    async checkpointing — the SURVEY.md §5 checkpoint/resume row);
    call :func:`wait_for_checkpoints` before reading the files back or
    exiting the process.

    ``cfg``: the run's Config — persisted as ``<ckpt_dir>/config.json``
    so checkpoints are self-describing: eval/demo/serve/export rebuild
    the exact architecture (upsample style, channel widths, norm, ...)
    from the checkpoint instead of requiring the user to remember the
    training flags (a silent shape error otherwise — e.g. a pre-round-3
    resize_conv checkpoint after the deconv default flip).

    ``loader_state``: JSON-able input-stream cursor (e.g. the grain
    loader's ``state_dict_at(step)``) — rides the orbax payload as a
    named Json item, committed atomically with the weights, so a
    multiprocess loader resumes its exact position
    (:func:`load_loader_state`).
    """
    if cfg is not None:
        save_config(ckpt_dir, cfg)
    mgr = _manager(ckpt_dir, keep, use_async)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        # normalize: step may be a python int (fresh state) or an array
        "step": jnp.asarray(state.step, jnp.int32),
    }
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = state.ema_params
    items = {"state": ocp.args.StandardSave(payload)}
    if loader_state is not None:
        items["loader"] = ocp.args.JsonSave(loader_state)
    mgr.save(step, args=ocp.args.Composite(**items))
    if not use_async:
        mgr.wait_until_finished()


def wait_for_checkpoints(ckpt_dir: str) -> None:
    """Block until async saves under `ckpt_dir` are durable.

    Prefix-matched: one call on a run's root checkpoint dir flushes
    every stage subtree it saved into (stage1/, stage2/, stage2_best/)
    — the wait-on-exit barrier the training loops use."""
    target = os.path.abspath(ckpt_dir)
    for (path, _, _, _), mgr in list(_MANAGERS.items()):
        if path == target or path.startswith(target + os.sep):
            mgr.wait_until_finished()


def save_config(ckpt_dir: str, cfg: Any) -> None:
    """Write the run Config as ``<ckpt_dir>/config.json`` (one per
    directory — every step in a dir comes from the same architecture).
    Written atomically (tmp + rename) so a preemption mid-write can't
    leave a truncated file next to valid checkpoints."""
    import dataclasses
    import json
    import tempfile

    path = os.path.join(os.path.abspath(ckpt_dir), "config.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = dataclasses.asdict(cfg)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def load_config(ckpt_dir: str):
    """Load the Config saved next to a checkpoint; None if the dir
    predates self-describing checkpoints (pre-round-4)."""
    import json

    path = os.path.join(os.path.abspath(ckpt_dir), "config.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        payload = json.load(f)
    return config_from_dict(payload)


def config_from_dict(payload: Dict[str, Any]):
    """Rebuild a Config tree from ``dataclasses.asdict`` output.

    JSON round-trips tuples as lists; Tuple-typed fields (image_size,
    enc/dec_channels, scale_range) are re-tupled.  Unknown keys (from a
    NEWER framework version) are dropped with a warning rather than
    crashing — old code evaluating a new checkpoint should degrade
    loudly, not die on an unrelated knob."""
    import dataclasses

    from gdn_tpu import config as config_mod

    def build(dc_type, d):
        fields = {f.name: f for f in dataclasses.fields(dc_type)}
        kwargs = {}
        for k, v in d.items():
            if k not in fields:
                print(f"[checkpoint] config.json key {k!r} unknown to "
                      f"this version of {dc_type.__name__}; ignored",
                      flush=True)
                continue
            f = fields[k]
            if dataclasses.is_dataclass(f.type) or (
                isinstance(f.type, type) and dataclasses.is_dataclass(f.type)
            ):
                kwargs[k] = build(f.type, v)
            elif isinstance(v, dict):
                # nested dataclass referenced by name (from __future__
                # annotations the field type is a string)
                sub = getattr(config_mod, str(f.type).split(".")[-1], None)
                kwargs[k] = build(sub, v) if sub is not None else v
            elif isinstance(v, list):
                kwargs[k] = tuple(v)
            else:
                kwargs[k] = v
        return dc_type(**kwargs)

    return build(config_mod.Config, payload)


def _is_composite_layout(ckpt_dir: str, step: int) -> bool:
    """Round-4+ checkpoints save Composite(state=..., config=...) — a
    "state" item directory under the step dir.  Pre-round-4 layouts
    saved one unnamed StandardSave item (no item subdirs).  Probing the
    layout structurally (instead of catching ValueError from a failed
    composite restore) keeps REAL restore errors — e.g. the param-shape
    mismatch from a contradicting --upsample flag — from being masked
    by a second, misleading legacy-restore attempt."""
    return os.path.isdir(os.path.join(ckpt_dir, str(step), "state"))


def restore_checkpoint(
    ckpt_dir: str, state: Any, step: Optional[int] = None
) -> Any:
    """Restore into an abstract/concrete `state` template; returns the
    updated TrainState (resume covers params+opt_state+step)."""
    mgr = _manager(ckpt_dir)
    mgr.reload()  # pick up checkpoints written by other managers/processes
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": jnp.asarray(state.step, jnp.int32),
    }
    has_ema = getattr(state, "ema_params", None) is not None
    if has_ema:
        # EMA rides the payload iff the run tracks it (TrainConfig.
        # ema_decay); pre-EMA checkpoints restore with ema=None intact.
        template["ema_params"] = state.ema_params
    if _is_composite_layout(ckpt_dir, step):
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(template)),
        )["state"]
    else:
        # pre-round-4 layout: a single unnamed StandardSave item (no
        # Composite wrapper).  A fresh manager kind avoids mixing the
        # composite item-handler bindings with the legacy restore.
        legacy = _manager(ckpt_dir, kind="legacy")
        legacy.reload()
        restored = legacy.restore(
            step, args=ocp.args.StandardRestore(template)
        )
    state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    if has_ema:
        state = state.replace(ema_params=restored["ema_params"])
    return state


def load_params(
    ckpt_dir: str,
    params_template: Any,
    step: Optional[int] = None,
    key: str = "params",
):
    """Load only the params tree (eval/demo path).

    ``key="ema_params"`` selects the Polyak-averaged weights saved by
    EMA-tracking runs (TrainConfig.ema_decay; ``--use_ema`` on the
    eval/demo/export CLIs)."""
    mgr = _manager(ckpt_dir, kind="pytree")
    mgr.reload()
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    if _is_composite_layout(ckpt_dir, step):
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.PyTreeRestore(
                {key: params_template}, partial_restore=True
            )),
        )["state"]
    else:  # pre-round-4 single-item layout
        legacy = _manager(ckpt_dir, kind="pytree_legacy")
        legacy.reload()
        restored = legacy.restore(
            step,
            args=ocp.args.PyTreeRestore(
                {key: params_template}, partial_restore=True
            ),
        )
    return restored[key]


def load_loader_state(
    ckpt_dir: str, step: Optional[int] = None
) -> Optional[Dict[str, Any]]:
    """Read back the input-stream cursor saved alongside a checkpoint
    (``save_checkpoint(..., loader_state=...)``); None when the
    checkpoint has no loader item (pre-round-4, non-grain runs, or a
    capture that failed at save time) — callers fall back to seek()."""
    mgr = _manager(ckpt_dir, kind="json")
    mgr.reload()
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return None
    try:
        return mgr.restore(
            step, args=ocp.args.Composite(loader=ocp.args.JsonRestore())
        )["loader"]
    except (ValueError, KeyError, FileNotFoundError):
        return None


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


def params_from_torch(
    params_template: Dict[str, Any],
    state_dict: Dict[str, Any],
    key_map: Optional[Dict[str, str]] = None,
    strict: bool = True,
) -> Dict[str, Any]:
    """Import a torch ``state_dict`` into a flax parameter tree — the
    migration path for users bringing the reference's ``.pth`` weights
    (SURVEY.md §2.9: pretrained weights are how the reference ships its
    models) into this framework.

    Mapping rules:
      - flax leaf path "a/b/c" matches torch key "a.b.c" after applying
        ``key_map`` (exact-path overrides for renamed modules; the real
        reference layer names are unrecoverable here — SURVEY.md §0 —
        so the caller supplies the per-checkpoint map).
      - 4-D conv weights convert torch OIHW -> flax HWIO; 4-D
        conv_transpose weights (torch IOHW) are not auto-detected —
        map them explicitly through ``key_map`` and pre-permute.
      - 1-D/2-D tensors copy as-is (biases, norm scales, linear kernels
        transpose is the caller's responsibility via key_map).
      - With ``strict`` every template leaf must be matched; otherwise
        unmatched leaves keep their template values (partial import).

    Returns a new tree shaped exactly like ``params_template``.
    """
    import numpy as np

    def to_np(v):
        # torch tensor / numpy array / array-like, no torch import needed
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, dtype=np.float32)

    sd = {k: v for k, v in state_dict.items()}
    key_map = key_map or {}
    missing = []

    def walk(node, prefix):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in node.items()}
        tkey = key_map.get(prefix, prefix.replace("/", "."))
        if tkey not in sd:
            missing.append(prefix)
            return node
        arr = to_np(sd[tkey])
        want = tuple(node.shape)
        if arr.ndim == 4:
            # torch 4-D conv weights are ALWAYS OIHW; permute
            # unconditionally (a square conv with O==I==kh==kw would
            # otherwise silently import in the wrong layout).  Sources
            # already in HWIO must pre-permute via key_map handling.
            arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        if arr.shape != want:
            raise ValueError(
                f"shape mismatch importing {tkey!r} -> {prefix!r}: "
                f"{arr.shape} vs {want}"
            )
        return jnp.asarray(arr)

    out = walk(params_template, "")
    if strict and missing:
        raise KeyError(
            f"torch state_dict is missing {len(missing)} template leaves, "
            f"first: {missing[:5]} (pass strict=False for partial import "
            f"or extend key_map)"
        )
    return out


def params_to_torch(
    params: Dict[str, Any],
    key_map: Optional[Dict[str, str]] = None,
) -> Dict[str, Any]:
    """Export a flax parameter tree as a torch-style ``state_dict``
    (float32 numpy arrays keyed ``"a.b.c"``) — the exact inverse of
    :func:`params_from_torch`, closing the migration loop: models
    trained here can travel BACK to the reference's torch ecosystem
    (SURVEY.md §2.9 — the reference ships its models as ``.pth``
    files).  CLI: ``scripts/export_torch.py``.

    Mapping rules (mirror the import):
      - flax leaf path "a/b/c" becomes torch key "a.b.c"; ``key_map``
        renames flax paths to per-checkpoint torch keys (same keys as
        the import's map, used in the opposite direction).
      - 4-D conv kernels permute flax HWIO -> torch OIHW
        unconditionally; conv_transpose kernels (torch expects IOHW)
        are not auto-detected — post-permute via the caller, exactly
        as the import requires pre-permuting.
      - everything else (biases, norm scales, 1-D/2-D) copies as-is.

    Round-trip contract (tested): ``params_from_torch(template,
    params_to_torch(params))`` is bit-equal to ``params``.  The result
    holds plain numpy arrays, so no torch import happens here; save
    with ``torch.save({k: torch.from_numpy(v), ...}, path)``.
    """
    import numpy as np

    key_map = key_map or {}
    out: Dict[str, Any] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
            return
        arr = np.asarray(node, dtype=np.float32)
        if arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        out[key_map.get(prefix, prefix.replace("/", "."))] = arr

    walk(params, "")
    return out
