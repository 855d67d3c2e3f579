"""Shared CLI surface (SURVEY.md §2.13/§5 config row).

The reference exposes per-script argparse flags; these helpers mirror
that flag surface (``--mode DtoD|RtoD``, ``--dataset kitti|nyu``,
``--data_path``, ``--epochs``, ``--batch_size``, ``--lr``,
``--model_dir`` ...) while mapping everything onto the single Config
dataclass tree used internally.
"""

from __future__ import annotations

import argparse

from gdn_tpu.config import Config, kitti_config, nyu_config, _with


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dataset", choices=["kitti", "nyu", "synthetic"],
                   default="kitti")
    p.add_argument("--data_path", type=str, default="")
    p.add_argument("--height", type=int, default=None,
                   help="train height (default: dataset native)")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--max_depth", type=float, default=None)
    p.add_argument("--model_dir", type=str, default="checkpoints",
                   help="checkpoint directory")
    p.add_argument("--no_pallas", action="store_true",
                   help="disable Pallas kernels (XLA fallback)")
    p.add_argument("--upsample", choices=["resize_conv", "deconv"],
                   default=None,
                   help="decoder upsampling style: resize_conv (default; "
                        "wins the full-res convergence protocol — a1 "
                        "0.970 vs 0.932, BASELINE.md round 4) or deconv "
                        "(the reference's style; ~35%% faster steps for "
                        "the throughput-first regime)")
    p.add_argument("--deconv_init", choices=["lecun", "bilinear"],
                   default=None,
                   help="deconv kernel init: lecun (4x4, flax default) or "
                        "bilinear (6x6 composed bilinear-2x ∘ conv3x3 — at "
                        "init the deconv decoder computes the resize_conv "
                        "function on interior pixels; no checkerboard "
                        "start). Only used with --upsample deconv")
    p.add_argument("--norm", choices=["group", "none"], default=None,
                   help="conv-block normalization: group (default; "
                        "batch-size independent, no cross-chip stat "
                        "syncs) or none (plain conv+bias+act — measured "
                        "+6.6%% step throughput at B=128 but -0.07 mean "
                        "a1 with high seed variance on the synthetic "
                        "convergence protocol; BASELINE.md)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", choices=["default", "cpu", "tpu"],
                   default="default",
                   help="force a JAX backend (cpu is useful for smoke "
                        "runs; 'default' keeps the environment's choice)")


def apply_platform(args: argparse.Namespace) -> None:
    """Must run before any jax computation.  Uses jax.config (env vars
    are too late in environments whose sitecustomize pre-imports jax)."""
    if getattr(args, "platform", "default") != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)


def add_train_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--mode", choices=["DtoD", "RtoD"], default="DtoD",
                   help="stage 1 (depth autoencoder) or stage 2 (guided)")
    p.add_argument("--train_list", type=str, default="train.txt")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_schedule", choices=["step", "cosine", "constant"],
                   default="step",
                   help="LR shape: step (reference decay), cosine to 0 "
                        "over the full run, or constant; all compose "
                        "with --warmup_steps/--grad_accum")
    p.add_argument("--decay_epochs", type=int, default=20)
    p.add_argument("--decay_gamma", type=float, default=0.5)
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear 0->lr warmup over the first N optimizer "
                        "steps before the step-decay schedule")
    p.add_argument("--ema_decay", type=float, default=None,
                   help="track an EMA (Polyak) average of the params, "
                        "saved in checkpoints and selectable at eval "
                        "time with --use_ema (e.g. 0.999)")
    p.add_argument("--grad_clip", type=float, default=None,
                   help="clip gradients to this global norm")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="accumulate gradients over N micro-batches per "
                        "optimizer update (effective batch = N * "
                        "batch_size)")
    p.add_argument("--decode_cache", type=str, default="",
                   help="directory for the decoded-sample cache "
                        "(data/cache.py): epoch 1 decodes + persists "
                        "wire-dtype samples; later epochs read memmaps "
                        "at memcpy speed (native loader only)")
    p.add_argument("--device_cache", action="store_true",
                   help="keep the decoded wire corpus resident in HBM "
                        "and gather batches on device (data/"
                        "device_cache.py; small corpora only)")
    p.add_argument("--device_cache_sharded", action="store_true",
                   help="shard the device-resident corpus over the "
                        "mesh's data axis (each chip holds 1/D, local "
                        "gathers; lifts the HBM gate by the mesh size; "
                        "per-shard sample order)")
    p.add_argument("--train_wire", choices=["auto", "f32"], default="auto",
                   help="training-input H2D wire: auto ships uint8 RGB "
                        "+ uint16 depth counts and decodes on device "
                        "(4x fewer upload bytes; lossless for PNG "
                        "sources), f32 keeps host-side conversion")
    p.add_argument("--steps_per_epoch", type=int, default=1000,
                   help="steps per epoch for synthetic/unbounded data")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="optimizer steps fused into one jitted call "
                        "(lax.scan); amortizes per-dispatch latency. "
                        "Must divide steps_per_epoch")
    p.add_argument("--stage1_ckpt", type=str, default="",
                   help="(RtoD) stage-1 checkpoint dir; default "
                        "<model_dir>/stage1")
    p.add_argument("--no_freeze_decoder", action="store_true")
    p.add_argument("--ssim_precision", choices=["default", "high", "highest"],
                   default=None,
                   help="MXU precision of the SSIM blurs (see LossConfig). "
                        "NOTE: 'high' has no Mosaic dot lowering, so the "
                        "fused Pallas loss path runs it as 'highest'; the "
                        "XLA fallback runs true HIGH")
    p.add_argument("--num_devices", type=int, default=0,
                   help="mesh size (0 = all devices)")
    p.add_argument("--spatial_devices", type=int, default=1,
                   help="spatial-partitioning mesh axis: shard the image "
                        "HEIGHT across this many devices (XLA SPMD "
                        "inserts the conv halo exchanges); must divide "
                        "the device count; composes with data "
                        "parallelism (mesh = data x spatial)")
    p.add_argument("--model_devices", type=int, default=1,
                   help="tensor-parallel mesh axis: shard every "
                        "parameter's output-channel dim across this many "
                        "devices (Megatron-style column parallelism; XLA "
                        "SPMD inserts the activation collectives); must "
                        "divide the device count; mesh = data x model")
    p.add_argument("--fsdp", action="store_true",
                   help="shard parameters + optimizer/EMA state over the "
                        "data axis (ZeRO-3 semantics: weights all-gather "
                        "at use, gradients reduce-scatter); mutually "
                        "exclusive with --model_devices")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint of this stage")
    p.add_argument("--fused_guidance", action="store_true",
                   help="stage 2: run the shared frozen decoder ONCE on "
                        "the concatenated D+G batch (+9%% at B=32, slower "
                        "at B=128; requires freeze_decoder; BASELINE.md)")
    p.add_argument("--multiscale", action="store_true",
                   help="emit + supervise depth at every decoder scale "
                        "(DispNet-style multi-scale heads; "
                        "LossConfig.w_scales weights the term)")
    p.add_argument("--loader", choices=["native", "grain"], default="native",
                   help="KITTI host loader: threaded native decode or the "
                        "grain index-sampled pipeline (checkpointable "
                        "iterator, worker processes)")
    p.add_argument("--workers", type=int, default=0,
                   help="grain decode worker processes (0 = in-process; "
                        "resume stays exact at any worker count via the "
                        "checkpointed iterator state)")
    p.add_argument("--val_pairs_list", type=str, default="",
                   help="optional held-out list (train pair format) for "
                        "per-epoch validation loss")
    p.add_argument("--eval_every", type=int, default=0,
                   help="(RtoD) run the FULL eval protocol on the "
                        "--val_list split every N epochs and log the "
                        "7-metric table (0 = off)")
    p.add_argument("--eval_max_images", type=int, default=None,
                   help="cap images per in-training eval pass")
    p.add_argument("--eval_batch", type=int, default=32,
                   help="images per compiled in-training eval step "
                        "(metrics stay per-image; batching amortizes "
                        "dispatch + the per-batch metric fetch — the "
                        "EvalConfig default of 1 made every in-training "
                        "eval image its own round trip)")
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TensorBoard scalars under <model_dir>/tb")


def add_eval_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--val_list", type=str, default="val.txt")
    p.add_argument("--cap", type=float, default=None,
                   help="depth cap in meters (KITTI: 80 or 50; NYU: 10)")
    p.add_argument("--crop", choices=["garg", "eigen", "none"], default=None)
    p.add_argument("--calib_dir", type=str, default="",
                   help="KITTI calibration dir for velodyne .bin GT "
                        "entries in the eval list")
    p.add_argument("--median_scaling", action="store_true")
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--eval_batch", type=int, default=8,
                   help="images per compiled eval step (metrics stay "
                        "per-image; batching amortizes dispatch)")
    p.add_argument("--save_preds", type=str, default="",
                   help="also save per-image predicted depth (.npy, train "
                        "resolution) into this directory")
    p.add_argument("--flip_tta", action="store_true",
                   help="horizontal-flip test-time augmentation: average "
                        "the prediction with the un-mirrored prediction "
                        "of the mirrored input (standard monodepth "
                        "post-processing; one 2B-wide dispatch)")
    p.add_argument("--gt_wire", choices=["f32", "u16"], default=None,
                   help="H2D wire format for the raw-res GT batch (the "
                        "harness's dominant transfer): u16 ships "
                        "round(gt*256) counts — exact for KITTI's "
                        "16-bit-PNG GT, <=2 mm otherwise — at 1/4 the "
                        "bytes; f32 (default) keeps the bit-exact "
                        "protocol")
    p.add_argument("--rgb_wire", choices=["auto", "f32"], default=None,
                   help="eval RGB upload format: auto (default) ships "
                        "bfloat16 when the model computes in bfloat16 "
                        "(bit-identical, half the bytes)")
    p.add_argument("--num_devices", type=int, default=1,
                   help="data-parallel eval over this many chips "
                        "(1 = single device; 0 = all; eval_batch must "
                        "divide the mesh size)")
    p.add_argument("--use_ema", action="store_true",
                   help="evaluate the EMA (Polyak-averaged) weights from "
                        "an --ema_decay training run instead of the raw "
                        "params")
    p.add_argument("--device_cache", action="store_true",
                   help="stage the whole eval split in HBM first (wire "
                        "format, 2 GiB gate) so the timed pass reads "
                        "device-resident batches — no per-batch host "
                        "assembly or H2D (evaluate.Evaluator."
                        "cache_dataset)")


def apply_saved_model_config(cfg: Config, args: argparse.Namespace,
                             ckpt_dir: str) -> Config:
    """Self-describing checkpoints: adopt the ModelConfig persisted next
    to `ckpt_dir` (checkpoint.save_config) so eval/demo/serve/export
    rebuild the trained architecture without the user re-passing the
    training flags.  Explicit CLI flags still win — with a loud warning
    when they contradict what the checkpoint was trained with (the
    likely outcome is a parameter-shape restore error).

    Checkpoints from before round 4 have no config.json; they load
    exactly as before (CLI flags/defaults describe the model).
    """
    import dataclasses

    from gdn_tpu import checkpoint as ckpt

    saved = ckpt.load_config(ckpt_dir)
    if saved is None:
        return cfg
    model = saved.model
    # Adopt ARCHITECTURE only.  Execution-strategy fields (kernel
    # backends, custom VJPs, composed execution, compute dtype) change
    # no parameter and belong to the CURRENT environment — adopting
    # them would e.g. pin a checkpoint trained with --no_pallas (CPU
    # smoke run) to the XLA fallback forever, with no CLI way back.
    # The set is field metadata (config._exec_field), not a hardcoded
    # denylist, so new ModelConfig fields self-classify at definition
    # (tests/test_cli.py asserts every field is categorized).
    execution_fields = {
        f.name for f in dataclasses.fields(type(model))
        if f.metadata.get("execution")
    }
    model = dataclasses.replace(model, **{
        f: getattr(cfg.model, f) for f in execution_fields
    })
    # Re-apply explicit CLI architecture overrides on top of the saved
    # config (None/False defaults mean "not given").
    overrides = {}
    if getattr(args, "height", None) or getattr(args, "width", None):
        overrides["image_size"] = (
            args.height or model.image_size[0],
            args.width or model.image_size[1],
        )
    if getattr(args, "max_depth", None):
        overrides["max_depth"] = args.max_depth
    for flag, field in (("upsample", "upsample"),
                        ("deconv_init", "deconv_init"),
                        ("norm", "norm")):
        v = getattr(args, flag, None)
        if v is not None:
            overrides[field] = v
    if getattr(args, "multiscale", False):
        overrides["multiscale_heads"] = True
    for field, v in overrides.items():
        if getattr(model, field) != v:
            print(
                f"[config] WARNING: checkpoint {ckpt_dir} was trained "
                f"with model.{field}={getattr(model, field)!r} but the "
                f"CLI requests {v!r} — honoring the CLI; expect a "
                f"parameter-shape mismatch unless this is intentional",
                flush=True,
            )
    model = dataclasses.replace(model, **overrides)
    if model != cfg.model:
        diffs = [
            f.name for f in dataclasses.fields(model)
            if getattr(model, f.name) != getattr(cfg.model, f.name)
        ]
        print(f"[config] adopted model config from {ckpt_dir}/config.json "
              f"(differs from CLI defaults in: {', '.join(diffs)})",
              flush=True)
    return dataclasses.replace(cfg, model=model)


def build_config(args: argparse.Namespace) -> Config:
    cfg = nyu_config() if args.dataset == "nyu" else kitti_config()
    over = {
        "data.dataset": args.dataset,
        "data.data_path": args.data_path,
        "train.seed": args.seed,
        "train.ckpt_dir": args.model_dir,
    }
    model = cfg.model
    import dataclasses

    if args.height or args.width:
        h = args.height or model.image_size[0]
        w = args.width or model.image_size[1]
        model = dataclasses.replace(model, image_size=(h, w))
    if args.max_depth:
        model = dataclasses.replace(model, max_depth=args.max_depth)
    if getattr(args, "upsample", None):
        model = dataclasses.replace(model, upsample=args.upsample)
    if getattr(args, "deconv_init", None):
        model = dataclasses.replace(model, deconv_init=args.deconv_init)
    if getattr(args, "norm", None):
        model = dataclasses.replace(model, norm=args.norm)
    if getattr(args, "multiscale", False):
        model = dataclasses.replace(model, multiscale_heads=True)
    if getattr(args, "no_pallas", False):
        model = dataclasses.replace(model, use_pallas=False)
        over["loss.use_pallas"] = False
    cfg = dataclasses.replace(cfg, model=model)

    if hasattr(args, "epochs"):
        over.update({
            "data.train_list": args.train_list,
            "data.batch_size": args.batch_size,
            "train.mode": args.mode,
            "train.epochs": args.epochs,
            "train.lr": args.lr,
            "train.schedule": args.lr_schedule,
            "train.decay_epochs": args.decay_epochs,
            "train.decay_gamma": args.decay_gamma,
            "train.steps_per_epoch": args.steps_per_epoch,
            "train.steps_per_call": args.steps_per_call,
            "train.warmup_steps": args.warmup_steps,
            "train.ema_decay": args.ema_decay,
            "train.grad_clip": args.grad_clip,
            "train.grad_accum": args.grad_accum,
            "train.fused_guidance": args.fused_guidance,
            "data.loader": args.loader,
            "data.grain_workers": args.workers,
            "data.train_wire": args.train_wire,
            "data.decode_cache": args.decode_cache,
            "data.device_cache": args.device_cache,
            "data.device_cache_sharded": args.device_cache_sharded,
            "train.freeze_decoder": not args.no_freeze_decoder,
            "train.log_every": args.log_every,
            "mesh.num_devices": args.num_devices,
            "mesh.spatial_devices": args.spatial_devices,
            "mesh.model_devices": args.model_devices,
            "mesh.fsdp": args.fsdp,
        })
        if args.ssim_precision is not None:
            over["loss.ssim_precision"] = args.ssim_precision
    # --eval_batch exists on BOTH surfaces (add_eval_args and, since
    # round 5, add_train_args for --eval_every in-training eval).
    if getattr(args, "eval_batch", None):
        over["eval.batch_size"] = args.eval_batch
    if hasattr(args, "val_list"):
        over["data.val_list"] = args.val_list
        if getattr(args, "calib_dir", ""):
            over["data.calib_dir"] = args.calib_dir
        if args.cap is not None:
            over["eval.cap"] = args.cap
        if args.crop is not None:
            over["eval.crop"] = args.crop
        if args.median_scaling:
            over["eval.median_scaling"] = True
        if getattr(args, "gt_wire", None):
            over["eval.gt_wire"] = args.gt_wire
        if getattr(args, "rgb_wire", None):
            over["eval.rgb_wire"] = args.rgb_wire
        if hasattr(args, "num_devices"):
            over["mesh.num_devices"] = args.num_devices
    return _with(cfg, **over)
