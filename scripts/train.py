#!/usr/bin/env python
"""Train entry point mirroring the reference's train scripts
(SURVEY.md §2.6): ``--mode DtoD`` pretrains the stage-1 depth
autoencoder; ``--mode RtoD`` loads the stage-1 checkpoint, transfers +
freezes the decoder, and trains the guided stage-2 RGB-to-depth net.

Examples:
  python scripts/train.py --mode DtoD --dataset kitti --data_path /data/kitti
  python scripts/train.py --mode RtoD --dataset kitti --data_path /data/kitti \
      --stage1_ckpt checkpoints/stage1
  python scripts/train.py --mode DtoD --dataset synthetic --epochs 2 \
      --steps_per_epoch 50   # smoke run, no data needed
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    from gdn_tpu.cli import add_common_args, add_train_args, apply_platform, build_config

    add_common_args(p)
    add_train_args(p)
    args = p.parse_args()
    apply_platform(args)
    cfg = build_config(args)
    from gdn_tpu.cli import apply_saved_model_config

    if args.resume:
        # Self-describing resume: the checkpoint's own architecture wins
        # over defaults (explicit CLI flags still override, loudly).
        stage_dir = f"{cfg.train.ckpt_dir}/stage{'1' if args.mode == 'DtoD' else '2'}"
        cfg = apply_saved_model_config(cfg, args, stage_dir)
    elif args.mode == "RtoD":
        # The stage-1 checkpoint describes the decoder being transferred;
        # adopting its model config keeps the transfer shape-compatible.
        cfg = apply_saved_model_config(
            cfg, args, args.stage1_ckpt or f"{cfg.train.ckpt_dir}/stage1"
        )

    import jax

    from gdn_tpu import checkpoint as ckpt
    from gdn_tpu.data.pipeline import make_loader, make_train_pipeline
    from gdn_tpu.models import DtoDNet
    from gdn_tpu.train import create_state
    from gdn_tpu.train.loop import train_stage1, train_stage2
    from gdn_tpu.utils.logging import MetricLogger

    print(f"devices: {jax.devices()}")
    from gdn_tpu.parallel.mesh import create_mesh

    # One mesh for pipeline + trainer: prefetch device_puts each batch
    # sharded over all chips exactly once (no device-0 funnel), and the
    # jitted augmentation then runs sharded too.
    mesh = create_mesh(
        cfg.mesh.num_devices, spatial=cfg.mesh.spatial_devices,
        model=cfg.mesh.model_devices,
    )
    loader = make_loader(cfg, "train")
    augment = cfg.data.dataset != "synthetic"
    if cfg.data.device_cache and augment:
        if cfg.data.loader != "native":
            raise ValueError("--device_cache requires --loader native")
        if cfg.data.device_cache_sharded:
            from gdn_tpu.data.device_cache import ShardedDeviceDataset

            loader = ShardedDeviceDataset(loader, mesh)
            print(
                f"device_cache (sharded): {len(loader)} samples resident "
                f"across {mesh.shape['data']} devices"
            )
        else:
            from gdn_tpu.data.device_cache import DeviceResidentDataset

            loader = DeviceResidentDataset(loader, mesh)
            print(f"device_cache: {len(loader)} samples resident in HBM")

    stage_subdir = "stage1" if args.mode == "DtoD" else "stage2"
    resume_dir = f"{cfg.train.ckpt_dir}/{stage_subdir}"

    def build_pipeline(resumed_step: int = 0):
        # Deterministic data-order resume: the batch stream is a pure
        # function of (seed, batch index), so positioning the loader and
        # fast-forwarding the augmentation key chain by the restored
        # step count replays batches exactly as an uninterrupted run.
        # Grain loaders restore the exact iterator state checkpointed in
        # the orbax payload (correct at ANY worker count); seek() is the
        # fallback for native loaders and pre-round-4 checkpoints.
        if resumed_step:
            ls = (
                ckpt.load_loader_state(resume_dir)
                if cfg.data.loader == "grain" else None
            )
            if ls is not None and ls.get("step") == resumed_step:
                loader.load_state_dict(ls["grain"], produced=resumed_step)
                print(f"restored grain loader state at step {resumed_step}")
            else:
                loader.seek(resumed_step)
        return make_train_pipeline(
            cfg, loader, mesh=mesh, augment=augment, skip=resumed_step
        )

    loader_state_fn = None
    if cfg.data.loader == "grain":
        def loader_state_fn(step: int):
            # Never let a cursor-capture failure kill the training run —
            # but be honest about the consequence: seek() only works on
            # a single index stream, so a multiprocess (>=2 worker)
            # loader whose capture failed cannot reposition at all
            # (grain_loader.seek raises NotImplementedError there).
            try:
                return {"grain": loader.state_dict_at(step), "step": step}
            except Exception as e:  # noqa: BLE001
                if cfg.data.grain_workers >= 2:
                    print(f"[train] WARNING: loader state capture failed "
                          f"({e}); with --workers "
                          f"{cfg.data.grain_workers} there is NO seek() "
                          f"fallback — --resume from this checkpoint "
                          f"will refuse to reposition the data stream "
                          f"(NotImplementedError)", flush=True)
                else:
                    print(f"[train] loader state capture failed ({e}); "
                          f"resume will use seek()", flush=True)
                return None

    logger = MetricLogger(
        prefix=f"stage{'1' if args.mode == 'DtoD' else '2'}",
        jsonl_path=os.path.join(cfg.train.ckpt_dir, "train_log.jsonl")
        if cfg.train.ckpt_dir
        else None,
        tensorboard_dir=os.path.join(cfg.train.ckpt_dir, "tb")
        if args.tensorboard and cfg.train.ckpt_dir
        else None,
    )
    val_iter = None
    if args.val_pairs_list:
        from gdn_tpu.data.kitti import KittiTrainDataset
        from gdn_tpu.data.nyu import NyuTrainDataset

        h, w = cfg.model.image_size
        val_cls = NyuTrainDataset if args.dataset == "nyu" else KittiTrainDataset
        # wire="f32": _validate consumes host batches directly (no
        # device-side wire decode on the periodic validation path)
        val_iter = val_cls(
            cfg.data.data_path, args.val_pairs_list, (h, w),
            cfg.data.batch_size, max_depth=cfg.model.max_depth,
            wire="f32",
        )

    if args.mode == "DtoD":
        state = None
        if args.resume:
            h, w = cfg.model.image_size
            state = create_state(
                DtoDNet(cfg=cfg.model), (1, h, w, 1), cfg.train,
                cfg.train.steps_per_epoch,
            )
            state = ckpt.restore_checkpoint(
                f"{cfg.train.ckpt_dir}/stage1", state
            )
            print(f"resumed stage 1 at step {int(state.step)}")
        state = train_stage1(
            cfg, build_pipeline(int(state.step) if state is not None else 0),
            state=state, logger=logger, val_iter=val_iter,
            mesh=mesh, loader_state_fn=loader_state_fn,
        )
        print(f"stage 1 finished at step {int(state.step)}")
    else:
        stage1_dir = args.stage1_ckpt or f"{cfg.train.ckpt_dir}/stage1"
        h, w = cfg.model.image_size
        d_template = create_state(
            DtoDNet(cfg=cfg.model), (1, h, w, 1), cfg.train, 1
        )
        d_params = ckpt.load_params(stage1_dir, d_template.params)
        print(f"loaded stage-1 params from {stage1_dir}")
        state = None
        if args.resume:
            from gdn_tpu.models import RtoDNet

            state = create_state(
                RtoDNet(cfg=cfg.model), (1, h, w, 3), cfg.train,
                cfg.train.steps_per_epoch,
                freeze_decoder=cfg.train.freeze_decoder,
            )
            state = ckpt.restore_checkpoint(
                f"{cfg.train.ckpt_dir}/stage2", state
            )
            print(f"resumed stage 2 at step {int(state.step)}")
        eval_dataset = None
        if args.eval_every:
            # synthetic included: data/synthetic.SyntheticEvalDataset
            # provides a bounded eval split without data on disk.
            # CachedSampleIterable memoizes the decoded split host-side
            # so every eval_every epoch after the first replays arrays
            # instead of re-decoding the disk (1 GiB cap, bounded by
            # --eval_max_images).
            from gdn_tpu.data.pipeline import CachedSampleIterable

            eval_dataset = CachedSampleIterable(
                lambda: iter(make_loader(cfg, "eval")),
                max_items=args.eval_max_images,
            )
        state = train_stage2(
            cfg, build_pipeline(int(state.step) if state is not None else 0),
            d_params, state=state, logger=logger,
            val_iter=val_iter, mesh=mesh,
            eval_dataset=eval_dataset, eval_every=args.eval_every,
            eval_max_images=args.eval_max_images,
            loader_state_fn=loader_state_fn,
        )
        print(f"stage 2 finished at step {int(state.step)}")


if __name__ == "__main__":
    main()
