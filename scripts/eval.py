#!/usr/bin/env python
"""Eval entry point reproducing the reference protocol (SURVEY.md
§2.7/§3.3): load checkpoint -> batched eval split -> upsample
predictions to GT resolution -> crop/cap -> print the 7-metric table.

Examples:
  python scripts/eval.py --dataset kitti --data_path /data/kitti \
      --model_dir checkpoints --cap 80 --crop garg
  python scripts/eval.py --dataset nyu --data_path /data/nyu --cap 10
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    from gdn_tpu.cli import add_common_args, add_eval_args, apply_platform, build_config

    add_common_args(p)
    add_eval_args(p)
    p.add_argument("--stage", choices=["1", "2"], default="2",
                   help="evaluate stage-2 G-net (default) or stage-1 "
                        "D-net reconstruction")
    p.add_argument("--quantize", choices=["none", "int8"], default="none",
                   help="post-training int8 inference (ops/quant.py): "
                        "interior convs run s8xs8->s32 on the MXU with "
                        "activation scales calibrated on held-IN data "
                        "(--quant_calib_dir images, else the train split, "
                        "else synthetic scenes — never the eval images "
                        "being scored; stage-2 eval only)")
    p.add_argument("--quant_calib_dir", default="",
                   help="directory of representative RGB images for int8 "
                        "activation-scale calibration (distinct from "
                        "--calib_dir, the KITTI velodyne calibration)")
    p.add_argument("--best", action="store_true",
                   help="load <model_dir>/stage2_best (the best-eval-RMSE "
                        "checkpoint written by --eval_every training)")
    args = p.parse_args()
    apply_platform(args)
    cfg = build_config(args)
    from gdn_tpu.cli import apply_saved_model_config

    stage_dir = (
        f"{cfg.train.ckpt_dir}/stage1" if args.stage == "1"
        else f"{cfg.train.ckpt_dir}/stage2_best" if args.best
        else f"{cfg.train.ckpt_dir}/stage2"
    )
    cfg = apply_saved_model_config(cfg, args, stage_dir)

    import jax

    from gdn_tpu import checkpoint as ckpt
    from gdn_tpu.data.pipeline import make_loader
    from gdn_tpu.evaluate import evaluate
    from gdn_tpu.models import DtoDNet, RtoDNet
    from gdn_tpu.train import create_state, make_eval_forward

    h, w = cfg.model.image_size
    dataset = make_loader(cfg, "eval")
    if args.stage == "1" and args.quantize != "none":
        raise SystemExit("--quantize supports stage-2 eval only")
    if args.stage == "1":
        # Stage-1 reconstruction eval: the D-net autoencodes the GT
        # depth (downsampled to train res) and is scored against the
        # raw-res GT through the same protocol.
        template = create_state(
            DtoDNet(cfg=cfg.model), (1, h, w, 1), cfg.train, 1
        )
        params = ckpt.load_params(
            f"{cfg.train.ckpt_dir}/stage1", template.params,
            key="ema_params" if args.use_ema else "params",
        )
        model = DtoDNet(cfg=cfg.model)
        forward = jax.jit(
            lambda p, depth: model.apply({"params": p}, depth)["depth"]
        )
        from gdn_tpu.ops.resize import resize_nearest

        def stage1_ds(source):
            for sample in source:
                gt = sample["gt"]
                depth_in = resize_nearest(gt[0], (h, w))[None, ..., None]
                yield {"rgb": depth_in, "gt": gt}

        dataset = stage1_ds(dataset)
    else:
        template = create_state(
            RtoDNet(cfg=cfg.model), (1, h, w, 3), cfg.train, 1
        )
        stage2_dir = (
            f"{cfg.train.ckpt_dir}/stage2_best" if args.best
            else f"{cfg.train.ckpt_dir}/stage2"
        )
        params = ckpt.load_params(
            stage2_dir, template.params,
            key="ema_params" if args.use_ema else "params",
        )
        if args.quantize != "none":
            import dataclasses

            from gdn_tpu.ops.quant import quantized_model_and_scales

            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(
                    cfg.model, quant=args.quantize)
            )
            # Calibrate on held-IN data (--quant_calib_dir > train split >
            # synthetic) — never the eval images being scored, so the
            # reported int8 metrics carry no calibration leakage.
            qmodel, scales = quantized_model_and_scales(
                cfg, params, calib_dir=args.quant_calib_dir or None,
                prefer_train_split=True,
            )
            forward = make_eval_forward(
                cfg, qmodel, flip_tta=args.flip_tta, quant_scales=scales
            )
        else:
            forward = make_eval_forward(cfg, flip_tta=args.flip_tta)
    mesh = None
    if args.num_devices != 1:
        from gdn_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(cfg.mesh.num_devices)
        print(f"data-parallel eval over {mesh.size} devices")
    results = evaluate(
        cfg, params, forward, dataset, max_images=args.max_images,
        save_preds=args.save_preds or None, mesh=mesh,
        device_cache=args.device_cache,
    )
    print(
        " ".join(
            f"{k}={v:.4f}" for k, v in results.items()
        )
    )


if __name__ == "__main__":
    main()
