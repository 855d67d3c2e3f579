#!/usr/bin/env python
"""Export a trained stage-2 checkpoint to a portable StableHLO artifact
(deployment surface; see gdn_tpu/serving.py).

Example:
  python scripts/export.py --model_dir checkpoints --output model.stablehlo \
      --export_batch 8 --platforms tpu cpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    from gdn_tpu.cli import add_common_args, apply_platform, build_config

    add_common_args(p)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--export_batch", type=int, default=1)
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms, e.g. --platforms tpu cpu")
    p.add_argument("--quantize", choices=["none", "int8"], default="none",
                   help="bake int8 inference into the artifact "
                        "(ops/quant.py; scales calibrated at export "
                        "time on --quant_calib_dir images, else synthetic "
                        "scenes — scales are PERMANENT in the artifact, "
                        "so calibrate on deployment-representative "
                        "imagery when you have it)")
    p.add_argument("--quant_calib_dir", type=str, default="",
                   help="directory of representative RGB images for int8 "
                        "activation-scale calibration")
    p.add_argument("--use_ema", action="store_true",
                   help="export the EMA (Polyak-averaged) weights from an "
                        "--ema_decay training run")
    args = p.parse_args()
    apply_platform(args)
    cfg = build_config(args)
    from gdn_tpu.cli import apply_saved_model_config

    cfg = apply_saved_model_config(cfg, args, f"{cfg.train.ckpt_dir}/stage2")

    from gdn_tpu import checkpoint as ckpt
    from gdn_tpu.models import RtoDNet
    from gdn_tpu.serving import export_model
    from gdn_tpu.train import create_state

    h, w = cfg.model.image_size
    template = create_state(RtoDNet(cfg=cfg.model), (1, h, w, 3), cfg.train, 1)
    params = ckpt.load_params(
        f"{cfg.train.ckpt_dir}/stage2", template.params,
        key="ema_params" if args.use_ema else "params",
    )
    quant_scales = None
    if args.quantize != "none":
        import dataclasses

        from gdn_tpu.ops.quant import quantized_model_and_scales

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, quant=args.quantize)
        )
        _, quant_scales = quantized_model_and_scales(
            cfg, params, calib_dir=args.quant_calib_dir or None
        )
        print("int8: scales calibrated")
    export_model(
        cfg, params, args.output,
        batch_size=args.export_batch, platforms=args.platforms,
        quant_scales=quant_scales,
    )
    print(f"exported {args.output} ({os.path.getsize(args.output)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
