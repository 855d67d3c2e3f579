#!/usr/bin/env python
"""Demo entry point (SURVEY.md §2.8): single-image / directory
inference producing colorized depth maps and an optional GIF.

Examples:
  python scripts/demo.py --input img.png --model_dir checkpoints --output out/
  python scripts/demo.py --input frames_dir/ --gif demo.gif --output out/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    from gdn_tpu.cli import add_common_args, apply_platform, build_config

    add_common_args(p)
    p.add_argument("--input", type=str, required=True,
                   help="image file or directory of frames")
    p.add_argument("--output", type=str, default="demo_out")
    p.add_argument("--gif", type=str, default="",
                   help="also write an animated GIF with this name")
    p.add_argument("--cmap", type=str, default="magma")
    p.add_argument("--no_side_by_side", action="store_true")
    p.add_argument("--flip_tta", action="store_true",
                   help="horizontal-flip test-time averaging")
    p.add_argument("--use_ema", action="store_true",
                   help="use the EMA (Polyak-averaged) weights from an "
                        "--ema_decay training run")
    args = p.parse_args()
    apply_platform(args)
    cfg = build_config(args)
    from gdn_tpu.cli import apply_saved_model_config

    cfg = apply_saved_model_config(cfg, args, f"{cfg.train.ckpt_dir}/stage2")

    from gdn_tpu import checkpoint as ckpt
    from gdn_tpu.demo import run_demo
    from gdn_tpu.models import RtoDNet
    from gdn_tpu.train import create_state

    h, w = cfg.model.image_size
    template = create_state(
        RtoDNet(cfg=cfg.model), (1, h, w, 3), cfg.train, 1
    )
    params = ckpt.load_params(
        f"{cfg.train.ckpt_dir}/stage2", template.params,
        key="ema_params" if args.use_ema else "params",
    )
    written = run_demo(
        cfg, params, args.input, args.output,
        gif=args.gif or None, cmap=args.cmap,
        side_by_side=not args.no_side_by_side, flip_tta=args.flip_tta,
    )
    for path in written:
        print(path)


if __name__ == "__main__":
    main()
