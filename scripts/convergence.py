#!/usr/bin/env python
"""Convergence-protocol CLI: the synthetic learning-evidence workflow
(BASELINE.md "600-step synthetic protocol") as a tool, like
scripts/profile_step.py is for the tracing workflow.

Runs the full two-stage pipeline per seed — D-net pretrain ->
decoder transfer+freeze -> guided G-net train — on the procedural
synthetic generator, then evaluates the held-out split through the
full eval protocol and reports per-seed metrics + the a1 mean.  This
is the harness every architecture knob (upsample style, deconv init,
norm choice, multiscale) has been judged with; keeping it in-repo
makes the next judgment one command instead of a rebuilt /tmp script.

Example (the standard protocol):
  python scripts/convergence.py --seeds 0 1 2
  python scripts/convergence.py --norm none --seeds 0 1 2
  python scripts/convergence.py --upsample resize_conv --steps 300
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--steps", type=int, default=300,
                   help="train steps PER STAGE (default 300 -> the "
                        "600-step protocol)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--height", type=int, default=32)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--eval_images", type=int, default=30)
    p.add_argument("--norm", choices=["group", "none"], default="group")
    p.add_argument("--upsample", choices=["resize_conv", "deconv"],
                   default=None)
    p.add_argument("--deconv_init", choices=["lecun", "bilinear"],
                   default=None)
    p.add_argument("--multiscale", action="store_true")
    p.add_argument("--platform", choices=["default", "cpu", "tpu"],
                   default="default")
    args = p.parse_args()

    from gdn_tpu.cli import apply_platform

    apply_platform(args)

    import dataclasses

    from gdn_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from gdn_tpu.data.synthetic import SyntheticDataset, SyntheticEvalDataset
    from gdn_tpu.evaluate import evaluate
    from gdn_tpu.train import make_eval_forward
    from gdn_tpu.train.loop import train_stage1, train_stage2

    model = ModelConfig(
        image_size=(args.height, args.width), norm=args.norm,
        multiscale_heads=args.multiscale,
    )
    if args.upsample:
        model = dataclasses.replace(model, upsample=args.upsample)
    if args.deconv_init:
        model = dataclasses.replace(model, deconv_init=args.deconv_init)

    results = {}
    for seed in args.seeds:
        t0 = time.time()
        cfg = Config(
            model=model,
            train=TrainConfig(
                ckpt_dir="", lr=args.lr, epochs=1,
                steps_per_epoch=args.steps, seed=seed, log_every=100,
            ),
            data=DataConfig(batch_size=args.batch_size,
                            dataset="synthetic"),
        )
        h, w = args.height, args.width
        d_data = SyntheticDataset(args.batch_size, h, w,
                                  cfg.model.max_depth, seed=seed)
        d_state = train_stage1(cfg, d_data, use_mesh=False)
        g_data = SyntheticDataset(args.batch_size, h, w,
                                  cfg.model.max_depth, seed=seed + 1000)
        g_state = train_stage2(cfg, g_data, d_state.params, use_mesh=False)

        eval_ds = SyntheticEvalDataset(args.eval_images, h, w,
                                       cfg.model.max_depth)
        m = evaluate(cfg, g_state.params, make_eval_forward(cfg), eval_ds,
                     verbose=False)
        # Full 8-metric table per seed: the convergence contract is
        # "accuracy within 1%" on ALL protocol metrics, not a1 alone
        # (VERDICT r3 missing item 1).
        results[seed] = {k: round(float(v), 4) for k, v in m.items()}
        print(json.dumps({"seed": seed,
                          "mins": round((time.time() - t0) / 60, 1),
                          "metrics": results[seed]}), flush=True)

    a1s = [results[s]["a1"] for s in results]
    print(json.dumps({"DONE": True, "norm": args.norm,
                      "upsample": model.upsample, "seeds": args.seeds,
                      "a1_mean": round(sum(a1s) / len(a1s), 4),
                      "per_seed": results}), flush=True)


if __name__ == "__main__":
    main()
