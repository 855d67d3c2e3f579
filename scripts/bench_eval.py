#!/usr/bin/env python
"""Eval-throughput benchmark: full protocol fps on synthetic raw-res data.

Measures `evaluate.Evaluator` end-to-end — forward at train res →
fp32 bilinear resize to GT res → crop/cap/mask → 8 per-image metrics —
on a synthetic KITTI-shaped split (cycled pool of host images), either
host-fed (prefetch thread, per-batch H2D) or device-cached
(`--device_cache`: wire-encode + upload once, zero per-pass H2D).

Prints one JSON line per pass.  Measured numbers and their tunnel
caveats: BASELINE.md "Eval throughput" (round 5) — headline ~6000 fps
at --eval_batch 256 device-cached on one chip.

Example:
  python scripts/bench_eval.py --eval_batch 256 --device_cache --images 1024
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", type=int, default=1024)
    p.add_argument("--eval_batch", type=int, default=256)
    p.add_argument("--gt_height", type=int, default=375)
    p.add_argument("--gt_width", type=int, default=1242)
    p.add_argument("--gt_wire", choices=["f32", "u16"], default="u16")
    p.add_argument("--device_cache", action="store_true")
    p.add_argument("--passes", type=int, default=2,
                   help="eval passes (pass 1 includes compile warmup "
                        "handling; later passes are steady-state)")
    p.add_argument("--platform", choices=["tpu", "cpu"], default="tpu")
    args = p.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from gdn_tpu.config import kitti_config
    from gdn_tpu.models import RtoDNet
    from gdn_tpu.train import create_state, make_eval_forward
    from gdn_tpu.evaluate import Evaluator

    GT = (args.gt_height, args.gt_width)
    POOL = 8
    rng = np.random.default_rng(0)
    cfg = kitti_config(**{
        "train.ckpt_dir": "", "eval.batch_size": args.eval_batch,
        "eval.gt_wire": args.gt_wire,
    })
    h, w = cfg.model.image_size
    pool = [{
        "rgb": rng.random((1, h, w, 3), dtype=np.float32),
        "gt": (rng.random((1, *GT), dtype=np.float32)
               * (cfg.eval.cap - 1.0) + 1.0),
    } for _ in range(POOL)]

    def dataset():
        for i in range(args.images):
            yield pool[i % POOL]

    params = create_state(
        RtoDNet(cfg=cfg.model), (1, h, w, 3), cfg.train, 1
    ).params
    ev = Evaluator(cfg, make_eval_forward(cfg))
    if args.device_cache:
        t0 = time.perf_counter()
        ev.cache_dataset(dataset())
        build_s = time.perf_counter() - t0
    for i in range(args.passes):
        out = ev.run(
            params, None if args.device_cache else dataset(),
            verbose=False,
        )
        line = {
            "pass": i + 1, "fps": round(out["fps"], 1),
            "batch": args.eval_batch, "images": args.images,
            "feeding": "device_cache" if args.device_cache else "host",
            "gt_wire": args.gt_wire,
        }
        if args.device_cache:
            line["cache_mb"] = round(ev.cached_bytes / 2**20)
            line["cache_build_s"] = round(build_s, 1)
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
