#!/usr/bin/env python
"""Inference-server entry point: HTTP depth-prediction service with
dynamic request batching (gdn_tpu/server.py).

Examples:
  python scripts/serve.py --model_dir checkpoints --port 8500
  python scripts/serve.py --model_dir checkpoints --use_ema \
      --serve_batch 16 --max_wait_ms 8

  curl -s -X POST --data-binary @img.png \
      "http://127.0.0.1:8500/predict?format=color" > depth.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    from gdn_tpu.cli import add_common_args, apply_platform, build_config

    add_common_args(p)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500,
                   help="0 picks an ephemeral port (printed on start)")
    p.add_argument("--serve_batch", type=int, default=8,
                   help="compiled batch size the dynamic batcher fills")
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="batching window opened by the first request")
    p.add_argument("--request_timeout", type=float, default=600.0,
                   help="per-request wait bound (seconds)")
    p.add_argument("--use_ema", action="store_true",
                   help="serve the EMA (Polyak-averaged) weights")
    p.add_argument("--init_random", action="store_true",
                   help="serve randomly initialized weights (no "
                        "checkpoint needed; smoke tests only)")
    p.add_argument("--wire", choices=["f32", "u16"], default="f32",
                   help="device fetch format: f32 meters, or u16 "
                        "depth*256 counts (half the D2H bytes, exact "
                        "to 1/256 m — png16 responses need no "
                        "conversion at all)")
    p.add_argument("--quantize", choices=["none", "int8"], default="none",
                   help="post-training int8 serving (ops/quant.py): "
                        "scales calibrated at startup on synthetic "
                        "scenes, or on the PNG/JPEGs in --quant_calib_dir")
    p.add_argument("--quant_calib_dir", type=str, default="",
                   help="directory of images to calibrate --quantize "
                        "int8 on (better than the synthetic default)")
    p.add_argument("--artifact", type=str, default="",
                   help="serve a scripts/export.py StableHLO artifact "
                        "instead of a checkpoint (params, batch size "
                        "and image shape are baked in; no model code "
                        "or checkpoint needed)")
    args = p.parse_args()
    apply_platform(args)
    cfg = build_config(args)
    if not args.artifact:
        from gdn_tpu.cli import apply_saved_model_config

        cfg = apply_saved_model_config(
            cfg, args, f"{cfg.train.ckpt_dir}/stage2"
        )

    from gdn_tpu.server import DepthServer

    predictor = None
    params = None
    if args.artifact:
        from gdn_tpu.serving import BatchedPredictor

        predictor = BatchedPredictor.from_artifact(args.artifact)
        print(f"artifact: batch={predictor.batch_size} "
              f"image={predictor.image_size}", flush=True)
    else:
        from gdn_tpu import checkpoint as ckpt
        from gdn_tpu.models import RtoDNet
        from gdn_tpu.train import create_state

        h, w = cfg.model.image_size
        template = create_state(
            RtoDNet(cfg=cfg.model), (1, h, w, 3), cfg.train, 1
        )
        if args.init_random:
            params = template.params
        else:
            params = ckpt.load_params(
                f"{cfg.train.ckpt_dir}/stage2", template.params,
                key="ema_params" if args.use_ema else "params",
            )

    if args.quantize != "none":
        if args.artifact:
            raise SystemExit(
                "--quantize applies at export/serve-from-checkpoint "
                "time; quantize the artifact via scripts/export.py "
                "--quantize int8 instead"
            )
        import dataclasses

        from gdn_tpu.ops.quant import quantized_model_and_scales
        from gdn_tpu.serving import BatchedPredictor

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, quant=args.quantize)
        )
        try:
            _, scales = quantized_model_and_scales(
                cfg, params, calib_dir=args.quant_calib_dir or None
            )
        except ValueError as e:
            raise SystemExit(f"int8 calibration failed: {e}")
        predictor = BatchedPredictor(
            cfg, params, batch_size=args.serve_batch, quant_scales=scales
        )
        print("int8: scales calibrated", flush=True)

    print("warming up the serving program...", flush=True)
    server = DepthServer(
        cfg, params, host=args.host, port=args.port,
        batch_size=args.serve_batch, max_wait_ms=args.max_wait_ms,
        timeout_s=args.request_timeout, predictor=predictor,
        wire=args.wire,
    )
    print(f"serving on http://{args.host}:{server.port} "
          f"(batch={args.serve_batch}, window={args.max_wait_ms}ms)",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
