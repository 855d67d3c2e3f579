#!/usr/bin/env python
"""Export a gdn-tpu checkpoint as a torch ``state_dict`` ``.pth`` —
the inverse of ``scripts/import_torch.py``, so models trained in this
framework can travel back to the reference's PyTorch ecosystem
(SURVEY.md §2.9: the reference distributes models as ``.pth`` files).

4-D conv kernels are permuted flax HWIO -> torch OIHW (the torch
convention import_torch.py reverses); ``--key_map`` renames flax
parameter paths ("a/b/c") to torch keys for consumers expecting the
reference's module names.

Examples:
  python scripts/export_torch.py --stage 2 --model_dir checkpoints \
      --pth gdn_stage2.pth
  python scripts/export_torch.py --stage 2 --model_dir checkpoints \
      --pth gdn_ema.pth --use_ema
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    from gdn_tpu.cli import (
        add_common_args, apply_platform, apply_saved_model_config,
        build_config,
    )

    add_common_args(p)
    p.add_argument("--pth", required=True, help="output .pth path")
    p.add_argument("--stage", choices=["1", "2"], default="2")
    p.add_argument("--key_map", default="",
                   help="JSON map of flax paths ('a/b/c') to torch keys")
    p.add_argument("--use_ema", action="store_true",
                   help="export the EMA (Polyak-averaged) weights")
    args = p.parse_args()
    apply_platform(args)
    cfg = build_config(args)
    stage_dir = os.path.join(cfg.train.ckpt_dir, f"stage{args.stage}")
    # self-describing checkpoints: rebuild the trained architecture
    cfg = apply_saved_model_config(cfg, args, stage_dir)

    import numpy as np
    import torch

    from gdn_tpu import checkpoint as ckpt
    from gdn_tpu.models import DtoDNet, RtoDNet
    from gdn_tpu.train import create_state

    h, w = cfg.model.image_size
    if args.stage == "1":
        template = create_state(DtoDNet(cfg=cfg.model), (1, h, w, 1),
                                cfg.train, 1)
    else:
        template = create_state(RtoDNet(cfg=cfg.model), (1, h, w, 3),
                                cfg.train, 1)
    params = ckpt.load_params(
        stage_dir, template.params,
        key="ema_params" if args.use_ema else "params",
    )
    key_map = json.load(open(args.key_map)) if args.key_map else None
    sd = ckpt.params_to_torch(params, key_map=key_map)
    # .copy(): jax->numpy leaves are read-only views; torch wants
    # writable buffers (warns otherwise)
    torch.save(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()}, args.pth
    )
    n = sum(int(np.prod(v.shape)) for v in sd.values())
    print(f"wrote {args.pth}: {len(sd)} tensors, {n / 1e6:.2f} M params "
          f"(stage {args.stage}{', EMA' if args.use_ema else ''})")


if __name__ == "__main__":
    main()
