#!/usr/bin/env python
"""Import reference-style torch ``.pth`` weights into a gdn-tpu orbax
checkpoint (SURVEY.md §2.9: the reference distributes pretrained
state_dicts; this is the migration path for its users).

torch is used here for DESERIALIZATION ONLY — the compute path stays
jax (the repo's torch-confined-to-oracles policy covers tests; this is
an offline converter).

The real reference layer names are unrecoverable in this environment
(SURVEY.md §0), so the key mapping is supplied as a JSON file of
{"flax/leaf/path": "torch.key"} overrides on top of the default
dots-for-slashes rule (checkpoint.params_from_torch).

Example:
  python scripts/import_torch.py --pth dtod.pth --stage 1 \
      --model_dir checkpoints --key_map map.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    from gdn_tpu.cli import add_common_args, apply_platform, build_config

    add_common_args(p)
    p.add_argument("--pth", required=True, help="torch state_dict file")
    p.add_argument("--stage", choices=["1", "2"], default="1")
    p.add_argument("--key_map", default="", help="JSON path-override map")
    p.add_argument("--partial", action="store_true",
                   help="allow missing keys (template values kept)")
    args = p.parse_args()
    apply_platform(args)
    cfg = build_config(args)

    import torch  # deserialization only

    from gdn_tpu import checkpoint as ckpt
    from gdn_tpu.models import DtoDNet, RtoDNet
    from gdn_tpu.train import create_state

    sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):
        raise SystemExit("expected a state_dict (dict of tensors)")
    # unwrap common containers: {'state_dict': ...}, DataParallel 'module.'
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    key_map = json.load(open(args.key_map)) if args.key_map else None
    h, w = cfg.model.image_size
    if args.stage == "1":
        state = create_state(DtoDNet(cfg=cfg.model), (1, h, w, 1),
                             cfg.train, 1)
    else:
        state = create_state(RtoDNet(cfg=cfg.model), (1, h, w, 3),
                             cfg.train, 1)
    params = ckpt.params_from_torch(
        state.params, sd, key_map=key_map, strict=not args.partial
    )
    out_dir = f"{cfg.train.ckpt_dir}/stage{args.stage}"
    ckpt.save_checkpoint(out_dir, 0, state.replace(params=params))
    print(f"imported {len(sd)} torch tensors -> {out_dir} (step 0)")


if __name__ == "__main__":
    main()
