#!/usr/bin/env python
"""Generate `<rgb> <depth>` pair list files from common on-disk layouts
(the glue between raw dataset downloads and the loaders' list-file
contract; the reference ships such lists pre-made).

Supported layouts:
  kitti_depth   KITTI depth-annotated: <root>/<split>/<drive>/proj_depth/
                groundtruth/image_02/*.png paired with raw images at
                <raw>/<date>/<drive>/image_02/data/*.png
  paired_dirs   two parallel directories with matching file stems:
                --rgb_dir and --depth_dir

Examples:
  python scripts/make_lists.py paired_dirs --rgb_dir rgb/ --depth_dir depth/ \
      --data_path /data/mine --output train.txt
  python scripts/make_lists.py kitti_depth --data_path /data/kitti \
      --raw_subdir raw --depth_subdir data_depth_annotated/train --output train.txt
"""

import argparse
import os
import sys


IMAGE_EXTS = (".png", ".jpg", ".jpeg")


def paired_dirs(args) -> list:
    rgb_dir = os.path.join(args.data_path, args.rgb_dir)
    depth_dir = os.path.join(args.data_path, args.depth_dir)
    depth_by_stem = {}
    for f in sorted(os.listdir(depth_dir)):
        stem = os.path.splitext(f)[0]
        if f.lower().endswith(IMAGE_EXTS + (".npy",)):
            depth_by_stem.setdefault(stem, f)
    pairs = []
    for f in sorted(os.listdir(rgb_dir)):
        if not f.lower().endswith(IMAGE_EXTS):
            continue
        stem = os.path.splitext(f)[0]
        # accept depth stems like "<stem>", "<stem>_d", "<stem>_depth"
        for cand in (stem, stem + "_d", stem + "_depth"):
            if cand in depth_by_stem:
                pairs.append(
                    f"{args.rgb_dir}/{f} {args.depth_dir}/{depth_by_stem[cand]}"
                )
                break
    return pairs


def kitti_depth(args) -> list:
    """Pair depth-annotated GT pngs with raw camera-2 frames."""
    depth_root = os.path.join(args.data_path, args.depth_subdir)
    raw_root = os.path.join(args.data_path, args.raw_subdir)
    pairs = []
    for drive in sorted(os.listdir(depth_root)):
        gt_dir = os.path.join(
            depth_root, drive, "proj_depth", "groundtruth", "image_02"
        )
        if not os.path.isdir(gt_dir):
            continue
        date = drive[:10]  # e.g. 2011_09_26 from 2011_09_26_drive_0001_sync
        img_dir = os.path.join(raw_root, date, drive, "image_02", "data")
        if not os.path.isdir(img_dir):
            print(f"warning: no raw images for {drive}", file=sys.stderr)
            continue
        for f in sorted(os.listdir(gt_dir)):
            img = os.path.join(img_dir, f)
            if os.path.exists(img):
                pairs.append(
                    os.path.relpath(img, args.data_path)
                    + " "
                    + os.path.relpath(os.path.join(gt_dir, f), args.data_path)
                )
    return pairs


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("layout", choices=["kitti_depth", "paired_dirs"])
    p.add_argument("--data_path", required=True)
    p.add_argument("--output", default="train.txt")
    p.add_argument("--rgb_dir", default="rgb")
    p.add_argument("--depth_dir", default="depth")
    p.add_argument("--raw_subdir", default="raw")
    p.add_argument("--depth_subdir", default="data_depth_annotated/train")
    p.add_argument("--val_fraction", type=float, default=0.0,
                   help="also write a val list with this fraction of pairs")
    args = p.parse_args()

    pairs = {"kitti_depth": kitti_depth, "paired_dirs": paired_dirs}[args.layout](args)
    if not pairs:
        print("no pairs found", file=sys.stderr)
        sys.exit(1)
    out = os.path.join(args.data_path, args.output)
    if args.val_fraction > 0:
        n_val = max(1, int(len(pairs) * args.val_fraction))
        val, train = pairs[:n_val], pairs[n_val:]
        with open(out, "w") as f:
            f.write("\n".join(train) + "\n")
        val_out = out.replace("train", "val") if "train" in out else out + ".val"
        with open(val_out, "w") as f:
            f.write("\n".join(val) + "\n")
        print(f"wrote {len(train)} -> {out}, {len(val)} -> {val_out}")
    else:
        with open(out, "w") as f:
            f.write("\n".join(pairs) + "\n")
        print(f"wrote {len(pairs)} pairs -> {out}")


if __name__ == "__main__":
    main()
