#!/usr/bin/env python
"""Generate a KITTI-shaped PNG fixture corpus for disk-fed pipeline
measurement and integration testing (BASELINE config 3; VERDICT r3
missing item 2: "loader -> wire -> H2D -> decode -> augment -> step"
as ONE measured pipeline, not composed numbers).

No real KITTI exists in this environment (SURVEY.md §0), so this
fabricates structurally-faithful stand-ins:

- RGB: 8-bit PNG at train resolution (smooth low-frequency fields +
  noise — compresses like natural images rather than pathological
  flat/random extremes).
- Depth: 16-bit PNG in the KITTI depth-annotation convention
  (value/256 m, 0 = invalid), LiDAR-like sparse rows (~8% density)
  so decode cost and mask statistics resemble the real corpus.
- ``train.txt``: "<rgb> <depth>" lines relative to the output root,
  the exact layout data/kitti.py::KittiTrainDataset consumes.

Usage:
  python scripts/make_fixture.py --out /tmp/kitti_fixture --n 1500
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _smooth_field(rng: np.random.RandomState, h: int, w: int, octaves: int = 3):
    """Cheap multi-octave smooth noise in [0, 1] via bilinear-upsampled
    coarse grids (PIL does the upsampling — no scipy dependency)."""
    from PIL import Image

    acc = np.zeros((h, w), np.float32)
    amp = 1.0
    for o in range(octaves):
        ch, cw = max(2, h >> (4 - o)), max(2, w >> (4 - o))
        coarse = rng.uniform(0, 1, (ch, cw)).astype(np.float32)
        img = Image.fromarray(coarse, mode="F").resize((w, h), Image.BILINEAR)
        acc += amp * np.asarray(img, np.float32)
        amp *= 0.5
    acc -= acc.min()
    return acc / max(acc.max(), 1e-6)


def make_sample(rng: np.random.RandomState, h: int, w: int, max_depth: float):
    from PIL import Image

    rgb = np.stack(
        [_smooth_field(rng, h, w) for _ in range(3)], axis=-1
    )
    rgb = np.clip(rgb + rng.normal(0, 0.03, rgb.shape), 0, 1)
    rgb_u8 = (rgb * 255).astype(np.uint8)

    # Depth: smooth surface scaled to (1, max_depth), sparsified to
    # LiDAR-like horizontal scanline bands (~8% valid).
    depth = 1.0 + (max_depth - 2.0) * _smooth_field(rng, h, w)
    valid = np.zeros((h, w), bool)
    rows = rng.choice(np.arange(h // 3, h), size=max(1, h // 6), replace=False)
    for r in rows:
        cols = rng.uniform(size=w) < 0.5
        valid[r, cols] = True
    depth16 = np.where(valid, np.round(depth * 256.0), 0).astype(np.uint16)
    return Image.fromarray(rgb_u8), Image.fromarray(depth16, mode="I;16")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=1500)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=416)
    p.add_argument("--max_depth", type=float, default=80.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--val_n", type=int, default=0,
                   help="also emit a val.txt with this many pairs")
    args = p.parse_args()

    rng = np.random.RandomState(args.seed)
    os.makedirs(os.path.join(args.out, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "depth"), exist_ok=True)

    def emit(list_name: str, count: int, offset: int):
        lines = []
        for i in range(offset, offset + count):
            rgb, dep = make_sample(rng, args.height, args.width, args.max_depth)
            rp, dp = f"rgb/{i:06d}.png", f"depth/{i:06d}.png"
            rgb.save(os.path.join(args.out, rp))
            dep.save(os.path.join(args.out, dp))
            lines.append(f"{rp} {dp}")
            if (i + 1 - offset) % 200 == 0:
                print(f"{list_name}: {i + 1 - offset}/{count}")
        with open(os.path.join(args.out, list_name), "w") as f:
            f.write("\n".join(lines) + "\n")

    emit("train.txt", args.n, 0)
    if args.val_n:
        emit("val.txt", args.val_n, args.n)
    print(f"wrote {args.n}+{args.val_n} pairs under {args.out}")


if __name__ == "__main__":
    main()
