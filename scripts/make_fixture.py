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


def make_sample_scene(rng, h: int, w: int, max_depth: float):
    """Depth-CORRELATED sample (``--style scene``): the numpy twin of
    data/synthetic.synthetic_batch — a road-like vertical depth
    gradient with frontal box obstacles, RGB rendered FROM the depth
    (inverse shading + horizontal position + noise).  Use this style
    when the corpus must be LEARNABLE end-to-end (stage-2 RGB->depth
    has signal to regress); the "field" style's RGB is independent of
    its depth by construction (pipeline-cost fixture only — a
    round-5 journey run measured stage-2 a1 plateau at ~0.47 on it,
    the scene-prior ceiling)."""
    from PIL import Image

    rows = np.linspace(1.0, 0.12, h).reshape(h, 1)
    base = rows * max_depth * rng.uniform(0.6, 1.0)
    yy = np.linspace(0.0, 1.0, h).reshape(h, 1)
    xx = np.linspace(0.0, 1.0, w).reshape(1, w)
    depth = base * np.ones((h, w), np.float32)
    for _ in range(6):
        cy, cx = rng.uniform(0.2, 0.9), rng.uniform(0.05, 0.95)
        sz, bd = rng.uniform(0.04, 0.18), rng.uniform(0.05, 0.7)
        inside = (np.abs(yy - cy) < sz) & (np.abs(xx - cx) < sz * 1.5)
        depth = np.where(inside, np.minimum(depth, bd * max_depth), depth)
    depth = np.clip(depth, 0.5, max_depth).astype(np.float32)

    nd = depth / max_depth
    shade = 1.0 / (0.25 + 0.75 * nd)
    shade = shade / shade.max()
    tex = 0.1 * rng.standard_normal((h, w)).astype(np.float32)
    r = np.clip(shade + tex, 0, 1)
    g = np.clip(0.8 * (1.0 - nd) + 0.2 * xx + tex, 0, 1)
    b = np.clip(0.3 + 0.5 * nd + tex, 0, 1)
    rgb_u8 = (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)

    # same LiDAR-like sparse scanline GT encoding as the field style
    valid = np.zeros((h, w), bool)
    rows_i = rng.choice(np.arange(h // 3, h), size=max(1, h // 6), replace=False)
    for rr in rows_i:
        cols = rng.uniform(size=w) < 0.5
        valid[rr, cols] = True
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
    p.add_argument("--style", choices=["field", "scene"], default="field",
                   help="field: independent smooth RGB/depth fields "
                        "(pipeline-cost fixture; RGB carries NO depth "
                        "signal). scene: depth-correlated RGB (numpy "
                        "twin of data/synthetic.py) — learnable "
                        "end-to-end")
    args = p.parse_args()

    rng = np.random.RandomState(args.seed)
    os.makedirs(os.path.join(args.out, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "depth"), exist_ok=True)

    def emit(list_name: str, count: int, offset: int):
        lines = []
        for i in range(offset, offset + count):
            maker = make_sample_scene if args.style == "scene" else make_sample
            rgb, dep = maker(rng, args.height, args.width, args.max_depth)
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
