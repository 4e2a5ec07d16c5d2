#!/usr/bin/env python3
"""Generate a deterministic local training-image set (no-network fallback).

The reference trains on MS-COCO (~118K JPEGs, README.md:42-49). This sandbox
has zero egress (scripts/get_vgg16_weights.sh and any dataset download fail
at DNS), so training validation uses a synthetic-but-diverse corpus built
from the repo's shipped photos/paintings plus procedural textures:

  - random crops / flips / rotations / color jitters of tests/assets
    photos and style_images paintings (chicago is EXCLUDED by default so it
    can serve as a held-out validation content image);
  - procedural images: smooth random gradients, band-limited noise, random
    rectangles/ellipses — broad coverage of low/high-frequency content.

Usage: python tools/make_training_images.py OUTDIR [--num 400] [--size 256]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from faststyle_tpu.utils import image_io  # noqa: E402


def _crop_aug(rng: np.random.Generator, img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    scale = rng.uniform(0.4, 1.0)
    ch = max(size // 4, int(min(h, w) * scale))
    y = rng.integers(0, max(1, h - ch))
    x = rng.integers(0, max(1, w - ch))
    crop = img[y : y + ch, x : x + ch]
    crop = image_io.resize_to(crop, size, size)
    if rng.random() < 0.5:
        crop = crop[:, ::-1]
    k = int(rng.integers(0, 4))
    crop = np.rot90(crop, k)
    gain = rng.uniform(0.6, 1.3, size=(1, 1, 3))
    bias = rng.uniform(-25, 25, size=(1, 1, 3))
    return np.clip(crop.astype(np.float32) * gain + bias, 0, 255)


def _procedural(rng: np.random.Generator, size: int) -> np.ndarray:
    kind = rng.integers(0, 3)
    if kind == 0:  # smooth gradient mixture
        yy, xx = np.mgrid[0:size, 0:size] / size
        img = np.zeros((size, size, 3), np.float32)
        for _ in range(3):
            a, b, c = rng.uniform(-1, 1, 3)
            phase = rng.uniform(0, 2 * np.pi)
            wave = np.sin(2 * np.pi * (a * yy + b * xx) * rng.uniform(0.5, 3) + phase)
            img += c * wave[..., None] * rng.uniform(0, 1, (1, 1, 3))
        return np.clip((img - img.min()) / (np.ptp(img) + 1e-6) * 255, 0, 255)
    if kind == 1:  # band-limited noise (upsampled coarse noise)
        coarse = rng.integers(4, 64)
        img = rng.uniform(0, 255, (coarse, coarse, 3)).astype(np.float32)
        return image_io.resize_to(img, size, size).astype(np.float32)
    img = np.full((size, size, 3), rng.uniform(0, 255, 3), np.float32)  # shapes
    for _ in range(rng.integers(3, 12)):
        color = rng.uniform(0, 255, 3)
        y0, x0 = rng.integers(0, size, 2)
        hh, ww = rng.integers(size // 16, size // 2, 2)
        img[y0 : y0 + hh, x0 : x0 + ww] = color
    return img


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--num", type=int, default=400)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--include_chicago",
        action="store_true",
        help="include the held-out validation photo in the corpus",
    )
    args = ap.parse_args()

    sources = [REPO / "tests/assets/candy.jpg", REPO / "tests/assets/starry_night_crop.jpg"]
    if args.include_chicago:
        sources.append(REPO / "tests/assets/chicago.jpg")
    imgs = [image_io.imread(p).astype(np.float32) for p in sources]

    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.num):
        if rng.random() < 0.6:
            img = _crop_aug(rng, imgs[int(rng.integers(0, len(imgs)))], args.size)
        else:
            img = _procedural(rng, args.size)
        # imwrite clips float input to [0,255]; a pre-cast .astype(np.uint8)
        # would WRAP cubic-resize overshoot (e.g. -12 -> 244) into speckles
        image_io.imwrite(out / f"img_{i:05d}.jpg", img)
    print(f"wrote {args.num} images to {out}")


if __name__ == "__main__":
    main()
