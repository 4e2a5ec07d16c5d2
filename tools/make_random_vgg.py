#!/usr/bin/env python3
"""Write a random-init VGG16 in Frossard's npz key format.

Stand-in for `scripts/get_vgg16_weights.sh` in zero-egress sandboxes: lets
`cli/train.py` / `cli/slow_style.py` run end-to-end (pipeline, losses,
optimizer, checkpoints). Perceptual losses over RANDOM features still define
a valid, decreasing objective — useful to validate the training machinery —
but the stylization quality of the reference recipe needs the pretrained
weights (see docs/TRAINED_MODEL.md).

Usage: python tools/make_random_vgg.py [out.npz] [--seed 0]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # host-side prep; don't grab the TPU

from faststyle_tpu.models import vgg16  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="libs/vgg16_weights_random.npz")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    params = vgg16.init_params(jax.random.PRNGKey(args.seed))
    flat = {}
    for name, group in params.items():
        flat[f"{name}_W"] = np.asarray(group["W"])
        flat[f"{name}_b"] = np.asarray(group["b"])
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **flat)
    vgg16.load_npz(out)  # round-trip sanity
    print(f"wrote random-init VGG16 ({len(flat)} arrays) to {out}")


if __name__ == "__main__":
    main()
