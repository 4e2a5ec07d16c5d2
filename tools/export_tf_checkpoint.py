#!/usr/bin/env python3
"""Export a transform-net model to the reference's TF1 checkpoint format.

Models trained by this framework (`models/<name>_final.npz`) become
`<out>.index` + `<out>.data-00000-of-00001` bundles that the reference's
TF1 stack restores unchanged (`/root/reference/stylize_image.py:62-64`,
`Saver.restore`) — the inverse of the no-TF reader that imports the
reference's shipped checkpoints. No TensorFlow needed to write; validated
against `tf.train.load_checkpoint` in tests/test_tf1_checkpoint.py.

Usage:
  python tools/export_tf_checkpoint.py models/starry_distilled.npz \
      /tmp/export/starry_distilled.ckpt
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from faststyle_tpu.compat import tf1_checkpoint  # noqa: E402
from faststyle_tpu.inference import load_params  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("model", help="source model (.npz or TF1 ckpt prefix)")
    ap.add_argument("out", help="output checkpoint prefix (e.g. out/starry.ckpt)")
    ap.add_argument("--scope", default="img_t_net")
    args = ap.parse_args()

    params = load_params(args.model)
    tf1_checkpoint.save_transform_net_params(params, args.out, scope=args.scope)
    n = sum(len(s) for s in params.values())
    print(f"wrote {n} variables to {args.out}.{{index,data-00000-of-00001}}")


if __name__ == "__main__":
    main()
