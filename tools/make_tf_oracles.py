#!/usr/bin/env python3
"""Regenerate the TF-oracle golden PNGs in tests/assets/.

Runs the LITERAL reference network (/root/reference/im_transf_net.py, TF1
code) under `tf.compat.v1` with the shipped reference checkpoints, on the
repo's test inputs, and writes lossless PNGs. These are the ground truth for
the SSIM >= 0.99 parity gates (tests/test_transform_net.py): the reference's
shipped 2017 JPEGs (results/*.jpg) cap at ~0.86 SSIM even against an exact TF
re-run, purely from JPEG re-encode loss (docs/PERF.md), so the parity gate
compares against these lossless oracles instead.

Usage:  python3 tools/make_tf_oracles.py [--reference /root/reference]

After a regen run, `git diff --stat tests/assets/` should be clean
(pixel-identical regeneration; PNG bytes match for the same cv2 encoder).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

# oneDNN varies float summation order run-to-run; disable it so oracle
# regeneration is bit-deterministic (must be set before TF import)
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

REPO = Path(__file__).resolve().parent.parent
ASSETS = REPO / "tests" / "assets"

# (oracle filename, model, input asset) — the input is fed at its native size,
# exactly like the reference's stylize_image.py:59-65 with resize factor 1.0
ORACLES = [
    ("starry_crop256_tf_oracle.png", "starry", "chicago_crop256.png"),
    ("candy_crop256_tf_oracle.png", "candy", "chicago_crop256.png"),
    ("starry_512_tf_oracle.png", "starry", "chicago_512.png"),
    ("starry_chicago_tf_oracle.png", "starry", "chicago.jpg"),
    ("candy_chicago_tf_oracle.png", "candy", "chicago.jpg"),
]


def _import_reference_net(reference: Path):
    """Import the reference's im_transf_net with TF1 semantics under TF2.

    The reference does `import tensorflow as tf` and uses the TF1 API
    (placeholders, tf.nn.moments(keep_dims=...), resize_images); aliasing
    sys.modules['tensorflow'] to tf.compat.v1 before the import gives it
    the API surface it was written against (mirrors stylize_image.py:46-82).
    """
    import tensorflow.compat.v1 as tf

    tf.disable_v2_behavior()
    sys.modules["tensorflow"] = tf
    sys.path.insert(0, str(reference))
    import im_transf_net  # noqa: E402  (reference module, TF1)

    return tf, im_transf_net


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", default="/root/reference", type=Path)
    ap.add_argument(
        "--out_dir", default=ASSETS, type=Path, help="where to write the oracle PNGs"
    )
    args = ap.parse_args()

    import numpy as np

    sys.path.insert(0, str(REPO))
    from faststyle_tpu.utils import image_io

    args.out_dir.mkdir(parents=True, exist_ok=True)
    tf, im_transf_net = _import_reference_net(args.reference)

    for oracle_name, model, input_name in ORACLES:
        img = image_io.imread(ASSETS / input_name).astype(np.float32)
        x4 = img[None]
        tf.reset_default_graph()
        with tf.variable_scope("img_t_net"):
            X = tf.placeholder(tf.float32, shape=x4.shape, name="input")
            Y = im_transf_net.create_net(X, "resize")
        saver = tf.train.Saver()
        with tf.Session() as sess:
            saver.restore(sess, str(args.reference / "models" / f"{model}_final.ckpt"))
            out = sess.run(Y, feed_dict={X: x4})
        # round-to-nearest (image_io.imwrite would truncate the float cast)
        out_img = np.rint(np.squeeze(out, axis=0))
        dest = args.out_dir / oracle_name
        image_io.imwrite(dest, out_img)
        print(f"[oracle] {input_name} --{model}--> {dest}  shape={out_img.shape}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
