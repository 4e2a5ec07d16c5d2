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

# The reference ships no deconv checkpoint, so the deconv oracle's net is
# MANUFACTURED here: a fresh `init_params(rng, 'deconv')` committed as
# tests/assets/deconv_oracle_net.npz, exported to the reference's literal
# checkpoint format (compat.tf1_checkpoint), restored in the reference's
# `create_net(X, 'deconv')` graph (/root/reference/im_transf_net.py:57-63),
# and run on the test inputs. This pins full-net JAX-vs-TF parity for the
# deconv code path (tests/test_transform_net.py::test_golden_parity_deconv).
DECONV_NET = "deconv_oracle_net.npz"
DECONV_ORACLES = [
    # (oracle filename, input asset, crop (h, w) or None for native)
    ("deconv_crop256_tf_oracle.png", "chicago_crop256.png", None),
    ("deconv_ragged_tf_oracle.png", "chicago_crop256.png", (250, 243)),
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

    def run_reference_net(ckpt_prefix: str, x4: np.ndarray, method: str) -> np.ndarray:
        tf.reset_default_graph()
        with tf.variable_scope("img_t_net"):
            X = tf.placeholder(tf.float32, shape=x4.shape, name="input")
            Y = im_transf_net.create_net(X, method)
        saver = tf.train.Saver()
        with tf.Session() as sess:
            saver.restore(sess, ckpt_prefix)
            return sess.run(Y, feed_dict={X: x4})

    for oracle_name, model, input_name in ORACLES:
        img = image_io.imread(ASSETS / input_name).astype(np.float32)
        out = run_reference_net(
            str(args.reference / "models" / f"{model}_final.ckpt"), img[None], "resize"
        )
        # round-to-nearest (image_io.imwrite would truncate the float cast)
        out_img = np.rint(np.squeeze(out, axis=0))
        dest = args.out_dir / oracle_name
        image_io.imwrite(dest, out_img)
        print(f"[oracle] {input_name} --{model}--> {dest}  shape={out_img.shape}")

    # --- deconv oracles: manufactured net through the literal deconv graph ---
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")  # don't contend for the TPU
    from faststyle_tpu.compat import tf1_checkpoint
    from faststyle_tpu.inference import load_params, save_params
    from faststyle_tpu.models import transform_net

    net_path = ASSETS / DECONV_NET
    if net_path.exists():
        params = load_params(net_path)
    else:
        params = transform_net.init_params(jax.random.PRNGKey(7), "deconv")
        params = jax.tree.map(np.asarray, params)
        save_params(net_path, params)
        print(f"[oracle] manufactured fresh deconv net -> {net_path}")
    with tempfile.TemporaryDirectory() as td:
        prefix = str(Path(td) / "deconv_oracle.ckpt")
        tf1_checkpoint.save_transform_net_params(params, prefix)
        for oracle_name, input_name, crop in DECONV_ORACLES:
            img = image_io.imread(ASSETS / input_name).astype(np.float32)
            if crop is not None:
                img = img[: crop[0], : crop[1]]
            out = run_reference_net(prefix, img[None], "deconv")
            out_img = np.rint(np.squeeze(out, axis=0))
            dest = args.out_dir / oracle_name
            image_io.imwrite(dest, out_img)
            print(f"[oracle] {input_name}{crop or ''} --deconv--> {dest}  shape={out_img.shape}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
