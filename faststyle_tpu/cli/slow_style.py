#!/usr/bin/env python3
"""Gatys-style direct pixel optimization (VGG16 variant).

Flag-compatible with the reference (`/root/reference/slow_style.py:17-67`),
same defaults (Adam lr 1e1, 500 steps, beta 1e-4). The optimization runs as a
jitted on-device scan instead of per-step Session.runs.
"""

import argparse
from pathlib import Path



def setup_parser():
    parser = argparse.ArgumentParser(description="Train a style transfer net.")
    parser.add_argument("--style_img_path", help="Path to style template image.")
    parser.add_argument("--cont_img_path", help="Path to content template image.")
    parser.add_argument("--learn_rate", default=1e1, type=float)
    parser.add_argument("--loss_content_layers", nargs="*", default=["conv3_3"])
    parser.add_argument(
        "--loss_style_layers",
        nargs="*",
        default=["conv1_2", "conv2_2", "conv3_3", "conv4_3"],
    )
    parser.add_argument("--content_weights", nargs="*", default=[1.0], type=float)
    parser.add_argument(
        "--style_weights", nargs="*", default=[5.0, 5.0, 5.0, 5.0], type=float
    )
    parser.add_argument("--num_steps_break", default=500, type=int)
    parser.add_argument("--beta", default=1e-4, type=float)
    parser.add_argument("--style_target_resize", default=1.0, type=float)
    parser.add_argument("--cont_target_resize", default=1.0, type=float)
    parser.add_argument("--output_img_path", default="./out.jpg")
    # --- TPU-native extensions ---
    parser.add_argument("--vgg_path", default="libs/vgg16_weights.npz")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument(
        "--precision",
        choices=["float32", "bfloat16"],
        default="float32",
        help="VGG compute precision (pixels always optimize in float32).",
    )
    return parser


def main():
    args = setup_parser().parse_args()

    from faststyle_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from faststyle_tpu.models import vgg16
    from faststyle_tpu.training import slow_style
    from faststyle_tpu.utils import image_io

    vgg_file = Path(args.vgg_path)
    if not vgg_file.exists():
        raise SystemExit(
            f"VGG16 weights not found at {vgg_file}. Download vgg16_weights.npz "
            "and pass --vgg_path."
        )
    vgg_params = vgg16.load_npz(vgg_file)

    style_img = image_io.imread(args.style_img_path)
    style_img = image_io.imresize(style_img, args.style_target_resize).astype("float32")
    cont_img = image_io.imread(args.cont_img_path)
    cont_img = image_io.imresize(cont_img, args.cont_target_resize).astype("float32")

    if len(args.loss_content_layers) != len(args.content_weights):
        raise SystemExit("--loss_content_layers and --content_weights lengths differ")
    if len(args.loss_style_layers) != len(args.style_weights):
        raise SystemExit("--loss_style_layers and --style_weights lengths differ")

    import jax.numpy as jnp

    out = slow_style.optimize(
        vgg_params,
        cont_img,
        style_img,
        content_weights=dict(zip(args.loss_content_layers, args.content_weights)),
        style_weights=dict(zip(args.loss_style_layers, args.style_weights)),
        beta=args.beta,
        learn_rate=args.learn_rate,
        num_steps=args.num_steps_break,
        seed=args.seed,
        log_fn=lambda step, loss: print(step, loss),
        compute_dtype=jnp.bfloat16 if args.precision == "bfloat16" else None,
    )
    image_io.imwrite(args.output_img_path, out)
    print(f"Saved {args.output_img_path}")


if __name__ == "__main__":
    main()
