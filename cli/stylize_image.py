#!/usr/bin/env python3
"""Stylize a single image with a trained transform net.

Flag-compatible with the reference CLI (`/root/reference/stylize_image.py:19-43`),
with the same defaults. `--model_path` accepts either a TF1 checkpoint prefix
(the reference's shipped models, converted on the fly with no TF dependency)
or this framework's native `.npz` weights.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def setup_parser():
    parser = argparse.ArgumentParser(
        description="Use a trained fast style transfer model to filter an "
        "input image, and save to an output image."
    )
    parser.add_argument("--input_img_path", help="Input content image that will be stylized.")
    parser.add_argument(
        "--output_img_path", help="Desired output image path.", default="./results/styled.jpg"
    )
    parser.add_argument(
        "--model_path",
        default="./models/starry_final.ckpt",
        help="Path to .ckpt (TF1) or .npz (native) for the trained model.",
    )
    parser.add_argument(
        "--content_target_resize",
        help="Resize input content image. Useful if having OOM issues.",
        default=1.0,
        type=float,
    )
    parser.add_argument(
        "--upsample_method",
        help="The upsample method that was used to construct the model being loaded.",
        choices=["resize", "deconv"],
        default="resize",
    )
    parser.add_argument(
        "--precision",
        help="Compute precision for the conv stack (bfloat16 is MXU-native and ~visually identical).",
        choices=["float32", "bfloat16"],
        default="float32",
    )
    return parser


def main():
    args = setup_parser().parse_args()

    import jax.numpy as jnp

    from faststyle_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from faststyle_tpu.inference import Stylizer
    from faststyle_tpu.utils import image_io

    img = image_io.imread(args.input_img_path)
    img = image_io.imresize(img, args.content_target_resize)

    stylizer = Stylizer(
        model_path=args.model_path,
        upsample_method=args.upsample_method,
        compute_dtype=jnp.bfloat16 if args.precision == "bfloat16" else None,
    )
    print("Evaluating...")
    out = stylizer(img)
    print("Saving image.")
    Path(args.output_img_path).parent.mkdir(parents=True, exist_ok=True)
    image_io.imwrite(args.output_img_path, out)
    print("Done.")


if __name__ == "__main__":
    main()
