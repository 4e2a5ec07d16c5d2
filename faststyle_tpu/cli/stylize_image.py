#!/usr/bin/env python3
"""Stylize a single image with a trained transform net.

Flag-compatible with the reference CLI (`/root/reference/stylize_image.py:19-43`),
with the same defaults. `--model_path` accepts either a TF1 checkpoint prefix
(the reference's shipped models, converted on the fly with no TF dependency)
or this framework's native `.npz` weights.
"""

import argparse
from pathlib import Path



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
    parser.add_argument(
        "--input_dir",
        default=None,
        help="Stylize every image in a directory instead of one file; same-size "
        "images are batched and sharded across all available chips.",
    )
    parser.add_argument(
        "--output_dir",
        default="./results",
        help="Output directory for --input_dir mode.",
    )
    parser.add_argument(
        "--batch_size",
        default=8,
        type=int,
        help="Max images per device batch in --input_dir mode.",
    )
    parser.add_argument(
        "--spatial",
        action="store_true",
        help="Shard ONE giant image's rows across all chips "
        "(parallel.spatial; both 'resize' and 'deconv' models). Requires "
        "multiple devices to help; auto-falls back to single-device for "
        "misaligned heights.",
    )
    return parser


def stylize_directory(args, compute_dtype):
    """Batch mode: group same-shaped images, shard each batch over the mesh
    (parallel.ShardedStylizer — BASELINE config #5's batched inference)."""
    import numpy as np

    from faststyle_tpu.inference import load_params
    from faststyle_tpu.parallel import data_parallel, mesh as mesh_lib
    from faststyle_tpu.utils import image_io

    in_dir, out_dir = Path(args.input_dir), Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(
        p for p in in_dir.iterdir() if p.suffix.lower() in {".jpg", ".jpeg", ".png"}
    )
    if not files:
        raise SystemExit(f"no images in {in_dir}")

    params = load_params(args.model_path)
    mesh = mesh_lib.data_mesh()
    stylizer = data_parallel.ShardedStylizer(
        params,
        mesh,
        upsample_method=args.upsample_method,
        compute_dtype=compute_dtype,
        output_uint8=True,  # on-device clip+cast: 4x smaller result fetches
    )

    def probe_shape(path: Path):
        # header-only size read (PIL decodes lazily) so grouping a huge
        # directory doesn't hold every DECODED frame in memory at once —
        # decode happens per batch chunk below, capping memory at one batch
        import PIL.Image

        with PIL.Image.open(path) as im:
            w0, h0 = im.size
        s = args.content_target_resize
        if s != 1.0:
            h0, w0 = round(h0 * s), round(w0 * s)
        return (h0, w0, 3)

    def load(path: Path):
        return image_io.imresize(image_io.imread(path), args.content_target_resize)

    by_shape = {}
    try:
        for f in files:
            by_shape.setdefault(probe_shape(f), []).append(f)
    except ImportError:  # no PIL: decode-probe, still streaming per chunk
        by_shape = {}
        for f in files:
            by_shape.setdefault(load(f).shape, []).append(f)
    done = 0
    for shape, paths in by_shape.items():
        for i in range(0, len(paths), args.batch_size):
            chunk = paths[i : i + args.batch_size]
            batch = np.stack([load(f) for f in chunk]).astype(np.float32)
            if batch.shape[1:] != tuple(shape):  # probe/decode disagreement
                raise SystemExit(
                    f"{chunk[0]}: decoded shape {batch.shape[1:]} != probed {shape}"
                )
            out = stylizer.stylize_batch(batch)
            for f, img_out in zip(chunk, out):
                image_io.imwrite(out_dir / f"styled_{f.name}", img_out)
                done += 1
            print(f"{done}/{len(files)} done ({shape[1]}x{shape[0]})")


def main():
    args = setup_parser().parse_args()

    import jax.numpy as jnp

    from faststyle_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from faststyle_tpu.inference import Stylizer
    from faststyle_tpu.utils import image_io

    dtype = jnp.bfloat16 if args.precision == "bfloat16" else None
    if args.input_dir:
        if args.spatial:
            raise SystemExit(
                "--spatial shards ONE image's rows; with --input_dir use the "
                "default batch-sharded mode (images spread across chips)"
            )
        stylize_directory(args, dtype)
        return

    img = image_io.imread(args.input_img_path)
    img = image_io.imresize(img, args.content_target_resize)

    if args.spatial:
        import numpy as np

        from faststyle_tpu.inference import load_params
        from faststyle_tpu.parallel import mesh as mesh_lib
        from faststyle_tpu.parallel.spatial import SpatialStylizer

        stylizer = SpatialStylizer(
            load_params(args.model_path),
            mesh_lib.data_mesh(),
            compute_dtype=dtype,
            upsample_method=args.upsample_method,
        )
        n = stylizer.shards_for(img.shape[0])
        print(f"Evaluating ({n}-way row sharding)...")
        out = np.clip(stylizer(img), 0, 255).astype(np.uint8)
    else:
        stylizer = Stylizer(
            model_path=args.model_path,
            upsample_method=args.upsample_method,
            compute_dtype=dtype,
        )
        print("Evaluating...")
        out = stylizer(img)
    print("Saving image.")
    Path(args.output_img_path).parent.mkdir(parents=True, exist_ok=True)
    image_io.imwrite(args.output_img_path, out)
    print("Done.")


if __name__ == "__main__":
    main()
