#!/usr/bin/env python3
"""Convert a flat directory of JPEG/PNG images into sharded TFRecords.

Flag-compatible with the reference converter
(`/root/reference/tfrecords_writer.py:65-75`): same flag names, defaults,
shard naming, Example schema, deterministic shuffle (seed 12345), and the
`train_shards % num_threads == 0` requirement — with no TensorFlow
dependency (native C++ record codec + cv2 decode).
"""

import argparse



def setup_parser():
    parser = argparse.ArgumentParser(description="Convert images to sharded TFRecords.")
    parser.add_argument(
        "--train_directory", default="/tmp/", help="Training data directory"
    )
    parser.add_argument(
        "--output_directory", default="/tmp/", help="Output data directory"
    )
    parser.add_argument(
        "--train_shards", default=2, type=int, help="Number of shards in training TFRecord files."
    )
    parser.add_argument(
        "--num_threads", default=2, type=int, help="Number of threads to preprocess the images."
    )
    return parser


def main():
    args = setup_parser().parse_args()
    from faststyle_tpu.data import writer

    writer.write_dataset(
        args.train_directory,
        args.output_directory,
        name="train",
        num_shards=args.train_shards,
        num_threads=args.num_threads,
    )


if __name__ == "__main__":
    main()
