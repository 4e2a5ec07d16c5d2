"""Offline dataset converter: directory of JPEG/PNG -> sharded TFRecords.

Behavioral contract from the reference converter
(`/root/reference/tfrecords_writer.py`):
  * flat input directory of *.jpg/*.jpeg/*.png (reference :294-304)
  * deterministic shuffle with seed 12345 (:306-312)
  * `train_shards % num_threads == 0` (:332)
  * PNGs re-encoded to JPEG (:171-174); non-3-channel images rejected
  * shard naming `<name>-XXXXX-of-NNNNN` (:217)
  * Example proto schema per data.tfrecord.encode_image_example (:106-113)

Host-thread parallelism mirrors the reference's coordinator/threads layout
(:274-282) using a thread pool over shard ranges.
"""

from __future__ import annotations

import random
import threading
from pathlib import Path
from typing import List, Sequence

import numpy as np

from faststyle_tpu.data import tfrecord
from faststyle_tpu.utils import image_io

_EXTS = {".jpg", ".jpeg", ".png", ".JPG", ".JPEG", ".PNG"}


def find_image_files(directory: str | Path, seed: int = 12345) -> List[Path]:
    """Flat-glob image files and shuffle deterministically (reference :288-316)."""
    files = sorted(p for p in Path(directory).iterdir() if p.suffix in _EXTS)
    rng = random.Random(seed)
    rng.shuffle(files)
    return files


def _encode_jpeg(img: np.ndarray) -> bytes:
    try:
        import cv2

        ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        if not ok:
            raise ValueError("jpeg encode failed")
        return enc.tobytes()
    except ImportError:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG")
        return buf.getvalue()


def _process_file(path: Path) -> tuple[bytes, int, int]:
    """Return (jpeg_bytes, height, width); re-encode non-JPEG, verify 3-channel."""
    data = path.read_bytes()
    img = image_io.imread(path)  # decodes + converts to RGB; raises if broken
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"{path}: expected 3-channel RGB, got {img.shape}")
    if path.suffix.lower() == ".png":
        data = _encode_jpeg(img)
    return data, img.shape[0], img.shape[1]


def write_dataset(
    directory: str | Path,
    output_dir: str | Path,
    name: str = "train",
    num_shards: int = 8,
    num_threads: int = 4,
    seed: int = 12345,
    log_every: int = 1000,
) -> List[Path]:
    """Convert `directory` into `num_shards` TFRecord files; returns shard paths."""
    if num_shards % num_threads:
        raise ValueError("num_shards must be divisible by num_threads (reference :332)")
    files = find_image_files(directory, seed)
    if not files:
        raise ValueError(f"no images found in {directory}")
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    # split files across shards as evenly as possible
    spacing = np.linspace(0, len(files), num_shards + 1).astype(int)
    shard_paths = [
        output_dir / f"{name}-{i:05d}-of-{num_shards:05d}" for i in range(num_shards)
    ]
    errors: List[str] = []
    processed = [0]
    lock = threading.Lock()

    def worker(shard_ids: Sequence[int]):
        for si in shard_ids:
            with tfrecord.RecordWriter(shard_paths[si]) as w:
                for path in files[spacing[si] : spacing[si + 1]]:
                    try:
                        jpeg, h, width = _process_file(path)
                    except Exception as e:  # skip unreadable files, keep going
                        with lock:
                            errors.append(f"{path}: {e}")
                        continue
                    w.write(tfrecord.encode_image_example(jpeg, h, width, path.name))
                    with lock:
                        processed[0] += 1
                        if processed[0] % log_every == 0:
                            print(f"[writer] {processed[0]}/{len(files)} images")

    shards_per_thread = num_shards // num_threads
    threads = [
        threading.Thread(
            target=worker,
            args=(range(t * shards_per_thread, (t + 1) * shards_per_thread),),
        )
        for t in range(num_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        print(f"[writer] skipped {len(errors)} unreadable files")
    print(f"[writer] wrote {processed[0]} images into {num_shards} shards")
    return shard_paths
