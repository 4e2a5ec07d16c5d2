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

_EXTS = {".jpg", ".jpeg", ".png"}


def find_image_files(directory: str | Path, seed: int = 12345) -> List[Path]:
    """Flat-glob image files and shuffle deterministically (reference :288-316)."""
    files = sorted(p for p in Path(directory).iterdir() if p.suffix.lower() in _EXTS)
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


def _native_channels(data: bytes) -> int:
    """Channel count of the ORIGINAL encoded image (imread force-converts to
    RGB, so checking its output can never catch a grayscale/CMYK source)."""
    try:
        import cv2

        raw = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_UNCHANGED)
        if raw is None:
            raise ValueError("undecodable")
        return 1 if raw.ndim == 2 else raw.shape[2]
    except ImportError:
        import io

        from PIL import Image

        return len(Image.open(io.BytesIO(data)).getbands())


def _process_file(path: Path) -> tuple[bytes, int, int]:
    """Return (jpeg_bytes, height, width).

    The Example schema hardcodes channels=3/colorspace=RGB, so the stored
    bytes must actually be 3-channel: PNGs are re-encoded to JPEG
    (reference :171-174) and non-RGB sources (grayscale/CMYK JPEGs) are
    re-encoded from their forced-RGB decode rather than written raw."""
    data = path.read_bytes()
    img = image_io.imdecode(data)  # decode the bytes we hold: one disk read
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"{path}: expected 3-channel RGB, got {img.shape}")
    if path.suffix.lower() == ".png" or _native_channels(data) != 3:
        data = _encode_jpeg(img.astype(np.uint8))
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

    fatal: List[BaseException] = []

    def worker(shard_ids: Sequence[int]):
        try:
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
        except BaseException as e:
            # shard-level failures (ENOSPC on write, unopenable output path)
            # must fail the conversion, not die silently with the thread —
            # a 'successful' run with missing shards trains on partial data
            with lock:
                fatal.append(e)

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
    if fatal:
        raise RuntimeError(
            f"{len(fatal)} writer thread(s) failed; dataset is incomplete"
        ) from fatal[0]
    if errors:
        print(f"[writer] skipped {len(errors)} unreadable files")
    print(f"[writer] wrote {processed[0]} images into {num_shards} shards")
    return shard_paths
