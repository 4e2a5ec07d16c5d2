"""Host-side training input pipeline: TFRecords -> device-ready batches.

Replaces the reference's TF1 queue-runner pipeline (datapipe.py:51-78 —
filename queue, JPEG decode op, bicubic resize, shuffle_batch) with plain
host threads + a double-buffered device feed:

  reader thread (record scan, native codec)
    -> decode pool (cv2 JPEG decode + bicubic resize; cv2 releases the GIL)
    -> shuffle buffer (min_after_dequeue-style uniform sampling)
    -> batcher
    -> prefetcher (jax.device_put N batches ahead so the TPU never waits)

Contract kept from the reference: bicubic resize to `resize_shape`
(tf.image.resize method=2, datapipe.py:25), shuffle buffer of
`min_after_dequeue` images (datapipe.py:74-77), epoch-bounded iteration with
per-epoch reshuffling of shard order.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, TypeVar

_T = TypeVar("_T")
_R = TypeVar("_R")


def _bounded_map(
    pool: ThreadPoolExecutor, fn: Callable[[_T], _R], items: Iterable[_T], depth: int
) -> Iterator[_R]:
    """Like Executor.map but with a bounded in-flight window.

    Executor.map submits the ENTIRE iterable before yielding anything, which
    deadlocks on infinite streams (n_epochs=None) and materializes every
    decoded image of a finite dataset in memory. This keeps at most `depth`
    futures outstanding and yields results in order.
    """
    it = iter(items)
    window: collections.deque = collections.deque()
    try:
        while True:
            while len(window) < depth:
                try:
                    window.append(pool.submit(fn, next(it)))
                except StopIteration:
                    break
            if not window:
                return
            yield window.popleft().result()
    finally:
        for fut in window:
            fut.cancel()

import numpy as np

from faststyle_tpu.data import tfrecord

try:
    import cv2

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAVE_CV2 = False


def _decode_resize(jpeg: bytes, resize_shape: Optional[Sequence[int]]) -> Optional[np.ndarray]:
    """JPEG bytes -> float32 RGB HWC, bicubic-resized to `resize_shape`."""
    if _HAVE_CV2:
        img = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            return None
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if resize_shape is not None:
            img = cv2.resize(img, (resize_shape[1], resize_shape[0]), interpolation=cv2.INTER_CUBIC)
        return img.astype(np.float32)
    import io

    from PIL import Image

    try:
        img = Image.open(io.BytesIO(jpeg)).convert("RGB")
    except Exception:
        return None
    if resize_shape is not None:
        img = img.resize((resize_shape[1], resize_shape[0]), Image.BICUBIC)
    return np.asarray(img, dtype=np.float32)


class Batcher:
    """TFRecord shards -> shuffled float32 NHWC batches (an iterator).

    Mirrors `datapipe.batcher(files, batch_size, resize_shape, n_epochs,
    min_after_dequeue)` (datapipe.py:51).
    """

    def __init__(
        self,
        files: Sequence[str | Path],
        batch_size: int,
        resize_shape: Optional[Sequence[int]] = (256, 256),
        n_epochs: Optional[int] = None,
        min_after_dequeue: int = 4000,
        num_decode_threads: int = 8,
        seed: int = 0,
        drop_remainder: bool = True,
        verify_crc: Optional[bool] = None,
    ):
        if not files:
            raise ValueError("no input files")
        self._files = [Path(f) for f in files]
        self._batch = batch_size
        self._resize = tuple(resize_shape) if resize_shape is not None else None
        self._epochs = n_epochs
        self._buffer_size = min_after_dequeue
        self._threads = num_decode_threads
        self._rng = np.random.default_rng(seed)
        self._drop_remainder = drop_remainder
        # TF's RecordReader always CRC-checks; default on here too so a
        # bit-rotted shard raises instead of feeding garbage to JPEG decode.
        # Near-free with the native scanner (fs_scan_records does the CRC in
        # the same pass that finds record boundaries) — but the pure-Python
        # fallback CRC is a per-byte loop that would cap ingest at a fraction
        # of the device's appetite, so None (default) enables verification
        # only when the native library loads; pass True to force it anyway.
        if verify_crc is None:
            from faststyle_tpu import native

            verify_crc = native.load() is not None
        self._verify_crc = verify_crc

    def _record_stream(self) -> Iterator[bytes]:
        epoch = 0
        while self._epochs is None or epoch < self._epochs:
            order = self._rng.permutation(len(self._files))
            for fi in order:
                for rec in tfrecord.iter_records(self._files[fi], verify=self._verify_crc):
                    yield rec
            epoch += 1

    def __iter__(self) -> Iterator[np.ndarray]:
        buffer: List[np.ndarray] = []
        pending: List[np.ndarray] = []

        def decode(rec: bytes) -> Optional[np.ndarray]:
            ex = tfrecord.decode_example(rec)
            enc = ex.get("image/encoded")
            if enc is None:
                return None
            return _decode_resize(enc, self._resize)

        pool = ThreadPoolExecutor(max_workers=self._threads)
        try:
            stream = _bounded_map(pool, decode, self._record_stream(), depth=4 * self._threads)
            for img in stream:
                if img is None:
                    continue
                buffer.append(img)
                if len(buffer) <= self._buffer_size:
                    continue
                # uniform sample from the shuffle buffer (shuffle_batch behavior)
                idx = self._rng.integers(len(buffer))
                buffer[idx], sample = buffer[-1], buffer[idx]
                buffer.pop()
                pending.append(sample)
                if len(pending) == self._batch:
                    yield np.stack(pending)
                    pending = []
            # drain: input exhausted, flush the buffer
            self._rng.shuffle(buffer)
            for sample in buffer:
                pending.append(sample)
                if len(pending) == self._batch:
                    yield np.stack(pending)
                    pending = []
            if pending and not self._drop_remainder:
                yield np.stack(pending)
        except GeneratorExit:
            # consumer abandoned the iterator (e.g. num_steps_break hit, or
            # GC at interpreter teardown): don't join workers — cancel and go
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except AttributeError:
                pass  # interpreter teardown: stdlib module globals already None
            raise
        else:
            pool.shutdown(wait=True)


def device_prefetch(batches: Iterator[np.ndarray], *, depth: int = 2, sharding=None):
    """Move batches to device `depth` ahead of consumption on a host thread.

    With a `NamedSharding`, the host splits each global batch across the mesh
    (the multi-chip feed); otherwise plain device_put to the default device.
    """
    import jax

    q: queue.Queue = queue.Queue(maxsize=depth)
    _SENTINEL = object()
    stop = threading.Event()

    def put(item) -> bool:
        """Bounded put that gives up when the consumer is gone — a plain
        q.put would block forever once the consumer abandons the generator
        (e.g. the train loop breaking at num_steps_break), pinning the
        feeder thread AND the source Batcher's shuffle buffer for the rest
        of the process."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def feeder():
        try:
            try:
                for batch in batches:
                    if not put(jax.device_put(batch, sharding)):
                        return
            except BaseException as e:  # surface pipeline failures
                put(e)
            else:
                put(_SENTINEL)
        finally:
            # the feeder is the thread that iterates `batches`, so closing
            # here is same-thread: the source generator's finally/GeneratorExit
            # cleanup (decode pool + shuffle buffer teardown) actually runs
            close = getattr(batches, "close", None)
            if close is not None:
                close()

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # drain so a feeder mid-put wakes immediately
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=5.0)


def image_dir_batcher(
    directory: str | Path,
    batch_size: int,
    resize_shape: Optional[Sequence[int]] = (256, 256),
    **kwargs,
) -> "Batcher":
    """Train straight from a directory of JPEGs, skipping the TFRecord step —
    a TPU-native convenience the reference lacks (it requires conversion).

    Implemented by wrapping each file's bytes in an in-memory record stream.
    """

    class _DirBatcher(Batcher):
        def _record_stream(self):
            epoch = 0
            while self._epochs is None or epoch < self._epochs:
                order = self._rng.permutation(len(self._files))
                for fi in order:
                    data = self._files[fi].read_bytes()
                    yield tfrecord.encode_image_example(data, 0, 0, self._files[fi].name)
                epoch += 1

    exts = {".jpg", ".jpeg", ".png"}
    files = sorted(p for p in Path(directory).iterdir() if p.suffix.lower() in exts)
    return _DirBatcher(files, batch_size=batch_size, resize_shape=resize_shape, **kwargs)
