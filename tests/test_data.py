"""Data layer tests: record codec (native + Python paths), writer round-trip,
pipeline decode/resize/batch."""

import numpy as np
import pytest

from faststyle_tpu import native
from faststyle_tpu.data import pipeline, tfrecord, writer
from faststyle_tpu.utils import image_io


def _make_images(tmp_path, n=12, size=(40, 30)):
    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(n):
        img = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
        image_io.imwrite(d / f"img_{i:03d}.jpg", img)
    return d


def test_crc32c_known_vectors():
    # RFC 3720 test vector: crc32c(32 zero bytes) = 0x8a9136aa -> masked
    crc = 0x8A9136AA
    masked = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert tfrecord._masked_crc_py(b"\x00" * 32) == masked
    lib = native.load()
    if lib is not None:
        assert lib.fs_masked_crc32c(b"\x00" * 32, 32) == masked


def test_native_and_python_framing_agree(tmp_path):
    payloads = [b"hello", b"", b"x" * 1000]
    lib = native.load()
    for p in payloads:
        framed = tfrecord.frame_record(p)
        header = framed[:8]
        assert int.from_bytes(header, "little") == len(p)
        # python fallback must produce identical bytes
        import struct

        py = (
            header
            + struct.pack("<I", tfrecord._masked_crc_py(header))
            + p
            + struct.pack("<I", tfrecord._masked_crc_py(p))
        )
        assert framed == py


def test_record_roundtrip(tmp_path):
    path = tmp_path / "test.tfrecord"
    payloads = [f"payload-{i}".encode() * (i + 1) for i in range(20)]
    with tfrecord.RecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    assert list(tfrecord.iter_records(path, verify=True)) == payloads


def test_streaming_reads_bounded(tmp_path):
    """iter_records must stream: records straddling chunk boundaries (and
    records larger than a whole chunk) come back intact with tiny chunks."""
    path = tmp_path / "big.tfrecord"
    rng = np.random.default_rng(7)
    payloads = [rng.integers(0, 256, n, dtype=np.uint8).tobytes()
                for n in (1, 4000, 70000, 3, 150000, 0, 9000)]
    with tfrecord.RecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    # 64 KiB chunks: the 70K/150K records exceed a chunk; others straddle
    got = list(tfrecord.iter_records(path, verify=True, chunk_bytes=64 * 1024))
    assert got == payloads
    # truncated tail is dropped silently (TF RecordReader behavior)
    raw = path.read_bytes()
    path.write_bytes(raw[:-5])
    got = list(tfrecord.iter_records(path, verify=True, chunk_bytes=64 * 1024))
    assert got == payloads[:-1]


def test_corrupt_record_detected(tmp_path):
    path = tmp_path / "bad.tfrecord"
    with tfrecord.RecordWriter(path) as w:
        w.write(b"data" * 100)
    raw = bytearray(path.read_bytes())
    raw[20] ^= 0xFF  # flip a payload byte
    path.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="corrupt"):
        list(tfrecord.iter_records(path, verify=True))


def test_example_proto_roundtrip():
    ex = tfrecord.encode_image_example(b"\xff\xd8jpegdata", 480, 640, "a.jpg")
    dec = tfrecord.decode_example(ex)
    assert dec["image/encoded"] == b"\xff\xd8jpegdata"
    assert dec["image/height"] == 480
    assert dec["image/width"] == 640
    assert dec["image/channels"] == 3
    assert dec["image/colorspace"] == b"RGB"
    assert dec["image/format"] == b"JPEG"
    assert dec["image/filename"] == b"a.jpg"


def test_example_proto_tf_compatible():
    """TF must parse our Examples and we must parse TF's."""
    tf = pytest.importorskip("tensorflow")
    ours = tfrecord.encode_image_example(b"jpegbytes", 7, 9, "f.jpg")
    parsed = tf.io.parse_single_example(
        ours,
        {
            "image/encoded": tf.io.FixedLenFeature([], tf.string),
            "image/height": tf.io.FixedLenFeature([], tf.int64),
            "image/width": tf.io.FixedLenFeature([], tf.int64),
        },
    )
    assert parsed["image/encoded"].numpy() == b"jpegbytes"
    assert int(parsed["image/height"]) == 7
    assert int(parsed["image/width"]) == 9

    theirs = tf.train.Example(
        features=tf.train.Features(
            feature={
                "image/encoded": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[b"tfbytes"])
                ),
                "image/height": tf.train.Feature(int64_list=tf.train.Int64List(value=[5])),
            }
        )
    ).SerializeToString()
    dec = tfrecord.decode_example(theirs)
    assert dec["image/encoded"] == b"tfbytes"
    assert dec["image/height"] == 5


def test_writer_shards_and_determinism(tmp_path):
    imgs = _make_images(tmp_path, n=12)
    out = tmp_path / "records"
    paths = writer.write_dataset(imgs, out, num_shards=4, num_threads=2)
    assert [p.name for p in paths] == [f"train-{i:05d}-of-00004" for i in range(4)]
    total = sum(len(list(tfrecord.iter_records(p, verify=True))) for p in paths)
    assert total == 12
    # deterministic shuffle (seed 12345): same order across invocations
    order1 = [p.name for p in writer.find_image_files(imgs)]
    order2 = [p.name for p in writer.find_image_files(imgs)]
    assert order1 == order2
    assert order1 != sorted(order1)  # actually shuffled


def test_writer_reencodes_png_to_jpeg(tmp_path):
    """PNG inputs are re-encoded to JPEG (reference tfrecords_writer.py:171-174);
    the stored bytes must decode as JPEG."""
    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    image_io.imwrite(d / "img.png", rng.integers(0, 255, (20, 24, 3), dtype=np.uint8))
    paths = writer.write_dataset(d, tmp_path / "o", num_shards=1, num_threads=1)
    recs = list(tfrecord.iter_records(paths[0], verify=True))
    assert len(recs) == 1
    ex = tfrecord.decode_example(recs[0])
    assert ex["image/encoded"][:2] == b"\xff\xd8"  # JPEG SOI marker
    assert ex["image/height"] == 20 and ex["image/width"] == 24
    img = pipeline._decode_resize(ex["image/encoded"], None)
    assert img.shape == (20, 24, 3)


def test_writer_rejects_bad_shard_split(tmp_path):
    imgs = _make_images(tmp_path, n=2)
    with pytest.raises(ValueError, match="divisible"):
        writer.write_dataset(imgs, tmp_path / "o", num_shards=3, num_threads=2)


def test_batcher_shapes_and_epochs(tmp_path):
    imgs = _make_images(tmp_path, n=10)
    out = tmp_path / "records"
    paths = writer.write_dataset(imgs, out, num_shards=2, num_threads=2)
    b = pipeline.Batcher(
        paths, batch_size=4, resize_shape=(32, 32), n_epochs=2, min_after_dequeue=5
    )
    batches = list(b)
    assert len(batches) == 5  # 20 images / 4
    for batch in batches:
        assert batch.shape == (4, 32, 32, 3)
        assert batch.dtype == np.float32
        assert 0 <= batch.min() and batch.max() <= 255


def test_batcher_raises_on_corrupt_shard(tmp_path):
    """The training read path CRC-checks by default (TF's RecordReader always
    does): a bit-flipped shard must raise, not feed garbage to JPEG decode."""
    imgs = _make_images(tmp_path, n=4)
    paths = writer.write_dataset(imgs, tmp_path / "records", num_shards=1, num_threads=1)
    raw = bytearray(paths[0].read_bytes())
    raw[len(raw) // 2] ^= 0xFF  # flip a payload byte mid-file
    paths[0].write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="corrupt"):
        # verify_crc=True forced so the test holds on hosts without the
        # native scanner (where the None default degrades to no-verify)
        list(pipeline.Batcher(paths, batch_size=2, resize_shape=(16, 16),
                              n_epochs=1, min_after_dequeue=2, verify_crc=True))
    # explicit opt-out preserves the old permissive behavior
    list(pipeline.Batcher(paths, batch_size=2, resize_shape=(16, 16),
                          n_epochs=1, min_after_dequeue=2, verify_crc=False))


def test_image_dir_batcher(tmp_path):
    imgs = _make_images(tmp_path, n=6)
    b = pipeline.image_dir_batcher(imgs, batch_size=3, resize_shape=(16, 16), n_epochs=1,
                                   min_after_dequeue=2)
    batches = list(b)
    assert len(batches) == 2
    assert batches[0].shape == (3, 16, 16, 3)


def test_batcher_streams_infinite_epochs(tmp_path):
    """n_epochs=None is an infinite stream: the pipeline must yield batches
    without consuming the whole iterator first (regression: Executor.map
    submits its entire iterable eagerly)."""
    imgs = _make_images(tmp_path, n=6)
    out = tmp_path / "records"
    paths = writer.write_dataset(imgs, out, num_shards=2, num_threads=2)
    b = pipeline.Batcher(paths, batch_size=2, resize_shape=(16, 16),
                         n_epochs=None, min_after_dequeue=2)
    it = iter(b)
    got = [next(it) for _ in range(20)]  # > one epoch's worth
    assert all(g.shape == (2, 16, 16, 3) for g in got)


def test_device_prefetch_propagates_errors():
    """A failing input pipeline must fail training, not end it 'successfully'."""
    def bad_batches():
        yield np.zeros((1, 4, 4, 3), np.float32)
        raise ValueError("corrupt TFRecord")

    it = pipeline.device_prefetch(bad_batches(), depth=2)
    next(it)
    with pytest.raises(ValueError, match="corrupt"):
        list(it)


def test_device_prefetch(tmp_path):
    arrs = [np.full((2, 4, 4, 3), i, np.float32) for i in range(5)]
    got = list(pipeline.device_prefetch(iter(arrs), depth=2))
    assert len(got) == 5
    for i, g in enumerate(got):
        np.testing.assert_array_equal(np.asarray(g), arrs[i])


def test_device_prefetch_abandonment_closes_source():
    """Breaking out of training (num_steps_break) abandons the prefetch
    generator; the feeder must stop and CLOSE the source iterator so the
    Batcher's decode pool / shuffle buffer are torn down, not leaked."""
    import gc
    import time

    closed = []

    def batches():
        try:
            i = 0
            while True:
                yield np.full((1, 4, 4, 3), i, np.float32)
                i += 1
        finally:
            closed.append(True)

    it = pipeline.device_prefetch(batches(), depth=2)
    next(it)
    next(it)
    it.close()  # what dropping the generator does at GC; explicit here
    gc.collect()
    deadline = time.time() + 5.0
    while not closed and time.time() < deadline:
        time.sleep(0.02)
    assert closed, "feeder thread never closed the abandoned source iterator"


def test_writer_reencodes_grayscale_jpeg(tmp_path):
    """The Example schema hardcodes channels=3; a grayscale JPEG source must
    be re-encoded from its RGB decode, not stored as raw 1-channel bytes."""
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (20, 24), dtype=np.uint8), "L"
    ).save(d / "gray.jpg")
    paths = writer.write_dataset(d, tmp_path / "o", num_shards=1, num_threads=1)
    ex = tfrecord.decode_example(next(iter(tfrecord.iter_records(paths[0], verify=True))))
    img = pipeline._decode_resize(ex["image/encoded"], None)
    assert img.shape == (20, 24, 3)
    from faststyle_tpu.data.writer import _native_channels

    assert _native_channels(ex["image/encoded"]) == 3


def test_writer_thread_failure_raises(tmp_path, monkeypatch):
    """A worker thread dying (ENOSPC on write, unopenable shard) must fail
    write_dataset loudly instead of returning a partial dataset."""
    imgs = _make_images(tmp_path, n=4)

    class Boom(tfrecord.RecordWriter):
        def write(self, *a, **k):
            raise OSError("disk full")

    monkeypatch.setattr(tfrecord, "RecordWriter", Boom)
    with pytest.raises(RuntimeError, match="incomplete"):
        writer.write_dataset(imgs, tmp_path / "o2", num_shards=2, num_threads=2)
