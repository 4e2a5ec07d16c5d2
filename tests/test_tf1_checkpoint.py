"""Tests for the standalone TF1 tensor_bundle reader (compat layer)."""

from pathlib import Path

import numpy as np
import pytest

from faststyle_tpu.compat import tf1_checkpoint

REF_CKPT = Path("/root/reference/models/starry_final.ckpt")
ROOT = Path(__file__).parent.parent

pytestmark = pytest.mark.skipif(
    not REF_CKPT.with_name("starry_final.ckpt.index").exists(),
    reason="reference checkpoints not mounted",
)


def test_variable_inventory():
    params = tf1_checkpoint.load_transform_net_params(REF_CKPT)
    blocks = sorted(params)
    assert blocks == (
        [f"initconv_{i}" for i in range(3)]
        + [f"resblock_{i}" for i in range(5)]
        + [f"upsample_{i}" for i in range(3)]
    )
    assert params["initconv_0"]["W"].shape == (9, 9, 3, 16)
    assert params["resblock_3"]["W2"].shape == (3, 3, 64, 64)
    assert params["upsample_2"]["W"].shape == (9, 9, 16, 3)
    for blk in params.values():
        for arr in blk.values():
            assert arr.dtype == np.float32


def test_matches_converted_npz():
    """The shipped-in-repo .npz conversions must be bit-identical to a fresh
    parse of the reference checkpoints."""
    from faststyle_tpu.inference import load_params

    fresh = tf1_checkpoint.load_transform_net_params(REF_CKPT)
    converted = load_params(Path(__file__).parent.parent / "weights" / "starry_final.npz")
    for blk in fresh:
        for var in fresh[blk]:
            np.testing.assert_array_equal(fresh[blk][var], converted[blk][var])


def test_matches_tensorflow_reader():
    tf = pytest.importorskip("tensorflow")
    mine = tf1_checkpoint.load_checkpoint(REF_CKPT)
    reader = tf.train.load_checkpoint(str(REF_CKPT))
    names = set(reader.get_variable_to_shape_map())
    assert names == set(mine)
    for name in names:
        np.testing.assert_array_equal(mine[name], reader.get_tensor(name))


def test_snappy_roundtrip_via_reference_impl():
    """Exercise the snappy decompressor against python-snappy if present,
    else against a hand-built compressed stream."""
    # hand-built: literal 'abcd' + copy(offset=4, len=8) -> 'abcdabcdabcd'
    data = bytes([12]) + bytes([(4 - 1) << 2]) + b"abcd" + bytes([((8 - 4) << 2) | 1, 4])
    out = tf1_checkpoint._snappy_decompress(data)
    assert out == b"abcdabcdabcd"


def test_writer_roundtrip_self(tmp_path):
    """save_checkpoint -> load_checkpoint is byte-exact, mixed shapes/dtypes."""
    rng = np.random.default_rng(0)
    tensors = {
        "a/W": rng.standard_normal((3, 3, 4, 8)).astype(np.float32),
        "a/b": rng.standard_normal((8,)).astype(np.float32),
        "z/scalar": np.float32(3.25).reshape(()),
        "m/ints": rng.integers(-5, 5, (7, 2)).astype(np.int32),
    }
    tf1_checkpoint.save_checkpoint(tmp_path / "rt.ckpt", tensors)
    back = tf1_checkpoint.load_checkpoint(tmp_path / "rt.ckpt")
    assert sorted(back) == sorted(tensors)
    for k in tensors:
        np.testing.assert_array_equal(back[k], tensors[k])
        assert back[k].dtype == tensors[k].dtype


def test_writer_transform_net_roundtrip(tmp_path):
    from faststyle_tpu.inference import load_params

    params = load_params(ROOT / "weights" / "starry_final.npz")
    tf1_checkpoint.save_transform_net_params(params, tmp_path / "starry.ckpt")
    back = tf1_checkpoint.load_transform_net_params(tmp_path / "starry.ckpt")
    for blk, sub in params.items():
        for var, arr in sub.items():
            np.testing.assert_array_equal(back[blk][var], np.asarray(arr))


def test_writer_readable_by_tensorflow(tmp_path):
    """The exported bundle loads via TF's own reader (Saver-compatible):
    the reference's TF1 stack can consume models trained here."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(1)
    tensors = {
        "img_t_net/initconv_0/W": rng.standard_normal((9, 9, 3, 16)).astype(np.float32),
        "img_t_net/initconv_0/INscale": np.ones(16, np.float32),
    }
    tf1_checkpoint.save_checkpoint(tmp_path / "tfread.ckpt", tensors)
    reader = tf.train.load_checkpoint(str(tmp_path / "tfread.ckpt"))
    assert sorted(reader.get_variable_to_shape_map()) == sorted(tensors)
    for k, v in tensors.items():
        np.testing.assert_array_equal(reader.get_tensor(k), v)


def test_snappy_corrupt_blocks_raise():
    """Integrity guards must be explicit raises (assert would vanish under
    python -O) and must reject zero/overlong copy offsets."""
    import pytest

    from faststyle_tpu.compat.tf1_checkpoint import _snappy_decompress

    # literal 'abc' but header promises 5 decompressed bytes
    bad_len = bytes([5, (2 << 2)]) + b"abc"
    with pytest.raises(ValueError, match="corrupt snappy"):
        _snappy_decompress(bad_len)
    # copy tag (1-byte offset form) with offset 0
    zero_off = bytes([4, (0 << 2) | 0]) + b"a" + bytes([(0 << 2) | 1, 0])
    with pytest.raises(ValueError, match="copy offset"):
        _snappy_decompress(zero_off)
