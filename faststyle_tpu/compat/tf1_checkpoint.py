"""Standalone TF1 tensor_bundle checkpoint reader — no TensorFlow dependency.

The reference ships its pretrained transform nets as TF1 `Saver` V2
checkpoints (`/root/reference/models/*_final.ckpt.{index,data-00000-of-00001}`,
written by train.py:225,286). This module parses that format directly:

  * the `.index` file is a LevelDB-format SSTable mapping variable names to
    serialized `BundleEntryProto`s (plus an empty-key `BundleHeaderProto`);
  * the `.data-NNNNN-of-NNNNN` shard holds the raw little-endian tensor bytes
    at (offset, size) recorded in each entry.

We implement the minimal SSTable reader (footer, block handles, prefix-
compressed keys, optional snappy blocks) and the handful of protobuf fields
we need, so converting the shipped weights never requires importing TF.

Validated against `tf.train.load_checkpoint` in tests when TF is available.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, Iterator, Tuple

import ml_dtypes
import numpy as np

_SSTABLE_MAGIC = 0xDB4775248B80FB57

# TF DataType enum -> numpy dtype (the subset a faststyle checkpoint can hold)
_TF_DTYPES = {
    1: np.float32,
    2: np.float64,
    3: np.int32,
    4: np.uint8,
    5: np.int16,
    6: np.int8,
    7: np.bytes_,
    9: np.int64,
    10: np.bool_,
    14: np.dtype(ml_dtypes.bfloat16),
    19: np.float16,
}


# ---------------------------------------------------------------------------
# varint / protobuf-lite helpers
# ---------------------------------------------------------------------------


# One varint codec for the whole package: data.tfrecord owns the protobuf
# wire helpers (this module already leans on its masked_crc32c).
from faststyle_tpu.data.tfrecord import _read_varint  # noqa: E402
from faststyle_tpu.data.tfrecord import _varint as _write_varint  # noqa: E402


def _iter_proto_fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) for a serialized message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # fixed64
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # fixed32
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _parse_shape(buf: bytes) -> Tuple[int, ...]:
    """TensorShapeProto: repeated field 2 = Dim{1: size}."""
    dims = []
    for field, _wire, val in _iter_proto_fields(buf):
        if field == 2:
            size = 0
            for f2, _w2, v2 in _iter_proto_fields(val):
                if f2 == 1:
                    size = v2
            dims.append(size)
    return tuple(dims)


class BundleEntry:
    __slots__ = ("dtype", "shape", "shard_id", "offset", "size", "crc32c")

    def __init__(self, buf: bytes):
        self.dtype = np.float32
        self.shape: Tuple[int, ...] = ()
        self.shard_id = 0
        self.offset = 0
        self.size = 0
        self.crc32c = 0
        for field, _wire, val in _iter_proto_fields(buf):
            if field == 1:
                self.dtype = _TF_DTYPES[val]
            elif field == 2:
                self.shape = _parse_shape(val)
            elif field == 3:
                self.shard_id = val
            elif field == 4:
                self.offset = val
            elif field == 5:
                self.size = val
            elif field == 6:
                self.crc32c = val


# ---------------------------------------------------------------------------
# snappy (block format) — minimal decompressor for compressed SSTable blocks
# ---------------------------------------------------------------------------


def _snappy_decompress(data: bytes) -> bytes:
    out_len, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                ln = int.from_bytes(data[pos : pos + nbytes], "little")
                pos += nbytes
            ln += 1
            out += data[pos : pos + ln]
            pos += ln
        else:
            if kind == 1:  # copy, 1-byte offset
                ln = ((tag >> 2) & 0x7) + 4
                off = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif kind == 2:  # copy, 2-byte offset
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[pos : pos + 2], "little")
                pos += 2
            else:  # copy, 4-byte offset
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[pos : pos + 4], "little")
                pos += 4
            start = len(out) - off
            if off == 0 or start < 0:
                # a zero/overlong back-reference only arises from corrupt
                # input; indexing through it would raise a bare IndexError
                # (or silently read wrong bytes for off==0)
                raise ValueError(
                    f"corrupt snappy block: copy offset {off} at output "
                    f"position {len(out)}"
                )
            for i in range(ln):  # may self-overlap; byte-by-byte is correct
                out.append(out[start + i])
    # explicit raise, not assert: this guards file integrity and must
    # survive `python -O`
    if len(out) != out_len:
        raise ValueError(
            f"corrupt snappy block: decompressed {len(out)} bytes, header "
            f"promised {out_len}"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# SSTable reader
# ---------------------------------------------------------------------------


def _read_block(raw: bytes, offset: int, size: int) -> bytes:
    """Fetch a block given its handle; handles the 1-byte compression tag."""
    block = raw[offset : offset + size]
    ctype = raw[offset + size]  # trailer: compression byte + crc32
    if ctype == 0:
        return block
    if ctype == 1:
        return _snappy_decompress(block)
    raise ValueError(f"unsupported block compression {ctype}")


def _iter_block_entries(block: bytes) -> Iterator[Tuple[bytes, bytes]]:
    """Yield (key, value) from a prefix-compressed LevelDB block."""
    num_restarts = struct.unpack_from("<I", block, len(block) - 4)[0]
    data_end = len(block) - 4 - 4 * num_restarts
    pos = 0
    key = b""
    while pos < data_end:
        shared, pos = _read_varint(block, pos)
        non_shared, pos = _read_varint(block, pos)
        value_len, pos = _read_varint(block, pos)
        key = key[:shared] + block[pos : pos + non_shared]
        pos += non_shared
        value = block[pos : pos + value_len]
        pos += value_len
        yield key, value


def _read_handle(buf: bytes, pos: int) -> Tuple[int, int, int]:
    offset, pos = _read_varint(buf, pos)
    size, pos = _read_varint(buf, pos)
    return offset, size, pos


def read_index(index_path: str | Path) -> Dict[str, BundleEntry]:
    """Parse a `.index` file into {variable_name: BundleEntry}."""
    raw = Path(index_path).read_bytes()
    magic = struct.unpack_from("<Q", raw, len(raw) - 8)[0]
    if magic != _SSTABLE_MAGIC:
        raise ValueError(f"{index_path}: not an SSTable (bad magic)")
    footer = raw[len(raw) - 48 :]
    _mi_off, _mi_sz, pos = _read_handle(footer, 0)  # metaindex (unused)
    idx_off, idx_sz, _ = _read_handle(footer, pos)

    entries: Dict[str, BundleEntry] = {}
    index_block = _read_block(raw, idx_off, idx_sz)
    for _key, handle in _iter_block_entries(index_block):
        off, sz, _ = _read_handle(handle, 0)
        for key, value in _iter_block_entries(_read_block(raw, off, sz)):
            if key == b"":  # BundleHeaderProto
                continue
            entries[key.decode()] = BundleEntry(value)
    return entries


def load_checkpoint(prefix: str | Path) -> Dict[str, np.ndarray]:
    """Load all tensors of a TF1 V2 checkpoint given its path prefix.

    `prefix` is the path as TF names it, e.g. `models/starry_final.ckpt`
    (the actual files are `<prefix>.index` + `<prefix>.data-XXXXX-of-NNNNN`).
    """
    prefix = Path(prefix)
    entries = read_index(prefix.with_name(prefix.name + ".index"))
    num_shards = 1 + max(e.shard_id for e in entries.values())
    shards = [
        (prefix.with_name(f"{prefix.name}.data-{i:05d}-of-{num_shards:05d}")).read_bytes()
        for i in range(num_shards)
    ]
    out: Dict[str, np.ndarray] = {}
    for name, e in entries.items():
        raw = shards[e.shard_id][e.offset : e.offset + e.size]
        arr = np.frombuffer(raw, dtype=e.dtype).reshape(e.shape)
        out[name] = arr
    return out


# ---------------------------------------------------------------------------
# faststyle-specific conversion
# ---------------------------------------------------------------------------


def load_transform_net_params(prefix: str | Path, scope: str = "img_t_net"):
    """Convert a reference transform-net checkpoint into our params pytree.

    The variable inventory is the contract from SURVEY.md §2.2:
    `img_t_net/{initconv_k,resblock_k,upsample_k}/{W,W1,W2,INscale*,INshift*}`.
    Weight layouts are HWIO, identical to ours — a straight copy.
    """
    tensors = load_checkpoint(prefix)
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for name, arr in tensors.items():
        parts = name.split("/")
        if parts[0] != scope or len(parts) != 3:
            continue
        params.setdefault(parts[1], {})[parts[2]] = arr
    if not params:
        raise ValueError(f"no '{scope}/*' variables found in {prefix}")
    return params


# ---------------------------------------------------------------------------
# TF1 tensor_bundle WRITER — the inverse direction: models trained in this
# framework export to the reference's checkpoint format, so its TF1 stack
# (Saver.restore in stylize_image.py:62-64) can load them unchanged.
# ---------------------------------------------------------------------------

_NP_TO_TF = {np.dtype(k): v for v, k in _TF_DTYPES.items() if k is not np.bytes_}


# _write_varint: imported from data.tfrecord next to _read_varint above.


def _encode_handle(offset: int, size: int) -> bytes:
    return _write_varint(offset) + _write_varint(size)


def _build_block(items) -> bytes:
    """LevelDB block: no prefix compression (shared=0 is always valid), one
    restart point. `items` = sorted (key, value) byte pairs."""
    body = bytearray()
    for key, value in items:
        body += _write_varint(0) + _write_varint(len(key)) + _write_varint(len(value))
        body += key + value
    body += struct.pack("<I", 0)  # restart[0]
    body += struct.pack("<I", 1)  # num_restarts
    return bytes(body)


def _append_block(out: bytearray, block: bytes) -> Tuple[int, int]:
    """Append block + trailer (type 0, masked crc32c of data+type); return
    its BlockHandle (offset, size). Mirrors leveldb's table_builder."""
    from faststyle_tpu.data.tfrecord import masked_crc32c

    offset, size = len(out), len(block)
    out += block
    out += b"\x00"
    out += struct.pack("<I", masked_crc32c(block + b"\x00"))
    return offset, size


def _shape_proto(shape) -> bytes:
    out = b""
    for d in shape:
        dim = b"\x08" + _write_varint(int(d))  # Dim.size = field 1 varint
        out += b"\x12" + _write_varint(len(dim)) + dim  # shape.dim = field 2
    return out


def _entry_proto(arr: np.ndarray, offset: int, crc: int) -> bytes:
    shp = _shape_proto(arr.shape)
    out = b"\x08" + _write_varint(_NP_TO_TF[arr.dtype])  # dtype = field 1
    out += b"\x12" + _write_varint(len(shp)) + shp  # shape = field 2
    # shard_id (field 3) omitted == 0
    if offset:
        out += b"\x20" + _write_varint(offset)  # offset = field 4
    out += b"\x28" + _write_varint(arr.nbytes)  # size = field 5
    out += b"\x35" + struct.pack("<I", crc)  # crc32c = field 6, fixed32
    return out


def _header_proto(num_shards: int = 1) -> bytes:
    version = b"\x08\x01"  # VersionDef.producer = 1
    return (
        b"\x08" + _write_varint(num_shards)  # num_shards = field 1
        # endianness (field 2) omitted == LITTLE
        + b"\x1a" + _write_varint(len(version)) + version  # version = field 3
    )


def save_checkpoint(prefix: str | Path, tensors: Dict[str, np.ndarray]) -> None:
    """Write a TF1 V2 checkpoint (`<prefix>.index` +
    `<prefix>.data-00000-of-00001`) readable by `tf.train.Saver.restore` /
    `tf.train.load_checkpoint` — and by `load_checkpoint` above. Tensors are
    laid out in sorted-name order with masked-crc32c entry checksums,
    matching TF's tensor_bundle writer."""
    from faststyle_tpu.data.tfrecord import masked_crc32c

    prefix = Path(prefix)
    prefix.parent.mkdir(parents=True, exist_ok=True)
    names = sorted(tensors)
    data = bytearray()
    items = [(b"", _header_proto())]
    for name in names:
        arr = np.ascontiguousarray(tensors[name])
        if arr.dtype not in _NP_TO_TF:
            raise ValueError(f"{name}: unsupported dtype {arr.dtype}")
        raw = arr.tobytes()
        items.append((name.encode(), _entry_proto(arr, len(data), masked_crc32c(raw))))
        data += raw
    prefix.with_name(prefix.name + ".data-00000-of-00001").write_bytes(bytes(data))

    out = bytearray()
    d_off, d_sz = _append_block(out, _build_block(items))
    m_off, m_sz = _append_block(out, _build_block([]))  # empty metaindex
    idx_items = [(items[-1][0], _encode_handle(d_off, d_sz))]
    i_off, i_sz = _append_block(out, _build_block(idx_items))
    footer = _encode_handle(m_off, m_sz) + _encode_handle(i_off, i_sz)
    footer += b"\x00" * (40 - len(footer))
    footer += struct.pack("<Q", _SSTABLE_MAGIC)
    out += footer
    prefix.with_name(prefix.name + ".index").write_bytes(bytes(out))


def save_transform_net_params(
    params, prefix: str | Path, scope: str = "img_t_net"
) -> None:
    """Export our params pytree as a reference-named checkpoint
    (`img_t_net/<block>/<var>`, the SURVEY.md §2.2 variable inventory) —
    the exact inverse of load_transform_net_params."""
    tensors = {
        f"{scope}/{blk}/{var}": np.asarray(arr, np.float32)
        for blk, sub in params.items()
        for var, arr in sub.items()
    }
    save_checkpoint(prefix, tensors)
