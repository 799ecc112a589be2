"""Dictionary encoding: sorted unique key page + RLE/bit-packed indices.

New relative to the reference — parsyl/parquet explicitly does not support
dictionary encoding (/root/reference/README.md:13-15); it only vendors the
thrift enum (/root/reference/schema/parquet.thrift:400-460). Index stream
reuses the Parquet RLE/bit-packed hybrid (rle.py), so low-cardinality runs
(sorted or clustered data) collapse to RLE runs automatically.

Body layout:
    u32 n_keys
    u32 key_page_len + key page:
        numerics: PLAIN LE fixed width
        strings:  u32 n_bytes? no — int32 offsets (n_keys+1) then raw bytes
    RLE-hybrid index stream (self-delimiting via its length prefix)
"""

from __future__ import annotations

import struct

import numpy as np

from parquet_spark.codecs import plain, rle
from parquet_spark.util import bit_length


def encode_numeric(arr: np.ndarray) -> bytes:
    if len(arr) >= 1 << 16:
        # hash-based unique (arrow) beats sort-based np.unique ~4x on large
        # blocks; remap its first-occurrence codes onto sorted-key order so
        # the key page stays sorted (decode relies on nothing, but sorted
        # keys make clustered values yield monotone, RLE-friendly indices)
        import pyarrow as pa
        import pyarrow.compute as pc

        d = pc.dictionary_encode(pa.array(arr))
        raw_keys = np.asarray(d.dictionary)
        order = np.argsort(raw_keys, kind="stable")
        keys = raw_keys[order]
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = np.arange(len(order))
        inv = rank[np.asarray(d.indices, dtype=np.int64)]
    else:
        keys, inv = np.unique(arr, return_inverse=True)
    width = max(1, bit_length(len(keys) - 1)) if len(keys) else 1
    key_page = plain.encode_numeric(keys)
    idx = rle.encode(inv.astype(np.uint64, copy=False), width)
    return struct.pack("<II", len(keys), len(key_page)) + key_page + idx


def decode_numeric(buf: bytes, n: int, dtype: np.dtype) -> np.ndarray:
    n_keys, key_len = struct.unpack_from("<II", buf, 0)
    keys = plain.decode_numeric(buf[8 : 8 + key_len], n_keys, dtype)
    width = max(1, bit_length(n_keys - 1)) if n_keys else 1
    inv, _ = rle.decode(memoryview(buf)[8 + key_len :], n, width)
    return keys[inv.astype(np.int64, copy=False)]


def encode_strings(offsets: np.ndarray, data: np.ndarray) -> bytes:
    """Dictionary over a string column given Arrow-style (offsets, utf8 data).

    Unique-ification is fully vectorized: rows are compared via a stable
    sort over (length, bytes) using numpy void views of padded rows when
    feasible, else via pyarrow's hash-based dictionary_encode.
    """
    import pyarrow as pa

    arr = pa.Array.from_buffers(
        pa.binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(np.ascontiguousarray(offsets, dtype="<i4").tobytes()), pa.py_buffer(np.ascontiguousarray(data, dtype=np.uint8).tobytes())],
    )
    dict_arr = arr.dictionary_encode()
    keys = dict_arr.dictionary  # BinaryArray of uniques (first-occurrence order)
    inv = np.asarray(dict_arr.indices, dtype=np.int64)
    k_off = np.asarray(keys.buffers()[1]).view("<i4")[: len(keys) + 1]
    kb = keys.buffers()[2]
    k_data = np.frombuffer(kb, dtype=np.uint8)[: int(k_off[-1])] if kb is not None else np.zeros(0, np.uint8)
    ob, db = plain.encode_strings_offsets(k_off.astype(np.int32), k_data)
    key_page = struct.pack("<I", len(ob)) + ob + db
    width = max(1, bit_length(len(keys) - 1)) if len(keys) else 1
    idx = rle.encode(inv.astype(np.uint64), width)
    return struct.pack("<II", len(keys), len(key_page)) + key_page + idx


def decode_strings(buf: bytes, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Returns Arrow-style (int32 offsets, uint8 data) for n values."""
    n_keys, key_len = struct.unpack_from("<II", buf, 0)
    key_page = memoryview(buf)[8 : 8 + key_len]
    (ob_len,) = struct.unpack_from("<I", key_page, 0)
    k_off, k_data = plain.decode_strings_offsets(
        bytes(key_page[4 : 4 + ob_len]), bytes(key_page[4 + ob_len :]), n_keys
    )
    width = max(1, bit_length(n_keys - 1)) if n_keys else 1
    inv, _ = rle.decode(memoryview(buf)[8 + key_len :], n, width)
    inv = inv.astype(np.int64, copy=False)
    # gather: out lengths then ragged byte copy, all vectorized
    key_lens = np.diff(k_off).astype(np.int64)
    out_lens = key_lens[inv]
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_offsets[1:])
    total = int(out_offsets[-1])
    out_data = np.empty(total, dtype=np.uint8)
    if total:
        # output bytes are contiguous; gather source positions in one shot
        src_starts = k_off[:-1].astype(np.int64)[inv]
        rel = np.arange(total) - np.repeat(out_offsets[:-1], out_lens)
        out_data = k_data[np.repeat(src_starts, out_lens) + rel]
    return out_offsets.astype(np.int32), out_data
