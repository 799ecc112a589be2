"""Parquet-spec DELTA_* and BYTE_STREAM_SPLIT page decoders.

Layouts are from the public parquet-format Encodings.md. These are the
write defaults of parquet-mr for v2 files (ints → DELTA_BINARY_PACKED,
strings → DELTA_BYTE_ARRAY), so reading them is what makes the raw
reader open files from the wider ecosystem, not just pyarrow/duckdb.
The reference has no analogue (it reads PLAIN/RLE only); cross-checked
against pyarrow's encoders via `column_encoding=` in the tests.

DELTA_BINARY_PACKED stream:
    <block size> <miniblocks per block> <total count> <first value: zigzag>
    then per block: <min delta: zigzag> <miniblock widths: 1 byte each>
                    <miniblocks: LSB-first bit-packed deltas, padded to
                     the full miniblock value count>
Trailing miniblocks of the last block that hold no values write a width
byte but no data. All arithmetic wraps modulo 2^64 (2^32 for INT32).

Shared kernels: the miniblock packing is the same LSB-first layout as the
RLE/bit-pack hybrid's bit-packed runs (codecs/bitpack.py, widths 0..64).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from parquet_spark.codecs import bitpack
from parquet_spark.util import leb128_decode

_MASK64 = (1 << 64) - 1


def _zigzag_decode(buf, pos: int) -> tuple[int, int]:
    u, pos = leb128_decode(buf, pos)
    return (u >> 1) ^ -(u & 1), pos


def decode_delta_binary_packed(body, pos: int) -> tuple[np.ndarray, int]:
    """Decode one DELTA_BINARY_PACKED run starting at `pos`.

    Returns (values as uint64 with wrap-around semantics, next position) —
    callers view/cast to the column's physical signed type."""
    block_size, pos = leb128_decode(body, pos)
    n_mini, pos = leb128_decode(body, pos)
    total, pos = leb128_decode(body, pos)
    if total == 0:
        return np.empty(0, np.uint64), pos
    first, pos = _zigzag_decode(body, pos)
    vpm = block_size // n_mini  # values per miniblock (spec: divisible)
    nd = total - 1
    deltas = np.empty(nd, np.uint64)
    got = 0
    while got < nd:
        min_delta, pos = _zigzag_decode(body, pos)
        md = np.uint64(min_delta & _MASK64)
        widths = bytes(body[pos : pos + n_mini])
        pos += n_mini
        for w in widths:
            if got >= nd:
                break  # unneeded trailing miniblocks carry no data
            nb = (vpm * w + 7) // 8
            vals = bitpack.unpack(body[pos : pos + nb], vpm, w)
            pos += nb
            take = min(vpm, nd - got)
            deltas[got : got + take] = vals[:take] + md  # uint64 wraps
            got += take
    out = np.empty(total, np.uint64)
    out[0] = first & _MASK64
    np.cumsum(deltas, out=deltas)
    out[1:] = deltas + np.uint64(first & _MASK64)
    return out, pos


def delta_bp_to_ints(body, pos: int, n: int, bits32: bool) -> np.ndarray:
    vals, _ = decode_delta_binary_packed(body, pos)
    if len(vals) != n:
        raise ValueError(f"DELTA_BINARY_PACKED count {len(vals)} != page dense count {n}")
    if bits32:
        return (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    return vals.view(np.int64)


def decode_delta_length_byte_array(body, pos: int, n: int) -> tuple[pa.Array, int]:
    """DELTA_LENGTH_BYTE_ARRAY: delta-packed lengths + concatenated bytes."""
    lens64, pos = decode_delta_binary_packed(body, pos)
    if len(lens64) != n:
        raise ValueError(f"DELTA_LENGTH count {len(lens64)} != page dense count {n}")
    lens = lens64.view(np.int64)
    offs = np.zeros(n + 1, np.int32)
    if n:
        offs[1:] = np.cumsum(lens).astype(np.int32)
    total = int(offs[-1])
    data = bytes(body[pos : pos + total])
    pos += total
    arr = pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data)]
    )
    return arr, pos


def decode_delta_byte_array(body, pos: int, n: int) -> pa.Array:
    """DELTA_BYTE_ARRAY (incremental/front coding): delta-packed prefix
    lengths, then suffixes as DELTA_LENGTH_BYTE_ARRAY. Reconstruction is
    inherently sequential (each value extends the previous one)."""
    plens64, pos = decode_delta_binary_packed(body, pos)
    if len(plens64) != n:
        raise ValueError(f"DELTA_BYTE_ARRAY count {len(plens64)} != page dense count {n}")
    suffixes, _ = decode_delta_length_byte_array(body, pos, n)
    plens = plens64.view(np.int64)
    out: list[bytes] = []
    prev = b""
    for i in range(n):
        prev = prev[: plens[i]] + suffixes[i].as_py()
        out.append(prev)
    return pa.array(out, pa.binary())


def decode_byte_stream_split(body, n: int, byte_width: int) -> bytes:
    """BYTE_STREAM_SPLIT: k planar byte streams → interleaved native bytes."""
    raw = np.frombuffer(body, np.uint8, count=n * byte_width)
    return np.ascontiguousarray(raw.reshape(byte_width, n).T).tobytes()
