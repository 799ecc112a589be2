"""Frame-of-reference + bit-packing for integers.

New relative to the reference (no delta/FOR encodings there,
/root/reference/README.md:13-15). Subtract the block minimum, bit-pack the
non-negative deltas at the minimal width. All arithmetic is done in uint64
two's-complement so int64 extremes (e.g. the reference's MaxUint64-style
edge cases, /root/reference/parquet_test.go:899-902) cannot overflow.

Body layout: i64 LE reference (min) + u8 width + bit-packed deltas.
"""

from __future__ import annotations

import struct

import numpy as np

from parquet_spark.codecs import bitpack
from parquet_spark.util import as_uint64, bit_length


def encode(arr: np.ndarray) -> bytes:
    if arr.dtype == np.uint64:
        u = np.ascontiguousarray(arr)
    else:
        u = as_uint64(np.ascontiguousarray(arr))
    n = len(u)
    if n == 0:
        return struct.pack("<qB", 0, 0)
    signed = arr.dtype != np.uint64
    if signed:
        # min over the signed view, delta in wrapping uint64 space
        s = u.view(np.int64)
        vmin = int(s.min())
        vmax = int(s.max())
        umin = np.uint64(vmin & 0xFFFFFFFFFFFFFFFF)
    else:
        vmin = int(u.min())
        vmax = int(u.max())
        umin = np.uint64(vmin)
    deltas = u - umin  # wraps correctly in uint64
    width = bit_length(vmax - vmin)
    return struct.pack("<qB", vmin if signed else vmin - (1 << 64) * (vmin >> 63), width) + bitpack.pack(deltas, width)


def decode(buf: bytes, n: int, dtype: np.dtype) -> np.ndarray:
    vmin, width = struct.unpack_from("<qB", buf, 0)
    deltas = bitpack.unpack(memoryview(buf)[9:], n, width)
    out = deltas + np.uint64(vmin & 0xFFFFFFFFFFFFFFFF)  # wraps
    dt = np.dtype(dtype)
    if dt == np.uint64:
        return out
    return out.view(np.int64).astype(dt, copy=False)
