"""Delta + zigzag + bit-pack codec for sorted or sequential integer data
(timestamps, auto-increment keys, cumulative counters).

New relative to the reference (parsyl/parquet explicitly does not support
delta encodings, /root/reference/README.md:13-15). All arithmetic runs in
uint64 wrap-around space so INT64_MIN/MAX extremes and uint64 inputs are
exact — the same overflow discipline as forbp.py.

Body layout:
    u8  width          bit width of the zigzag deltas
    u64 first          first value (raw LE, wrap-space)
    bitpack(zigzag(delta[i] = v[i+1] - v[i]), width)   n-1 values
"""

from __future__ import annotations

import struct

import numpy as np

from parquet_spark.codecs import bitpack
from parquet_spark.util import bit_length

_HDR = struct.Struct("<BQ")


def encode(vals: np.ndarray) -> bytes:
    v = np.ascontiguousarray(vals)
    if v.dtype.kind == "i":
        u = v.astype(np.int64, copy=False).view(np.uint64)
    else:
        u = v.astype(np.uint64, copy=False)
    n = len(u)
    if n == 0:
        return _HDR.pack(0, 0)
    du = u[1:] - u[:-1]  # wrap-around deltas
    d = du.view(np.int64)
    zz = ((d << np.int64(1)) ^ (d >> np.int64(63))).view(np.uint64)
    width = bit_length(int(zz.max())) if len(zz) else 0
    return _HDR.pack(width, int(u[0])) + bitpack.pack(zz, width)


def decode(buf: bytes | memoryview, n: int, dtype: np.dtype) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=dtype)
    width, first = _HDR.unpack_from(buf, 0)
    zz = bitpack.unpack(memoryview(buf)[_HDR.size :], n - 1, width)
    d = (zz >> np.uint64(1)).view(np.int64) ^ -(zz & np.uint64(1)).view(np.int64)
    out = np.empty(n, dtype=np.uint64)
    out[0] = first
    np.cumsum(d.view(np.uint64), out=out[1:])  # wraps mod 2^64 by dtype
    out[1:] += np.uint64(first)
    if np.dtype(dtype) == np.uint64:
        return out
    return out.view(np.int64).astype(dtype, copy=False)
