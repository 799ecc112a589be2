"""Vectorized bit-packing at any width 0..64, LSB-first (Parquet layout).

The reference only supports widths 1..4 via unrolled generated Go
(/root/reference/internal/bitpack/bitpack.go:22-141, generator
/root/reference/cmd/bitpackgen/main.go:19-61). This kernel is generic over
width and fully vectorized in numpy; for widths 1..4 and value counts that
are a multiple of 8 its output is byte-identical to the reference's
``bitpack.Pack`` (bits of each value written LSB-first into a little-endian
bit stream) — verified by the golden fixtures in tests/test_bitpack.py.
"""

from __future__ import annotations

import numpy as np


def pack(vals: np.ndarray, width: int) -> bytes:
    """Pack unsigned values into ceil(n*width/8) bytes, LSB-first.

    ``vals`` must already fit in ``width`` bits (values are masked, matching
    the reference's ``vals[i] & mask`` behaviour).
    """
    if width < 0 or width > 64:
        raise ValueError(f"width {width} out of range 0..64")
    n = len(vals)
    if width == 0 or n == 0:
        return b""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    # Fast paths: width equals a native lane size -> direct little-endian view.
    if width in (8, 16, 32, 64):
        dt = {8: "<u1", 16: "<u2", 32: "<u4", 64: "<u8"}[width]
        return v.astype(dt).tobytes()
    # General path, group-of-8 word assembly: 8 values span exactly `width`
    # output bytes, so each of the width byte lanes is one vectorized OR of
    # the (at most ceil(8/width)+1) source values overlapping it. Total
    # memory traffic ~ (width+8) passes over n/8-element arrays — about 8x
    # less than exploding an (n, width) bit matrix.
    n_bytes = (n * width + 7) // 8
    m = (n + 7) // 8
    if n % 8:
        v = np.concatenate([v, np.zeros(8 - n % 8, dtype=np.uint64)])
    # contiguous (8, m) rows: one transpose copy up front beats strided
    # column reads in every lane op
    g = np.ascontiguousarray(v.reshape(m, 8).T) & np.uint64((1 << width) - 1)
    out = np.zeros((width, m), dtype=np.uint8)
    for j in range(width):  # byte lane j covers stream bits [8j, 8j+8)
        lane = np.zeros(m, dtype=np.uint64)
        i0, i1 = (8 * j) // width, min((8 * j + 7) // width, 7)
        for i in range(i0, i1 + 1):
            off = 8 * j - i * width  # bit offset of lane start within value i
            lane |= (g[i] >> np.uint64(off)) if off >= 0 else (g[i] << np.uint64(-off))
        out[j] = lane.astype(np.uint8)
    return np.ascontiguousarray(out.T).tobytes()[:n_bytes]


def unpack(buf: bytes | np.ndarray, n: int, width: int) -> np.ndarray:
    """Unpack ``n`` values of ``width`` bits from an LSB-first bit stream.

    Returns uint64. Inverse of :func:`pack`; also decodes the reference's
    ``bitpack.Unpack`` output for widths 1..4
    (/root/reference/internal/bitpack/bitpack.go:76-141).
    """
    if width < 0 or width > 64:
        raise ValueError(f"width {width} out of range 0..64")
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    if width in (8, 16, 32, 64):
        dt = {8: "<u1", 16: "<u2", 32: "<u4", 64: "<u8"}[width]
        nbytes = n * (width // 8)
        return raw[:nbytes].view(dt)[:n].astype(np.uint64)
    # group-of-8 word assembly (inverse of pack's general path): value i of
    # a group ORs together the <= width//8 + 2 stream bytes overlapping it
    n_bytes = (n * width + 7) // 8
    m = (n + 7) // 8
    raw = raw[:n_bytes]
    if len(raw) < m * width:
        raw = np.concatenate([raw, np.zeros(m * width - len(raw), dtype=np.uint8)])
    # contiguous (width, m) rows, widened once to uint64 for the shifts
    g = np.ascontiguousarray(raw.reshape(m, width).T).astype(np.uint64)
    mask = np.uint64((1 << width) - 1)
    out = np.zeros((8, m), dtype=np.uint64)
    for i in range(8):  # value i spans stream bits [i*width, (i+1)*width)
        acc = np.zeros(m, dtype=np.uint64)
        b0, b1 = (i * width) // 8, ((i + 1) * width - 1) // 8
        for b in range(b0, b1 + 1):
            off = 8 * b - i * width  # bit offset of byte b within value i
            acc |= (g[b] << np.uint64(off)) if off >= 0 else (g[b] >> np.uint64(-off))
        out[i] = acc & mask
    return np.ascontiguousarray(out.T).reshape(-1)[:n]


def packed_size(n: int, width: int) -> int:
    return (n * width + 7) // 8
