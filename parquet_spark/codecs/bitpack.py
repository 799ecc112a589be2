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

_WEIGHTS_CACHE: dict[int, np.ndarray] = {}


def _weights(width: int) -> np.ndarray:
    w = _WEIGHTS_CACHE.get(width)
    if w is None:
        w = (np.uint64(1) << np.arange(width, dtype=np.uint64)).astype(np.uint64)
        _WEIGHTS_CACHE[width] = w
    return w


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
    # General path: explode to a (n, width) bit matrix, pack LSB-first.
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


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
    bits = np.unpackbits(raw, count=n * width, bitorder="little")
    mat = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return np.bitwise_or.reduce(mat << shifts, axis=1)


def packed_size(n: int, width: int) -> int:
    return (n * width + 7) // 8
