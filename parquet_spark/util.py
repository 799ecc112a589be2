"""Shared low-level helpers: LEB128 varints, bit-length math, crc."""

from __future__ import annotations

import zlib

import numpy as np


def leb128_encode(value: int) -> bytes:
    """Unsigned LEB128, identical to the reference's writer
    (/root/reference/internal/rle/rle.go:130-137)."""
    if value < 0:
        raise ValueError("leb128 encodes unsigned ints only")
    out = bytearray()
    while value & ~0x7F:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value & 0x7F)
    return bytes(out)


def leb128_decode(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode one LEB128 varint from buf at pos; returns (value, new_pos).
    Mirrors /root/reference/internal/rle/rle.go:274-290."""
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def bit_length(value: int) -> int:
    """Bits needed to represent non-negative value (0 -> 0)."""
    if value < 0:
        raise ValueError("bit_length of negative value")
    return int(value).bit_length()


def crc32(buf: bytes) -> int:
    return zlib.crc32(buf) & 0xFFFFFFFF


def as_uint64(arr: np.ndarray) -> np.ndarray:
    """Reinterpret a signed integer array as uint64 (two's complement),
    widening first. Used for overflow-safe frame-of-reference deltas."""
    return arr.astype(np.int64, copy=False).view(np.uint64)
