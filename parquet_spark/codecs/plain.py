"""PLAIN encode/decode: little-endian fixed-width numerics, 1-bit booleans,
and byte-array strings.

Byte formats mirror the reference:
- numerics: LE fixed width concat (/root/reference/cmd/parquetgen/gen/
  template_required.go:37-48 encode, :25-35 decode)
- booleans: 1 bit per value, LSB-first within each byte
  (/root/reference/cmd/parquetgen/gen/template_bool.go:24-36;
  decode /root/reference/parquet.go:455-505)
- strings (reference parity format): per value `uint32 LE length + bytes`
  (/root/reference/cmd/parquetgen/gen/template_string.go:29-36)

The engine-internal string format is Arrow-style (int32 offsets block +
data block) because it decodes fully vectorized; the reference
length-prefixed format is kept for byte-level parity fixtures.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------- numerics

def encode_numeric(arr: np.ndarray) -> bytes:
    """Fixed-width little-endian concat. NaN payloads are preserved
    bit-identically (we never round-trip through Python floats)."""
    a = np.ascontiguousarray(arr)
    le = a.astype(a.dtype.newbyteorder("<"), copy=False)
    return le.tobytes()


def decode_numeric(buf: bytes | memoryview, n: int, dtype: np.dtype) -> np.ndarray:
    dt = np.dtype(dtype).newbyteorder("<")
    out = np.frombuffer(buf, dtype=dt, count=n)
    return out.astype(dtype, copy=False)


# ---------------------------------------------------------------- booleans

def encode_bool(arr: np.ndarray) -> bytes:
    """1 bit/value, LSB-first: rawBuf[i/8] |= 1 << (i%8)."""
    return np.packbits(np.asarray(arr, dtype=bool), bitorder="little").tobytes()


def decode_bool(buf: bytes | memoryview, n: int) -> np.ndarray:
    return np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=n, bitorder="little"
    ).astype(bool)


# ------------------------------------------------- strings (engine format)

def encode_strings_offsets(offsets: np.ndarray, data: np.ndarray) -> tuple[bytes, bytes]:
    """Arrow-style: (int32 offsets incl. trailing end, raw utf8 bytes)."""
    off = np.ascontiguousarray(offsets, dtype="<i4")
    return off.tobytes(), np.ascontiguousarray(data, dtype=np.uint8).tobytes()


def decode_strings_offsets(off_buf: bytes, data_buf: bytes, n: int) -> tuple[np.ndarray, np.ndarray]:
    offsets = np.frombuffer(off_buf, dtype="<i4", count=n + 1).astype(np.int32, copy=False)
    data = np.frombuffer(data_buf, dtype=np.uint8)
    return offsets, data


# ---------------------------------------- strings (reference parity format)

def encode_strings_ref(values: list[bytes]) -> bytes:
    """`uint32 LE length + bytes` per value — vectorized over the whole
    column (no per-string Python in the byte assembly)."""
    n = len(values)
    if n == 0:
        return b""
    lens = np.fromiter((len(v) for v in values), dtype=np.int64, count=n)
    data = np.frombuffer(b"".join(values), dtype=np.uint8)
    total = int(lens.sum()) + 4 * n
    out = np.empty(total, dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1] + 4, out=starts[1:])
    l32 = lens.astype(np.uint32)
    for k in range(4):  # 4 byte lanes of the length prefix, each vectorized
        out[starts + k] = ((l32 >> (8 * k)) & 0xFF).astype(np.uint8)
    src_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=src_starts[1:])
    if data.size:
        tgt = np.repeat(starts + 4, lens) + (np.arange(data.size) - np.repeat(src_starts, lens))
        out[tgt] = data
    return out.tobytes()


def decode_strings_ref(buf: bytes, n: int) -> list[bytes]:
    """Parity-fixture decode (sequential length walk — test/fixture use only;
    the engine's hot path uses the offsets format above)."""
    out: list[bytes] = []
    pos = 0
    mv = memoryview(buf)
    for _ in range(n):
        ln = int.from_bytes(mv[pos : pos + 4], "little")
        pos += 4
        out.append(bytes(mv[pos : pos + ln]))
        pos += ln
    return out
