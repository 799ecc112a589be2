"""Parquet RLE / bit-packed hybrid codec, generalized to width 0..32 and
vectorized.

Stream layout (identical to the Parquet spec and to the reference at widths
≤4, /root/reference/internal/rle/rle.go):

    int32 LE total payload length
    repeated either:
      LEB128(count << 1)        + value padded LE to ceil(width/8) bytes   (RLE run)
      LEB128((groups << 1) | 1) + groups × width bytes of 8-value bit-pack (bit-packed)

Differences from the reference encoder (decode-compatible, not byte-
identical): the reference caps bit-packed runs at 63 groups and detects runs
with a per-value state machine (rle.go:48-96); this encoder finds runs
vectorized (np.diff) and emits unbounded-group bit-packed regions. A
byte-exact port of the reference's state machine lives in rle_ref.py for the
golden parity fixtures; this module's decoder reads both encoders' output.
"""

from __future__ import annotations

import struct

import numpy as np

from parquet_spark.codecs import bitpack
from parquet_spark.util import leb128_decode, leb128_encode

MIN_RLE_RUN = 8  # same threshold as the reference (rle.go:50-56)

# Emission walks regions in a Python loop; data with pathologically many
# short runs (e.g. bursty token streams) would otherwise cost O(runs)
# interpreter time for marginal size gain. Keeping only the longest runs
# bounds the loop — long runs carry nearly all the RLE savings.
MAX_RLE_REGIONS = 4096


def _value_bytes(value: int, width: int) -> bytes:
    nbytes = (width + 7) // 8
    return int(value).to_bytes(nbytes, "little")


def encode(vals: np.ndarray, width: int) -> bytes:
    """Encode unsigned values (must fit ``width`` bits) to the hybrid stream."""
    if width < 0 or width > 32:
        raise ValueError(f"width {width} out of range 0..32 for RLE hybrid")
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    n = len(v)
    parts: list[bytes] = []

    def emit_bitpacked(seg: np.ndarray, pad_to_8: bool) -> None:
        m = len(seg)
        if m == 0:
            return
        if m % 8:
            if not pad_to_8:
                raise AssertionError("interior bit-pack region not 8-aligned")
            seg = np.concatenate([seg, np.zeros(8 - m % 8, dtype=np.uint64)])
        groups = len(seg) // 8
        parts.append(leb128_encode((groups << 1) | 1))
        parts.append(bitpack.pack(seg, width))

    def emit_rle(value: int, count: int) -> None:
        parts.append(leb128_encode(count << 1))
        parts.append(_value_bytes(value, width))

    if n:
        # vectorized run detection
        change = np.flatnonzero(np.diff(v)) + 1
        starts = np.concatenate(([0], change))
        lens = np.diff(np.concatenate((starts, [n])))
        rvals = v[starts]
        pos = 0
        qual = np.flatnonzero(lens >= MIN_RLE_RUN)
        if len(qual) > MAX_RLE_REGIONS:
            # take exactly the MAX_RLE_REGIONS longest runs (argpartition
            # indices, not a >=threshold filter — ties at the threshold
            # would otherwise keep arbitrarily many regions and void the
            # O(MAX_RLE_REGIONS) interpreter-time bound)
            top = np.argpartition(lens[qual], len(qual) - MAX_RLE_REGIONS)[len(qual) - MAX_RLE_REGIONS:]
            qual = np.sort(qual[top])
        for i in qual:
            s, ln = int(starts[i]), int(lens[i])
            if s < pos:  # head of this run was borrowed into the previous region
                ln -= pos - s
                s = pos
                if ln < MIN_RLE_RUN:
                    continue
            gap = s - pos
            borrow = (-gap) % 8  # align the bit-pack region to 8 values
            if ln - borrow < MIN_RLE_RUN:
                continue  # run too short once borrowed — swallow into bit-pack
            emit_bitpacked(v[pos : s + borrow], pad_to_8=False)
            emit_rle(int(rvals[i]), ln - borrow)
            pos = s + ln
        emit_bitpacked(v[pos:], pad_to_8=True)  # tail, zero-padded like rle.go:142-151

    payload = b"".join(parts)
    return struct.pack("<i", len(payload)) + payload


def decode(buf: bytes | memoryview, n: int, width: int) -> tuple[np.ndarray, int]:
    """Decode ``n`` values; returns (uint64 array, bytes consumed incl. the
    4-byte length prefix). Reads both this encoder's and the reference
    encoder's output (rle.go:159-230)."""
    mv = memoryview(buf)
    (length,) = struct.unpack_from("<i", mv, 0)
    payload = bytes(mv[4 : 4 + length])
    pos = 0
    parts: list[np.ndarray] = []
    got = 0
    while pos < len(payload) and got < n:
        header, pos = leb128_decode(payload, pos)
        if header & 1:
            groups = header >> 1
            nbytes = bitpack.packed_size(groups * 8, width)
            vals = bitpack.unpack(payload[pos : pos + nbytes], groups * 8, width)
            pos += nbytes
        else:
            count = header >> 1
            vbytes = (width + 7) // 8
            value = int.from_bytes(payload[pos : pos + vbytes], "little")
            pos += vbytes
            vals = np.full(count, value, dtype=np.uint64)
        parts.append(vals)
        got += len(vals)
    if got < n:
        raise ValueError(f"RLE stream exhausted: wanted {n} values, got {got}")
    if not parts:
        return np.zeros(0, dtype=np.uint64), length + 4
    out = parts[0] if len(parts) == 1 else np.concatenate(parts)
    return out[:n], length + 4
