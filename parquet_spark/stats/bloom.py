"""Per-block Bloom filters for string-equality block pruning.

min/max block stats (the reference's page statistics,
/root/reference/parquet.go:164-169) prune range predicates well but are
useless for equality on high-cardinality unsorted string columns — every
block's [min, max] spans the probe. The Parquet format itself specifies
split-block bloom filters for this (parquet-format BloomFilter.md); the
reference never writes them. Here: an opt-in per-(block, column) filter
stored as a binary column of the blocks parquet, consumed by
read_encoded's '=' / 'in' pruning.

Design constraints:
- DETERMINISTIC FOREVER. A table format must hash identically across
  environments and library versions, so the hashes are crc32-based
  (zlib's crc32 is frozen by spec), combined Kirsch-Mitzenmacher style:
  g_i(v) = h1(v) + i*h2(v). crc32 is not a great hash, but with two
  independent streams and k=4 over >=10 bits/value the measured false-
  positive rate is ~1-3%, which is ample for block pruning (a FP merely
  decodes one extra block).
- Power-of-two sizing from the block's value count (an upper bound on
  ndv): bits = clamp(10 * n, MIN_BITS, MAX_BITS). At the 16k-row default
  block size the cap is 16 KiB per (block, column) — ~1 byte/row, opt-in
  and only sane for columns that are equality-probed.
"""

from __future__ import annotations

import zlib

import numpy as np

K = 4
MIN_BITS = 2048
MAX_BITS = 131072  # 16 KiB
_H2_SEED = 0x9E3779B9  # golden-ratio start crc for the second stream


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 1).bit_length()


def build(values: list[bytes]) -> bytes:
    """Filter bytes for one block's non-null values ('' for no values —
    an all-null block contains nothing)."""
    n = len(values)
    if n == 0:
        return b""
    bits = min(max(_next_pow2(10 * n), MIN_BITS), MAX_BITS)
    mask = np.uint64(bits - 1)
    h1 = np.fromiter((zlib.crc32(v) for v in values), np.uint64, count=n)
    h2 = np.fromiter((zlib.crc32(v, _H2_SEED) for v in values), np.uint64, count=n) | np.uint64(1)
    filt = np.zeros(bits >> 3, np.uint8)
    for i in range(K):
        idx = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(filt, (idx >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)))
    return filt.tobytes()


def maybe_contains(filt: bytes, value: bytes) -> bool:
    """May the block contain `value`? False negatives are impossible;
    false positives only cost a wasted block decode."""
    if not filt:
        return False
    mask = (len(filt) << 3) - 1
    h1 = zlib.crc32(value)
    h2 = zlib.crc32(value, _H2_SEED) | 1
    for i in range(K):
        idx = (h1 + i * h2) & mask
        if not (filt[idx >> 3] >> (idx & 7)) & 1:
            return False
    return True
