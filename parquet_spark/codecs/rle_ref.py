"""Byte-exact port of the reference's RLE/bit-packed hybrid *encoder* state
machine (/root/reference/internal/rle/rle.go:34-156), widths 0..4.

PARITY FIXTURES ONLY — this is a sequential per-value loop, used exclusively
by the golden-byte pytest fixtures to prove the engine's generalized decoder
(parquet_spark.codecs.rle.decode) reads reference-produced streams and that
our def-level streams for `optional` columns match the reference byte for
byte. The engine's hot path uses the vectorized encoder in rle.py.

Reproduced reference semantics:
- run threshold 8 with the buffered-prefix quirk (rle.go:48-67): the first 7
  repeats sit in the bit-pack buffer; a buffer flush resets the run counter
- bit-packed runs capped at 63 groups with back-patched 1-byte headers
  (rle.go:69-96)
- final partial group zero-padded (rle.go:140-151)
- 4-byte LE total-length prefix (rle.go:153-155)
"""

from __future__ import annotations

import numpy as np

from parquet_spark.codecs import bitpack
from parquet_spark.util import leb128_encode


class RefRLE:
    def __init__(self, width: int):
        if width > 4:
            raise ValueError(f"bitwidth {width} is greater than 4 (highest supported)")
        self.width = width
        self.out = bytearray()
        self.prev = 0
        self.val_buf = [0] * 8
        self.buf_count = 0
        self.repeat_count = 0
        self.group_count = 0
        self.header_pointer = -1

    def write(self, value: int) -> None:  # rle.go:48-67
        if value == self.prev:
            self.repeat_count += 1
            if self.repeat_count >= 8:
                return
        else:
            if self.repeat_count >= 8:
                self._write_rle_run()
            self.repeat_count = 1
            self.prev = value
        self.val_buf[self.buf_count] = value
        self.buf_count += 1
        if self.buf_count == 8:
            self._write_or_append_bitpacked_run()

    def _write_or_append_bitpacked_run(self) -> None:  # rle.go:69-85
        if self.group_count >= 63:
            self._end_previous_bitpacked_run()
        if self.header_pointer == -1:
            self.out.append(0)
            self.header_pointer = len(self.out) - 1
        self.out += bitpack.pack(np.array(self.val_buf, dtype=np.uint64), self.width)
        self.buf_count = 0
        self.repeat_count = 0
        self.group_count += 1

    def _end_previous_bitpacked_run(self) -> None:  # rle.go:87-96
        if self.header_pointer == -1:
            return
        self.out[self.header_pointer] = (self.group_count << 1) | 1
        self.header_pointer = -1
        self.group_count = 0

    def _write_rle_run(self) -> None:  # rle.go:98-109
        self._end_previous_bitpacked_run()
        self.out += leb128_encode(self.repeat_count << 1)
        nbytes = (self.width + 7) // 8
        if nbytes:
            self.out += int(self.prev).to_bytes(nbytes, "little")
        self.repeat_count = 0
        self.buf_count = 0

    def bytes(self) -> bytes:  # rle.go:140-156
        if self.repeat_count >= 8:
            self._write_rle_run()
        elif self.buf_count > 0:
            for i in range(self.buf_count, 8):
                self.val_buf[i] = 0
            self._write_or_append_bitpacked_run()
            self._end_previous_bitpacked_run()
        else:
            self._end_previous_bitpacked_run()
        return len(self.out).to_bytes(4, "little") + bytes(self.out)


def encode_ref(vals, width: int) -> bytes:
    """Encode exactly as the reference would (fixture use)."""
    r = RefRLE(width)
    for v in vals:
        r.write(int(v))
    return r.bytes()
