"""PLAIN codec golden bytes + round-trips (reference formats E1-E5,
FIXTURES.md F6)."""

import math
import struct

import numpy as np

from parquet_spark.codecs import plain


def test_numeric_golden_le_int32():
    arr = np.array([1, -2, 256], dtype=np.int32)
    assert plain.encode_numeric(arr) == struct.pack("<iii", 1, -2, 256)
    np.testing.assert_array_equal(plain.decode_numeric(struct.pack("<iii", 1, -2, 256), 3, np.int32), arr)


def test_numeric_uint64_extremes():
    # mirrors the reference's MaxUint64 edge case (parquet_test.go:899-902)
    arr = np.array([2**64 - 1, 0, 2**64 - 100], dtype=np.uint64)
    out = plain.decode_numeric(plain.encode_numeric(arr), 3, np.uint64)
    np.testing.assert_array_equal(out, arr)


def test_float_nan_bit_identical():
    # NaN with a non-default payload must survive bit-identically
    weird_nan = np.frombuffer(struct.pack("<I", 0x7FC00123), dtype=np.float32)[0]
    arr = np.array([1.5, weird_nan, -0.0, math.inf], dtype=np.float32)
    out = plain.decode_numeric(plain.encode_numeric(arr), 4, np.float32)
    assert out.tobytes() == arr.tobytes()


def test_bool_golden_lsb_first():
    # template_bool.go:24-36: rawBuf[i/8] |= 1 << (i%8)
    arr = np.array([1, 0, 0, 1, 1, 1, 0, 0, 1], dtype=bool)
    buf = plain.encode_bool(arr)
    assert buf == bytes([0b00111001, 0b00000001])
    np.testing.assert_array_equal(plain.decode_bool(buf, 9), arr)


def test_strings_ref_golden():
    # template_string.go:29-36: uint32 LE length + bytes
    vals = [b"ab", b"", b"xyz"]
    buf = plain.encode_strings_ref(vals)
    assert buf == b"\x02\x00\x00\x00ab\x00\x00\x00\x00\x03\x00\x00\x00xyz"
    assert plain.decode_strings_ref(buf, 3) == vals


def test_strings_ref_roundtrip_large():
    rng = np.random.default_rng(42)
    vals = [bytes(rng.integers(0, 256, size=int(rng.integers(0, 50)), dtype=np.uint8)) for _ in range(500)]
    assert plain.decode_strings_ref(plain.encode_strings_ref(vals), 500) == vals


def test_strings_offsets_roundtrip():
    data = np.frombuffer(b"hellospark", dtype=np.uint8)
    offsets = np.array([0, 5, 5, 10], dtype=np.int32)
    ob, db = plain.encode_strings_offsets(offsets, data)
    off2, data2 = plain.decode_strings_offsets(ob, db, 3)
    np.testing.assert_array_equal(off2, offsets)
    np.testing.assert_array_equal(data2, data)
