"""Golden byte fixtures from the reference bitpack tests
(/root/reference/internal/bitpack/bitpack_test.go:19-43, recorded in
FIXTURES.md F6) plus generalized round-trips at every width."""

import numpy as np
import pytest

from parquet_spark.codecs import bitpack


def bits(s: str) -> bytes:
    """'10001000 11000110' -> bytes; each group is one byte written MSB-left
    (the Go test's binary literal convention)."""
    return bytes(int(g, 2) for g in s.split())


def test_golden_width1():
    # {0,1,1,0,0,1,1,1} -> 0b11100110 (bitpack_test.go:21-26)
    vals = np.array([0, 1, 1, 0, 0, 1, 1, 1], dtype=np.uint64)
    assert bitpack.pack(vals, 1) == bits("11100110")
    assert list(bitpack.unpack(bits("11100110"), 8, 1)) == list(vals)


def test_golden_width2():
    vals = np.array([0, 1, 2, 0, 0, 1, 2, 2], dtype=np.uint64)
    assert bitpack.pack(vals, 2) == bits("00100100 10100100")


def test_golden_width3_apache_doc():
    # the Apache Parquet documentation example (bitpack_test.go:33-38)
    vals = np.arange(8, dtype=np.uint64)
    assert bitpack.pack(vals, 3) == bits("10001000 11000110 11111010")
    assert list(bitpack.unpack(bits("10001000 11000110 11111010"), 8, 3)) == list(range(8))


@pytest.mark.parametrize("width", [1, 2, 3, 4, 5, 7, 8, 11, 13, 16, 17, 20, 31, 32, 33, 63, 64])
def test_roundtrip_random(width):
    rng = np.random.default_rng(42 + width)
    hi = (1 << width) - 1
    n = 1000
    vals = rng.integers(0, hi, size=n, endpoint=True, dtype=np.uint64)
    buf = bitpack.pack(vals, width)
    assert len(buf) == bitpack.packed_size(n, width)
    out = bitpack.unpack(buf, n, width)
    np.testing.assert_array_equal(out, vals)


def test_roundtrip_non_multiple_of_8():
    vals = np.array([5, 0, 7, 3, 1], dtype=np.uint64)
    out = bitpack.unpack(bitpack.pack(vals, 3), 5, 3)
    np.testing.assert_array_equal(out, vals)


def test_width_zero_and_empty():
    assert bitpack.pack(np.array([], dtype=np.uint64), 3) == b""
    assert bitpack.pack(np.array([0, 0], dtype=np.uint64), 0) == b""
    assert list(bitpack.unpack(b"", 4, 0)) == [0, 0, 0, 0]


def test_extreme_uint64():
    vals = np.array([2**64 - 1, 0, 2**64 - 100], dtype=np.uint64)
    out = bitpack.unpack(bitpack.pack(vals, 64), 3, 64)
    np.testing.assert_array_equal(out, vals)
