"""Round-trips and edge cases for the codecs the reference lacks
(dictionary, frame-of-reference, FSST — /root/reference/README.md:13-15
explicitly excludes dictionary/delta encodings)."""

import numpy as np
import pytest

from parquet_spark.codecs import dictionary, forbp, fsst, plain


# ------------------------------------------------------------- dictionary

def test_dict_numeric_roundtrip():
    rng = np.random.default_rng(42)
    arr = rng.choice(np.array([3, 7, 9, 1000, -5], dtype=np.int32), size=5000)
    buf = dictionary.encode_numeric(arr)
    out = dictionary.decode_numeric(buf, len(arr), np.int32)
    np.testing.assert_array_equal(out, arr)
    assert len(buf) < arr.nbytes / 2  # low ndv must actually compress


def test_dict_numeric_sorted_collapses_to_rle():
    arr = np.repeat(np.array([1, 2, 3], dtype=np.int64), 10000)
    buf = dictionary.encode_numeric(arr)
    assert len(buf) < 200  # 3 runs -> tiny
    np.testing.assert_array_equal(dictionary.decode_numeric(buf, len(arr), np.int64), arr)


def test_dict_numeric_single_and_empty():
    one = np.array([42], dtype=np.int32)
    np.testing.assert_array_equal(dictionary.decode_numeric(dictionary.encode_numeric(one), 1, np.int32), one)
    empty = np.array([], dtype=np.int32)
    np.testing.assert_array_equal(dictionary.decode_numeric(dictionary.encode_numeric(empty), 0, np.int32), empty)


def _str_col(values: list[bytes]):
    lens = np.array([len(v) for v in values], dtype=np.int64)
    offsets = np.zeros(len(values) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    data = np.frombuffer(b"".join(values), dtype=np.uint8)
    return offsets, data


def _to_strs(offsets, data) -> list[bytes]:
    b = data.tobytes()
    return [b[offsets[i] : offsets[i + 1]] for i in range(len(offsets) - 1)]


def test_dict_strings_roundtrip():
    vals = [b"click", b"view", b"click", b"", b"purchase", b"view"] * 500
    offsets, data = _str_col(vals)
    buf = dictionary.encode_strings(offsets, data)
    off2, data2 = dictionary.decode_strings(buf, len(vals))
    assert _to_strs(off2, data2) == vals
    assert len(buf) < len(data) / 2


# ------------------------------------------------- frame of reference + bp

@pytest.mark.parametrize("dtype", [np.int32, np.int64, np.uint32, np.uint64])
def test_forbp_roundtrip(dtype):
    rng = np.random.default_rng(1)
    arr = (rng.integers(1_000_000, 1_000_900, size=3000)).astype(dtype)
    buf = forbp.encode(arr)
    out = forbp.decode(buf, len(arr), dtype)
    np.testing.assert_array_equal(out, arr)
    assert len(buf) < arr.nbytes / 2  # narrow range must compress


def test_forbp_int64_extremes():
    arr = np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max, 0, -1], dtype=np.int64)
    out = forbp.decode(forbp.encode(arr), 4, np.int64)
    np.testing.assert_array_equal(out, arr)


def test_forbp_uint64_extremes():
    # mirrors reference MaxUint64 edge case (parquet_test.go:899-902)
    arr = np.array([2**64 - 1, 2**64 - 100, 2**63, 0], dtype=np.uint64)
    out = forbp.decode(forbp.encode(arr), 4, np.uint64)
    np.testing.assert_array_equal(out, arr)


def test_forbp_constant_column():
    arr = np.full(10000, -77, dtype=np.int32)
    buf = forbp.encode(arr)
    assert len(buf) == 9  # min + width 0, no payload
    np.testing.assert_array_equal(forbp.decode(buf, len(arr), np.int32), arr)


def test_forbp_empty():
    arr = np.array([], dtype=np.int64)
    np.testing.assert_array_equal(forbp.decode(forbp.encode(arr), 0, np.int64), arr)


# ------------------------------------------------------------------- fsst

def test_fsst_roundtrip_repetitive_text():
    text = (b"the quick brown fox jumps over the lazy dog " * 400)
    data = np.frombuffer(text, dtype=np.uint8)
    buf = fsst.encode(data)
    out = fsst.decode(buf, len(data))
    assert out.tobytes() == text
    assert len(buf) < len(text) / 2  # repetitive text must compress well


def test_fsst_roundtrip_shared_prefixes():
    # doc_id-like strings with shared prefixes (FIXTURES.md F1)
    ids = b"".join(b"src%d-%012d" % (i % 20, i) for i in range(2000))
    data = np.frombuffer(ids, dtype=np.uint8)
    buf = fsst.encode(data)
    assert fsst.decode(buf, len(data)).tobytes() == ids
    assert len(buf) < len(ids)


def test_fsst_roundtrip_binary_with_escapes():
    # bytes incl. 0xFF (the escape byte) and full range
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=20000, dtype=np.uint8).astype(np.uint8)
    data[::7] = 255  # plenty of escape-byte literals, incl. adjacent runs
    data[100:140] = 255
    buf = fsst.encode(data)
    out = fsst.decode(buf, len(data))
    np.testing.assert_array_equal(out, data)


def test_fsst_empty_and_tiny():
    empty = np.zeros(0, dtype=np.uint8)
    assert fsst.decode(fsst.encode(empty), 0).size == 0
    one = np.array([65], dtype=np.uint8)
    assert fsst.decode(fsst.encode(one), 1).tobytes() == b"A"


def test_fsst_all_same_byte():
    data = np.full(10000, ord("x"), dtype=np.uint8)
    buf = fsst.encode(data)
    assert fsst.decode(buf, len(data)).tobytes() == data.tobytes()
    assert len(buf) < 2000  # xx->X, XX->Y, ... exponential coverage


def test_fsst_with_prebuilt_table():
    text = b"abcabcabcabc" * 100
    data = np.frombuffer(text, dtype=np.uint8)
    symbols = fsst.build_table(data[:200])
    buf = fsst.encode(data, symbols=symbols)
    assert fsst.decode(buf, len(data)).tobytes() == text
