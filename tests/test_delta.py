"""delta_bp codec: delta + zigzag + bit-pack for sorted/sequential data
(new vs the reference — it explicitly does not support delta encodings,
/root/reference/README.md:13-15). Wrap-around uint64 arithmetic makes
INT64 extremes exact."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_spark.codecs import blocks as blk, delta
from parquet_spark.stats import analyze, chooser


@pytest.mark.parametrize("dtype", [np.int32, np.int64, np.uint32, np.uint64])
def test_roundtrip_sorted(dtype):
    vals = np.cumsum(np.random.default_rng(1).integers(0, 50, 10000)).astype(dtype)
    out = delta.decode(delta.encode(vals), len(vals), dtype)
    assert np.array_equal(out, vals)


def test_roundtrip_unsorted_and_negative_deltas():
    vals = np.random.default_rng(2).integers(-(2**40), 2**40, 5000).astype(np.int64)
    out = delta.decode(delta.encode(vals), len(vals), np.int64)
    assert np.array_equal(out, vals)


def test_int64_extremes():
    vals = np.array([-(2**63), 2**63 - 1, 0, -1, 2**63 - 1, -(2**63)], dtype=np.int64)
    out = delta.decode(delta.encode(vals), len(vals), np.int64)
    assert np.array_equal(out, vals)


def test_uint64_extremes():
    vals = np.array([0, 2**64 - 1, 1, 2**64 - 2], dtype=np.uint64)
    out = delta.decode(delta.encode(vals), len(vals), np.uint64)
    assert np.array_equal(out, vals)


def test_empty_and_single():
    assert len(delta.decode(delta.encode(np.zeros(0, np.int64)), 0, np.int64)) == 0
    one = np.array([42], np.int64)
    assert np.array_equal(delta.decode(delta.encode(one), 1, np.int64), one)


def test_sorted_data_compresses_hard():
    vals = (np.arange(100000, dtype=np.int64) * 1000 + 10**15)  # timestamps-ish
    enc = delta.encode(vals)
    # constant delta 1000 -> zigzag 2000 -> 11 bits/value vs 64 plain
    assert len(enc) < len(vals) * 2


def test_chooser_picks_delta_for_sorted():
    vals = np.cumsum(np.random.default_rng(3).integers(1, 100, 50000)).astype(np.int64)
    st = analyze.block_stats(vals)
    assert chooser.choose_int_codec(st, 8) == "delta_bp"


def test_chooser_ignores_delta_for_random():
    vals = np.random.default_rng(4).integers(0, 2**31, 50000).astype(np.int64)
    st = analyze.block_stats(vals)
    assert chooser.choose_int_codec(st, 8) != "delta_bp"


def test_block_container_auto_picks_delta():
    vals = np.cumsum(np.random.default_rng(5).integers(0, 20, 30000)).astype(np.int64)
    arr = pa.array(vals)
    buf = blk.encode_array(arr)
    assert blk.describe(buf)["codec"] == "delta_bp"
    assert blk.decode_array(buf).equals(arr)


def test_block_container_forced_delta_with_nulls():
    vals = [1, 2, None, 3, 5, None, 8]
    arr = pa.array(vals, pa.int64())
    buf = blk.encode_array(arr, codec="delta_bp")
    assert blk.decode_array(buf).equals(arr)
