"""Codec auto-selection against constructed distributions (SURVEY.md §7
Phase 2)."""

import numpy as np

from parquet_spark.stats import analyze, chooser


def test_low_ndv_picks_dict():
    vals = np.random.default_rng(1).choice(np.arange(8, dtype=np.int64) * 10**9, size=10000)
    st = analyze.block_stats(vals)
    assert chooser.choose_int_codec(st, 8) == "dict"


def test_long_runs_pick_rle():
    vals = np.repeat(np.arange(10, dtype=np.int32) * 1000, 1000)
    st = analyze.block_stats(vals)
    assert chooser.choose_int_codec(st, 4) == "rle"


def test_narrow_range_picks_for_bp():
    vals = np.random.default_rng(2).integers(5_000_000, 5_000_064, size=10000).astype(np.int64)
    st = analyze.block_stats(vals)
    assert chooser.choose_int_codec(st, 8) == "for_bp"


def test_full_range_random_picks_plain_or_for():
    vals = np.random.default_rng(3).integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max, size=10000)
    st = analyze.block_stats(vals)
    assert chooser.choose_int_codec(st, 8) in ("plain", "for_bp")


def test_string_low_ndv_dict():
    vals = [b"click", b"view", b"error"] * 2000
    lens = np.array([len(v) for v in vals])
    off = np.zeros(len(vals) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    data = np.frombuffer(b"".join(vals), np.uint8)
    st = analyze.string_stats(off, data)
    assert chooser.choose_string_codec(st) == "dict"


def test_string_unique_ids():
    """High-cardinality ids: plain (+ the container's zstd trial) on the
    default path — measured 15-50x faster AND smaller than fsst+zstd;
    fsst only when general compression is disabled (random-access
    storage) or explicitly requested."""
    vals = [f"src{i % 20}-{i:012d}".encode() for i in range(5000)]
    lens = np.array([len(v) for v in vals])
    off = np.zeros(len(vals) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    data = np.frombuffer(b"".join(vals), np.uint8)
    st = analyze.string_stats(off, data)
    assert chooser.choose_string_codec(st) == "plain"
    assert chooser.choose_string_codec(st, general_compression=False) == "fsst"
