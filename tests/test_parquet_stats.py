"""Column-chunk + page statistics in exported standards Parquet.

The reference stamps min/max/null-count into every DataPageHeader
(/root/reference/parquet.go:164-169; kernels gen/template_required.go:
71-113, string sentinel rules gen/template_string.go:82-136). Our writer
emits the same page-level bounds plus the merged ColumnMetaData
Statistics (field 12) and a TypeDefinedOrder column_orders list — the
combination foreign engines (duckdb, pyarrow, Spark, Trino) actually use
for row-group pruning. The skip test corrupts one row group's pages and
proves both duckdb and pyarrow never touch them when stats exclude the
range — the consumer-side scan saving the verdict asked to demonstrate.
"""
from __future__ import annotations

import decimal

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_spark.sources import parquet_raw as praw


def _chunk_stats(path, rg=0):
    md = pq.ParquetFile(path).metadata
    out = {}
    for ci in range(md.row_group(rg).num_columns):
        c = md.row_group(rg).column(ci)
        out[c.path_in_schema] = c.statistics
    return out


def test_chunk_stats_all_types(tmp_path):
    t = pa.table({
        "i32": pa.array([5, -3, None, 100], pa.int32()),
        "i64": pa.array([2**40, -7, 0, None], pa.int64()),
        "f64": pa.array([1.5, float("nan"), -0.0, 3.25], pa.float64()),
        "s": pa.array(["banana", "apple", None, "cherry"]),
        "b": pa.array([b"\x01\x02", b"\xff\x00", None, b"aa"], pa.binary()),
        "u64": pa.array([2**63 + 5, 3, 12, None], pa.uint64()),
        "dec": pa.array(
            [decimal.Decimal("12.34"), decimal.Decimal("-5.00"), None,
             decimal.Decimal("99.99")], pa.decimal128(10, 2)),
        "bool": pa.array([True, False, None, True]),
        "lst": pa.array([[1, 2], [0], None, [9]], pa.list_(pa.int64())),
    })
    p = str(tmp_path / "stats.parquet")
    praw.write_file(p, t, compression="snappy", use_dictionary=False)

    st = _chunk_stats(p)
    assert (st["i32"].min, st["i32"].max, st["i32"].null_count) == (-3, 100, 1)
    assert (st["i64"].min, st["i64"].max) == (-7, 2**40)
    # floats: NaN skipped, zero normalized to the -0.0 lower bound
    assert (st["f64"].min, st["f64"].max, st["f64"].null_count) == (-0.0, 3.25, 0)
    assert (st["s"].min, st["s"].max) == ("apple", "cherry")
    # unsigned byte order for raw binary
    assert (st["b"].min, st["b"].max) == (b"\x01\x02", b"\xff\x00")
    # UINT_64 annotation: unsigned order, not two's-complement signed
    assert (st["u64"].min, st["u64"].max) == (3, 2**63 + 5)
    assert (st["dec"].min, st["dec"].max) == (
        decimal.Decimal("-5.00"), decimal.Decimal("99.99"))
    assert (st["bool"].min, st["bool"].max) == (False, True)
    # list leaf: element-level bounds + absent-slot count
    assert (st["lst.list.element"].min, st["lst.list.element"].max) == (0, 9)

    # duckdb sees the same bounds through parquet_metadata()
    df = duckdb.sql(
        f"SELECT path_in_schema, stats_min_value, stats_max_value, stats_null_count"
        f" FROM parquet_metadata('{p}')").df().set_index("path_in_schema")
    assert df.loc["u64", "stats_min_value"] == "3"
    assert df.loc["u64", "stats_max_value"] == str(2**63 + 5)
    assert df.loc["s", "stats_min_value"] == "apple"
    assert int(df.loc["i32", "stats_null_count"]) == 1


def test_string_truncation_and_exactness(tmp_path):
    t = pa.table({"long": pa.array(["a" * 200, "b" * 200, "z" * 10])})
    p = str(tmp_path / "trunc.parquet")
    praw.write_file(p, t, use_dictionary=False)
    st = _chunk_stats(p)["long"]
    assert st.min == "a" * praw._STAT_TRUNC  # prefix stays a valid lower bound
    assert st.max == "z" * 10  # short max untouched
    # a truncated max must be STRICTLY ABOVE every value (incremented prefix)
    t2 = pa.table({"long": pa.array(["m" * 200, "m" * 150])})
    p2 = str(tmp_path / "trunc2.parquet")
    praw.write_file(p2, t2, use_dictionary=False)
    st2 = _chunk_stats(p2)["long"]
    assert st2.max == "m" * (praw._STAT_TRUNC - 1) + "n" > "m" * 200
    assert st2.min == "m" * praw._STAT_TRUNC <= "m" * 150


def test_nan_only_and_all_null_chunks(tmp_path):
    t = pa.table({
        "nan": pa.array([float("nan")] * 3, pa.float64()),
        "null": pa.array([None] * 3, pa.int64()),
    })
    p = str(tmp_path / "degenerate.parquet")
    praw.write_file(p, t, use_dictionary=False)
    st = _chunk_stats(p)
    assert not st["nan"].has_min_max  # all-NaN: bounds omitted, not garbage
    assert not st["null"].has_min_max
    assert st["null"].null_count == 3
    assert pq.read_table(p).num_rows == 3


def test_page_header_statistics_present(tmp_path):
    """The reference writes Statistics into each DataPageHeader; so do we.
    Parse the first page header with the thrift reader and check field 5
    (statistics: {3: null_count, 5: max_value, 6: min_value})."""
    t = pa.table({"k": pa.array([7, 1, None, 9], pa.int64())})
    p = str(tmp_path / "page.parquet")
    praw.write_file(p, t, use_dictionary=False)
    data = open(p, "rb").read()
    md = pq.ParquetFile(p).metadata
    off = md.row_group(0).column(0).data_page_offset
    hdr = praw.TCReader(memoryview(data), off).read_struct()
    dph = hdr[5]  # DataPageHeader
    stats = dph[5]  # Statistics
    assert stats[3] == 1  # null_count
    import struct as _s
    assert _s.unpack("<q", stats[6])[0] == 1  # min_value
    assert _s.unpack("<q", stats[5])[0] == 9  # max_value


def test_multi_row_group_per_group_bounds(tmp_path):
    t = pa.table({"k": pa.array(list(range(1000)), pa.int64())})
    p = str(tmp_path / "rg.parquet")
    praw.write_file(p, t, row_group_rows=500, use_dictionary=False)
    s0, s1 = _chunk_stats(p, 0)["k"], _chunk_stats(p, 1)["k"]
    assert (s0.min, s0.max) == (0, 499)
    assert (s1.min, s1.max) == (500, 999)


@pytest.mark.parametrize("engine", ["duckdb", "pyarrow"])
def test_foreign_engine_row_group_skip(tmp_path, engine):
    """Physical proof of consumer-side pruning: corrupt row group 1's
    compressed pages (footer + stats intact). A full scan fails on the
    corruption; a scan whose predicate excludes rg1's [500, 999] stats
    range succeeds — the engine never decompressed the poisoned pages."""
    t = pa.table({
        "k": pa.array(list(range(1000)), pa.int64()),
        "v": pa.array([f"val{i}" for i in range(1000)]),
    })
    p = str(tmp_path / "prune.parquet")
    praw.write_file(p, t, compression="gzip", row_group_rows=500,
                    use_dictionary=False)
    md = pq.ParquetFile(p).metadata
    off = md.row_group(1).column(0).data_page_offset
    data = bytearray(open(p, "rb").read())
    for i in range(off, off + 120):
        data[i] ^= 0xFF
    pc = str(tmp_path / "prune_corrupt.parquet")
    open(pc, "wb").write(bytes(data))

    if engine == "duckdb":
        with pytest.raises(Exception):
            duckdb.sql(f"SELECT sum(k) FROM read_parquet('{pc}')").fetchone()
        n, s = duckdb.sql(
            f"SELECT count(*), sum(k) FROM read_parquet('{pc}') WHERE k < 500"
        ).fetchone()
    else:
        with pytest.raises(Exception):
            pq.read_table(pc)
        got = pq.read_table(pc, filters=[("k", "<", 500)])
        n, s = got.num_rows, sum(got.column("k").to_pylist())
    assert (n, s) == (500, 499 * 500 // 2)


def test_stats_survive_dict_encoding_and_dremel(tmp_path):
    """Dictionary-encoded chunks and nested (dremel) leaves carry stats too."""
    t = pa.table({
        "cat": pa.array(["red", "blue", "red", "green"] * 50),
        "nested": pa.array(
            [{"tags": ["b", "c"]}, {"tags": ["a"]}, None, {"tags": []}] * 50,
            pa.struct([("tags", pa.list_(pa.string()))])),
    })
    p = str(tmp_path / "mixed.parquet")
    praw.write_file(p, t, use_dictionary=True)
    st = _chunk_stats(p)
    assert (st["cat"].min, st["cat"].max) == ("blue", "red")
    leaf = st["nested.tags.list.element"]
    assert (leaf.min, leaf.max) == ("a", "c")
