"""The Arrow-native fused scan+encode must produce the exact rows the
Spark-scan encode path produces — it is an execution strategy, never a
semantics change (r6 optimization; see sources/arrow_scan.py)."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from parquet_spark.operators.decode import decode_table
from parquet_spark.operators.encode import encode_table
from parquet_spark.sources.arrow_scan import (
    encode_parquet_arrow,
    estimate_rows,
    plan_arrow_splits,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _crc(df):
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in df.columns]
    return df.agg(F.sum(F.crc32(F.concat_ws("\x1f", *cols)))).collect()[0][0]


def test_fused_scan_matches_spark_scan(spark):
    path = f"{SF_DIR}/lineitem.parquet"
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus"]
    df = spark.read.parquet(path).select(*cols)
    fused = decode_table(encode_parquet_arrow(spark, path, cols), df.schema)
    plain = decode_table(encode_table(df), df.schema)
    assert fused.count() == plain.count() == df.count()
    assert _crc(fused) == _crc(plain)
    assert fused.schema == plain.schema


def test_fused_scan_with_codec_overrides(spark):
    path = f"{SF_DIR}/documents.parquet"
    cols = ["doc_id", "text"]
    df = spark.read.parquet(path).select(*cols)
    fused = decode_table(
        encode_parquet_arrow(spark, path, cols, codecs={"text": "fsst"}), df.schema
    )
    assert _crc(fused) == _crc(df)


def test_fused_scan_small_blocks_many_splits(spark):
    # block_rows smaller than the table forces multi-block tasks; the
    # split ranges must tile the file exactly once
    path = f"{SF_DIR}/orders.parquet"
    cols = ["o_orderkey", "o_orderdate"]
    df = spark.read.parquet(path).select(*cols)
    fused = decode_table(
        encode_parquet_arrow(spark, path, cols, block_rows=1024), df.schema
    )
    assert fused.count() == df.count()
    assert _crc(fused) == _crc(df)


def test_plan_splits_tile_rows_exactly():
    path = f"{SF_DIR}/lineitem.parquet"
    total = estimate_rows(path)
    splits = plan_arrow_splits(path, parallelism=32)
    meta = pq.ParquetFile(path).metadata
    covered = 0
    for f, rg, lo, hi in splits:
        n = meta.row_group(rg).num_rows if rg >= 0 else meta.num_rows
        end = n if hi < 0 else hi
        assert 0 <= lo <= end <= n
        covered += end - lo
    assert covered == total


def test_plan_splits_many_files_no_footer_reads(tmp_path):
    import pyarrow as pa

    for i in range(8):
        pq.write_table(pa.table({"x": list(range(10))}), str(tmp_path / f"p{i}.parquet"))
    splits = plan_arrow_splits(str(tmp_path), parallelism=4)
    # many-files regime: one whole-file split each, no row-group detail
    assert len(splits) == 8
    assert all(rg == -1 and lo == 0 and hi == -1 for _f, rg, lo, hi in splits)


def test_plan_splits_missing_path():
    with pytest.raises(FileNotFoundError):
        plan_arrow_splits("/nonexistent/nowhere", parallelism=4)
