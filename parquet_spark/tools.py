"""Table inspector — the `parquetgen -metadata` / `-pageheaders` analogue
(/root/reference/cmd/parquetgen/main.go:36-39,51-80): dump an encoded
table's snapshot, per-column codec/size rollup, and per-block "page
headers" without decoding any values.

Usage:
    python -m parquet_spark.tools snapshot  <table_path>
    python -m parquet_spark.tools metadata  <table_path>
    python -m parquet_spark.tools blocks    <table_path> [column]

All output is JSON lines (machine-readable, like the reference CLI's JSON
dumps). `metadata`/`blocks` only read the manifest and the blocks' `meta`
column — the payload binary columns are pruned out of the scan.
"""

from __future__ import annotations

import json
import sys


def _spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.appName("parquet_spark-inspect")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def cmd_snapshot(path: str) -> None:
    from parquet_spark.operators.encode import read_snapshot

    snap = read_snapshot(path)
    if snap is None:
        raise SystemExit(f"no snapshot.json under {path}")
    print(json.dumps(snap))


def cmd_metadata(path: str) -> None:
    """Per-column rollup: codec mix, raw/encoded bytes, ratio, null counts."""
    from pyspark.sql import functions as F

    from parquet_spark.operators.decode import read_manifest

    spark = _spark()
    m = read_manifest(spark, path)
    roll = (
        m.groupBy("column", "codec", "compression")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum("n_values").alias("n_values"),
            F.sum("n_nulls").alias("n_nulls"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
        )
        .withColumn("ratio", F.round(F.col("raw_bytes") / F.col("enc_bytes"), 3))
        .orderBy("column", "codec")
    )
    for r in roll.collect():
        print(json.dumps(r.asDict()))


def cmd_blocks(path: str, column: str | None = None) -> None:
    """Per-block manifest rows — the page-header walk."""
    from parquet_spark.operators.decode import read_manifest

    spark = _spark()
    m = read_manifest(spark, path)
    if column:
        m = m.where(m["column"] == column)
    for r in m.orderBy("bucket", "part_id", "block_id", "column").collect():
        print(json.dumps(r.asDict()))


def main(argv: list[str]) -> None:
    if len(argv) < 2 or argv[0] not in ("snapshot", "metadata", "blocks"):
        print(__doc__)
        raise SystemExit(2)
    cmd, path = argv[0], argv[1]
    if cmd == "snapshot":
        cmd_snapshot(path)
    elif cmd == "metadata":
        cmd_metadata(path)
    else:
        cmd_blocks(path, argv[2] if len(argv) > 2 else None)


if __name__ == "__main__":
    main(sys.argv[1:])
