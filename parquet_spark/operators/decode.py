"""Distributed decode: encoded table → DataFrame.

Spark-first replacement for the reference's read path
(`NewParquetReader/Next/Scan`, /root/reference/cmd/parquetgen/gen/
template.go:235-382): the manifest scan is a parquet read of the blocks
files; per-partition decode is one mapInArrow stage; struct re-assembly
disappears because Arrow list/validity structures ARE the output
(SURVEY.md §3.2).

Column projection decodes only the requested payload columns — Catalyst
prunes the untouched binary columns out of the parquet scan entirely.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from parquet_spark.operators.encode import read_snapshot


def _decode_fn(columns: list[str], spark_schema: StructType):
    arrow_schema_fields = [f.name for f in spark_schema.fields]

    def fn(batches):
        from parquet_spark.codecs import blocks as blk

        for b in batches:
            if b.num_rows == 0:
                continue
            for row in range(b.num_rows):
                arrays = []
                for col in columns:
                    payload = b.column(col)[row].as_py()
                    arrays.append(blk.decode_array(payload))
                yield pa.RecordBatch.from_arrays(arrays, names=columns)

    return fn


def decode_table(blocks_df: DataFrame, schema: StructType, columns: list[str] | None = None) -> DataFrame:
    """Blocks DataFrame → original rows. `schema` is the original table
    schema (from snapshot.json); projection via `columns`."""
    known = {f.name: f for f in schema.fields}
    columns = columns or [f.name for f in schema.fields]
    missing = [c for c in columns if c not in known]
    if missing:
        raise KeyError(f"column(s) {missing} not in encoded table; available: {sorted(known)}")
    out_schema = StructType([known[c] for c in columns])
    proj = blocks_df.select(*columns)
    return proj.mapInArrow(_decode_fn(list(columns), out_schema), out_schema)


def read_encoded(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Open an encoded table (data + snapshot) and return the decoded
    DataFrame — the engine's `spark.read.parquet` analogue."""
    snap = read_snapshot(path)
    if snap is None:
        raise FileNotFoundError(f"no snapshot.json under {path}")
    schema = StructType.fromJson(snap["schema"])
    blocks_df = spark.read.parquet(os.path.join(path, "data"))
    return decode_table(blocks_df, schema, columns)


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "manifest"))
