"""Table maintenance: compaction of fragmented encoded tables.

Streaming ingestion (streaming/encode_stream.py) and small incremental
appends leave buckets with many short blocks; short blocks hurt both
compression (per-block headers, dictionaries, symbol tables amortize over
fewer values) and decode throughput (more per-block Python dispatch).
`compact_table` rewrites the table at full block size — the analogue of
Iceberg's rewrite_data_files maintenance action, done the simple way:
full rewrite into a sibling directory, then a two-rename swap. The swap is
NOT atomic (local-filesystem renames; a real deployment would swap an
Iceberg snapshot pointer instead): a crash between the renames leaves the
complete old table parked at `<path>.old`, which `recover_table` — called
automatically by read_encoded — renames back. No data is ever lost, but
the window exists and this only works on a local/POSIX filesystem.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from parquet_spark.operators.decode import read_encoded
from parquet_spark.operators.encode import (
    DEFAULT_BLOCK_ROWS,
    read_snapshot,
    write_encoded,
)


def fragmentation(spark: SparkSession, path: str, block_rows: int | None = None) -> dict:
    """Fragmentation report: blocks, rows, mean rows/block, fill ratio."""
    from pyspark.sql import functions as F

    snap = read_snapshot(path)
    if snap is None:
        raise FileNotFoundError(f"no snapshot.json under {path}")
    target = block_rows or snap.get("block_rows", DEFAULT_BLOCK_ROWS)
    agg = (
        spark.read.parquet(os.path.join(path, "data"))
        .agg(F.count("*").alias("n_blocks"), F.sum("n_rows").alias("n_rows"))
        .collect()[0]
    )
    n_blocks, n_rows = int(agg["n_blocks"]), int(agg["n_rows"] or 0)
    mean = n_rows / n_blocks if n_blocks else 0.0
    return {
        "n_blocks": n_blocks,
        "n_rows": n_rows,
        "mean_rows_per_block": round(mean, 1),
        "target_block_rows": target,
        "fill_ratio": round(mean / target, 4) if target else 0.0,
    }


def recover_table(path: str) -> bool:
    """Crash recovery for compact_table's two-rename swap: if `path` has no
    snapshot but `<path>.old` holds a complete table (the window between the
    two renames), rename it back. Returns True if a recovery happened."""
    old = path.rstrip("/") + ".old"
    has_snap = os.path.exists(os.path.join(path, "snapshot.json"))
    if not has_snap and os.path.exists(os.path.join(old, "snapshot.json")):
        shutil.rmtree(path, ignore_errors=True)  # partial dir, if any
        os.rename(old, path)
        return True
    return False


def compact_table(
    spark: SparkSession,
    path: str,
    block_rows: int | None = None,
    target_partitions: int | None = None,
    min_fill_ratio: float = 0.5,
    **encode_kwargs,
) -> dict:
    """Rewrite `path` at full block size if its mean block fill is below
    `min_fill_ratio`. Returns the before/after report; no-op (and no
    rewrite) when the table is already compact."""
    snap = read_snapshot(path)
    if snap is None:
        raise FileNotFoundError(f"no snapshot.json under {path}")
    target = block_rows or snap.get("block_rows", DEFAULT_BLOCK_ROWS)
    before = fragmentation(spark, path, target)
    if before["fill_ratio"] >= min_fill_ratio:
        return {"compacted": False, "before": before, "after": before}

    tmp = path.rstrip("/") + ".compacting"
    old = path.rstrip("/") + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    df = read_encoded(spark, path)
    write_encoded(
        df,
        tmp,
        target_partitions=target_partitions,
        block_rows=target,
        resume=False,
        fingerprint=snap.get("fingerprint"),
        **encode_kwargs,
    )
    # atomic-ish swap: old table stays intact until the new one is complete
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    after = fragmentation(spark, path, target)
    return {"compacted": True, "before": before, "after": after}
