"""Arrow-native parquet scan fused with the block encode (one mapInArrow).

Why this exists (r6 optimization round): `encode_table` over a Spark
parquet scan pays the JVM→Python Arrow conversion for every input row —
Spark's vectorized reader materializes internal rows, and the mapInArrow
feed transposes them back into Arrow batches row by row. Measured on the
6M-row lineitem projection (local[32], sf1.0): an *identity* mapInArrow
costs 2.5 s against a 0.27 s scan — the conversion, not the codecs, is the
whole roundtrip budget (spark_optimization_guide §4.1: "you cannot remove
that cost, but you control how many columns cross" — here we remove the
crossing itself for the scan side).

This operator applies the guide's §8.4 co-locate pattern instead: the
driver plans (file, row-group, row-range) splits, Spark distributes them
as one tiny row each, and every task reads its own slice with pyarrow
directly into Arrow batches — already columnar, zero JVM row traffic —
feeding the SAME `_encode_fn` kernels that `encode_table` uses. The
output relation is identical in shape and content semantics (one row per
block, binary payload columns), so `decode_table` consumes it unchanged.
Measured: the lineitem auto roundtrip drops 2.83 s → 1.51 s (interleaved
min, same session).

Scale behaviour (the rules are size-derived, not tuned to local[32]):

- **many files** (>= default parallelism): one split per file and the
  driver reads NO footers — planning is file listing only, the same
  metadata Spark's own planner needs. The 100 TB case lands here.
- **few files**: the driver reads those footers (bounded by the
  parallelism, so bounded work) and splits at row-group granularity;
  row groups much larger than a block are range-sub-split, and a task
  stops decoding its row group at the end of its range (iter_batches +
  break), so sub-splitting costs at most one extra partial decode of the
  leading rows, never a full redundant read of the file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from parquet_spark.operators.encode import DEFAULT_BLOCK_ROWS, _encode_fn

# below this row count the JVM feed is cheaper than split planning +
# per-task footer reads; callers should use the plain encode_table path
MIN_FUSED_ROWS = 1_000_000


def _list_parquet_files(path: str) -> list[str]:
    """Local parquet file or directory of part files, sorted for
    deterministic split planning."""
    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    raise FileNotFoundError(path)


def estimate_rows(path: str) -> int:
    """Total row count from footer metadata (driver-side; one footer read
    per file, intended for the small-file-count regime where the caller
    is choosing between the fused and plain scan paths)."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in _list_parquet_files(path))


def plan_arrow_splits(path: str, parallelism: int, block_rows: int = DEFAULT_BLOCK_ROWS) -> list[tuple[str, int, int, int]]:
    """(file, row_group, lo, hi) splits. row_group == -1 means the whole
    file (many-files regime: the driver read no footer, the task will).
    lo/hi are row offsets within the row group; hi == -1 means to the end."""
    import pyarrow.parquet as pq

    files = _list_parquet_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    if len(files) >= parallelism:
        return [(f, -1, 0, -1) for f in files]
    splits: list[tuple[str, int, int, int]] = []
    rg_meta = []  # (file, rg, n_rows)
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            rg_meta.append((f, rg, meta.row_group(rg).num_rows))
    if len(rg_meta) >= parallelism:
        return [(f, rg, 0, -1) for f, rg, _n in rg_meta]
    # sub-split large row groups so every core gets work; keep ranges at
    # least a couple of blocks so per-split overhead stays amortized
    per_rg = max(1, -(-parallelism // len(rg_meta)))
    for f, rg, n in rg_meta:
        step = max(2 * block_rows, -(-n // per_rg))
        lo = 0
        while lo < n:
            splits.append((f, rg, lo, min(lo + step, n)))
            lo += step
        if n == 0:
            splits.append((f, rg, 0, -1))
    return splits


def encode_parquet_arrow(
    spark: SparkSession,
    path: str,
    columns: list[str],
    codecs: dict | None = None,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    compression: str | None = None,
) -> DataFrame:
    """Blocks DataFrame (same relation `encode_table` produces, minus the
    optional stats columns — this path serves the in-memory roundtrip,
    where blocks are decoded immediately and per-block min/max would be
    computed only to be dropped)."""
    splits = plan_arrow_splits(path, spark.sparkContext.defaultParallelism, block_rows)
    rdd = spark.sparkContext.parallelize(splits, len(splits))
    sdf = spark.createDataFrame(rdd, "path string, rg int, lo long, hi long")
    cols = list(columns)
    enc = _encode_fn(cols, block_rows, codecs, compression, has_bucket=False)

    def gen(batches):
        import pyarrow.parquet as pq

        def feed():
            for b in batches:
                for row in range(b.num_rows):
                    p = b.column("path")[row].as_py()
                    rg = b.column("rg")[row].as_py()
                    lo = b.column("lo")[row].as_py()
                    hi = b.column("hi")[row].as_py()
                    pf = pq.ParquetFile(p)
                    rgs = None if rg < 0 else [rg]
                    if hi < 0:
                        hi = float("inf")
                    off = 0
                    for batch in pf.iter_batches(
                        batch_size=block_rows, row_groups=rgs, columns=cols
                    ):
                        n = batch.num_rows
                        if off + n > lo and off < hi:
                            s = max(lo - off, 0)
                            e = min(hi - off, n)
                            yield batch.slice(s, int(e - s))
                        off += n
                        if off >= hi:
                            break

        yield from enc(feed())

    out_ddl = (
        "part_id int, block_id long, bucket int, n_rows int, meta string, "
        + ", ".join(f"`{c}` binary" for c in cols)
    )
    return sdf.mapInArrow(gen, out_ddl)
