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
# per-task footer reads; callers should use the plain encode_table path.
# Measured break points (interleaved minima, local[32]): a 600k-row flat
# lineitem roundtrip reads 0.48 s fused vs 0.73 s through the Spark feed,
# and after the Range+broadcast split distribution removed the extra
# Python hop, even the 300k-row sequences table (nested token arrays)
# writes faster fused (0.58 s vs 0.67 s, paired median 1.12x). Below
# ~200k rows the work per task is too small for the split machinery to
# matter either way; the quantity that actually costs is rows through
# the per-row transpose.
MIN_FUSED_ROWS = 200_000


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
    return estimate_rows_files(_list_parquet_files(path))


def estimate_rows_files(files: list[str], max_footers: int = 64) -> int:
    """Row-count estimate with bounded driver IO: exact when the file
    count is small, first-file-rows x file-count beyond that (row counts
    per part file are near-uniform for any sanely written table, and the
    estimate only gates a threshold choice)."""
    import pyarrow.parquet as pq

    if not files:
        return 0
    if len(files) <= max_footers:
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    return pq.ParquetFile(files[0]).metadata.num_rows * len(files)


def bare_parquet_files(df: DataFrame) -> list[str] | None:
    """Local parquet files of a DataFrame whose optimized plan is a BARE
    file relation — no projection, filter, or computed column — i.e. the
    only shape the fused Arrow feed reproduces exactly (anything Catalyst
    computes must keep the Spark scan). None when the shape or storage
    doesn't qualify; the caller falls back to the JVM feed."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return None
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    if len(lines) != 1:
        return None
    node = lines[0].lstrip(" +-:").split(" ", 1)[0].split("[", 1)[0]
    if node != "Relation" or " parquet" not in lines[0]:
        return None
    files = df.inputFiles()
    if not files or not all(f.startswith("file:") for f in files):
        return None
    out = sorted(f[len("file:") :] for f in files)
    return out if all(os.path.exists(f) for f in out) else None


def plan_encode_splits(
    files: list[str], parallelism: int, block_rows: int = DEFAULT_BLOCK_ROWS
) -> tuple[list[tuple[int, str, int, int, int]], dict]:
    """Bucketed splits for the write path: [(bucket, file, rg, lo, hi)]
    plus the plan-identity dict the snapshot records. A resume recomputes
    this plan and compares for equality — any drift (file set, core
    count, block size) invalidates recorded bucket ids and forces a full
    re-encode, exactly like partition-mode conf drift."""
    raw = _plan_splits_for_files(files, parallelism, block_rows)
    splits = [(i, f, rg, lo, hi) for i, (f, rg, lo, hi) in enumerate(raw)]
    plan = {
        "mode": "arrow",
        "n_splits": len(splits),
        "parallelism": int(parallelism),
        "block_rows": int(block_rows),
        "n_files": len(files),
    }
    return splits, plan


def plan_arrow_splits(path: str, parallelism: int, block_rows: int = DEFAULT_BLOCK_ROWS) -> list[tuple[str, int, int, int]]:
    """(file, row_group, lo, hi) splits. row_group == -1 means the whole
    file (many-files regime: the driver read no footer, the task will).
    lo/hi are row offsets within the row group; hi == -1 means to the end."""
    files = _list_parquet_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    return _plan_splits_for_files(files, parallelism, block_rows)


def _plan_splits_for_files(files: list[str], parallelism: int, block_rows: int) -> list[tuple[str, int, int, int]]:
    import pyarrow.parquet as pq

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


def _read_split(path: str, rg: int, lo: int, hi: int, cols: list[str], batch_rows: int, pf=None):
    """Yield Arrow batches for rows [lo, hi) of one row group (rg == -1:
    the whole file; hi == -1: to the end). Stops decoding at hi, so a
    sub-split pays at most the partial decode of its leading rows.
    `pf`: an already-open ParquetFile for `path` (callers that probed the
    schema avoid a second footer read)."""
    import pyarrow.parquet as pq

    pf = pf or pq.ParquetFile(path)
    rgs = None if rg < 0 else [rg]
    end = float("inf") if hi < 0 else hi
    off = 0
    for batch in pf.iter_batches(batch_size=batch_rows, row_groups=rgs, columns=cols):
        n = batch.num_rows
        if off + n > lo and off < end:
            s = max(lo - off, 0)
            e = min(end - off, n)
            yield batch.slice(s, int(e - s))
        off += n
        if off >= end:
            break


def _fused_scan_df(spark, path, cols, block_rows, kernel, out_schema):
    """Shared skeleton of the fused-scan operators: plan splits, ship
    them as a broadcast + JVM-native Range of split indices (one tiny row
    each — a parallelize()d Python RDD would evaluate in one Python
    worker and hand rows to the mapInArrow worker through the JVM, a
    second Python hop per task that measured ~0.2 s across a 36-task
    stage), and run `kernel` over the pyarrow batch feed inside each
    task. The broadcast keeps the task closure O(1) at any split count."""
    splits = plan_arrow_splits(path, spark.sparkContext.defaultParallelism, block_rows)
    bc = spark.sparkContext.broadcast(splits)
    sdf = spark.range(0, len(splits), numPartitions=len(splits))

    def gen(batches):
        def feed():
            for b in batches:
                for sid in b.column("id").to_pylist():
                    f, rg, lo, hi = bc.value[sid]
                    yield from _read_split(f, rg, lo, hi, cols, block_rows)

        yield from kernel(feed())

    return sdf.mapInArrow(gen, out_schema)


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
    cols = list(columns)
    enc = _encode_fn(cols, block_rows, codecs, compression, has_bucket=False)
    out_ddl = (
        "part_id int, block_id long, bucket int, n_rows int, meta string, "
        + ", ".join(f"`{c}` binary" for c in cols)
    )
    return _fused_scan_df(spark, path, cols, block_rows, enc, out_ddl)


def roundtrip_parquet_arrow(
    spark: SparkSession,
    path: str,
    columns: list[str],
    out_schema,
    codecs: dict | None = None,
    block_rows: int = DEFAULT_BLOCK_ROWS,
) -> DataFrame:
    """Single-stage read+encode+decode roundtrip (r6, guide §4.1): the
    fused scan feeds `_encode_fn` AND the block batches feed `_decode_fn`
    inside the SAME mapInArrow task, so the multi-MB block payloads never
    cross into the JVM between the two kernels (two chained mapInArrow
    nodes run two Python workers per task with a full Arrow round-trip of
    the blocks relation between them). Same kernels, same block bytes,
    same decoded rows — measured 1.07 s → 0.74 s interleaved min on the
    6M-row lineitem roundtrip, CRC-identical."""
    from parquet_spark.operators.decode import _decode_fn
    from parquet_spark.operators.encode import check_reserved_columns

    cols = list(columns)
    check_reserved_columns(cols)
    enc = _encode_fn(cols, block_rows, codecs, None, has_bucket=False)
    dec = _decode_fn(cols, out_schema, False)
    return _fused_scan_df(
        spark, path, cols, block_rows, lambda feed: dec(enc(feed)), out_schema
    )


def encode_splits_arrow(
    spark: SparkSession,
    splits: list[tuple[int, str, int, int, int]],
    columns: list[str],
    out_ddl: str,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    codecs: dict | None = None,
    compression: str | None = None,
    stats_cols: list[str] | None = None,
    manifest_dir: str | None = None,
    bloom_cols: list[str] | None = None,
) -> DataFrame:
    """Write-path fused scan+encode over pre-planned bucketed splits
    [(bucket, file, rg, lo, hi)]: each task reads its slice with pyarrow,
    tags the rows with the split's bucket id, and runs the standard
    encode kernels — stats columns and side-band manifest included, so
    the blocks relation is exactly what `encode_table` would produce for
    write_encoded's partition mode, minus the JVM row feed. Distribution
    is a JVM-native Range over split indices + a broadcast split list
    (single Python hop per task; see encode_parquet_arrow)."""
    bc = spark.sparkContext.broadcast(list(splits))
    sdf = spark.range(0, max(len(splits), 1), numPartitions=max(len(splits), 1))
    cols = list(columns)
    enc = _encode_fn(
        cols, block_rows, codecs, compression, has_bucket=True,
        stats_cols=stats_cols, manifest_dir=manifest_dir, bloom_cols=bloom_cols,
    )

    def gen(batches):
        import pyarrow as pa

        from parquet_spark.operators.encode import BUCKET_COL

        def feed():
            for b in batches:
                for idx in b.column("id").to_pylist():
                    if idx >= len(bc.value):
                        continue  # empty split list: range(0,1) placeholder row
                    bucket, f, rg, lo, hi = bc.value[idx]
                    for batch in _read_split(f, rg, lo, hi, cols, block_rows):
                        yield batch.append_column(
                            BUCKET_COL, pa.array([bucket] * batch.num_rows, pa.int32())
                        )

        yield from enc(feed())

    return sdf.mapInArrow(gen, out_ddl)
