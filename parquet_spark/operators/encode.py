"""Distributed encode: DataFrame → encoded-block DataFrame → table layout.

The Spark-first replacement for the reference's write path
(`Add/Write/Close`, /root/reference/cmd/parquetgen/gen/template.go:164-215,
/root/reference/parquet.go:217-260):

- reference row group          → Spark partition (one mapInArrow task)
- reference page               → one block of `block_rows` rows per column
- reference thrift footer      → manifest parquet + snapshot.json
- row-at-a-time Add            → never: whole Arrow batches in, blocks out

One output row per (partition, block): the per-column payloads sit in
separate *binary columns* of that row, so the blocks parquet file is itself
columnar — decoding a projection reads only the projected payload columns
(Catalyst column pruning does the work). No join is needed to re-align
columns on decode because row alignment is positional within the block.

Table layout (Iceberg-style semantics — manifest + immutable data files +
snapshot pointer; plain parquet paths are used because no Iceberg catalog
jars ship in this sandbox, the substitution is documented in SURVEY.md §7):

    table/
      data/      blocks parquet (payload binary columns)
      manifest/  per-(bucket, block, column) metrics + lineage
      snapshot.json   schema, fingerprint, config, version
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F

from parquet_spark.operators.repartition import salted_repartition

BUCKET_COL = "__bucket"
DEFAULT_BLOCK_ROWS = 16384

MANIFEST_DDL = (
    "bucket int, part_id int, block_id long, column string, codec string, "
    "compression string, n_values long, n_nulls long, raw_bytes long, "
    "enc_bytes long, crc long, vmin string, vmax string"
)

# leaf types that get per-block min/max stats (the reference writes these
# per page into DataPageHeader.Statistics, /root/reference/parquet.go:164-169
# and gen/template_required.go:71-113; here they are ALSO top-level typed
# columns of the blocks parquet so Catalyst pushes range predicates into the
# scan and parquet row-group stats skip the heavy payload IO entirely)
_STATS_SPARK_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "string", "date", "timestamp",
}


def _stats_cols(schema) -> list[str]:
    return [
        f.name for f in schema.fields
        if f.dataType.simpleString() in _STATS_SPARK_TYPES
    ]


def _block_bucket(tbl: pa.Table) -> int:
    """Bucket id of a single-bucket block table. The resume key assumes
    bucket contiguity (sortWithinPartitions upstream + the batch splitter);
    verify first == last so a dropped sort or a splitter regression fails
    loudly instead of silently mis-assigning blocks to buckets."""
    bcol = tbl.column(BUCKET_COL)
    n = tbl.num_rows
    bucket = int(bcol[0].as_py())
    if int(bcol[n - 1].as_py()) != bucket:
        raise ValueError(
            f"block spans buckets {bucket}..{int(bcol[n - 1].as_py())}: "
            "input is not sorted by __bucket within the partition"
        )
    return bucket


def _encode_fn(columns: list[str], block_rows: int, codec_overrides: dict | None, compression: str | None, has_bucket: bool, stats_cols: list[str] | None = None):
    codec_overrides = codec_overrides or {}
    stats_cols = stats_cols or []

    def fn(batches):
        import pyarrow.compute as pc
        from pyspark import TaskContext

        from parquet_spark.codecs import blocks as blk

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        block_id = 0

        def encode_block(tbl: pa.Table):
            nonlocal block_id
            n = tbl.num_rows
            bucket = _block_bucket(tbl) if has_bucket and n else -1
            payloads = []
            stat_arrays = []
            metas = {}
            for col in columns:
                arr = tbl.column(col).combine_chunks()
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks() if arr.num_chunks != 1 else arr.chunk(0)
                payload = blk.encode_array(arr, codec=codec_overrides.get(col), compression=compression)
                raw_bytes = arr.nbytes
                info = blk.describe(payload)
                meta = {
                    "codec": info["codec"],
                    "compression": info["compression"],
                    "n_values": n,
                    "n_nulls": arr.null_count,
                    "raw_bytes": raw_bytes,
                    "enc_bytes": len(payload),
                    "crc": zlib.crc32(payload) & 0xFFFFFFFF,
                }
                if col in stats_cols:
                    mm = pc.min_max(arr)
                    vmin = mm["min"].as_py() if mm["min"].is_valid else None
                    vmax = mm["max"].as_py() if mm["max"].is_valid else None
                    if pa.types.is_floating(arr.type):
                        # pc.min_max skips NaN, but Spark orders NaN above
                        # every double — a block whose only rows matching
                        # (col > v) are NaN must NOT be pruned. Record
                        # vmax=NaN when any NaN is present (NaN >= v is true
                        # in Spark, so the block is kept); an all-NaN block
                        # gets vmin=NaN too (NaN < v is false → '<' prunes
                        # it, correctly, instead of inf/-inf garbage).
                        n_nan = pc.sum(pc.is_nan(arr)).as_py() or 0
                        if n_nan:
                            vmax = float("nan")
                            if n_nan == n - arr.null_count:
                                vmin = float("nan")
                    stat_arrays.append(pa.array([vmin], arr.type))
                    stat_arrays.append(pa.array([vmax], arr.type))
                    meta["vmin"] = None if vmin is None else str(vmin)
                    meta["vmax"] = None if vmax is None else str(vmax)
                metas[col] = meta
                payloads.append(payload)
            arrays = (
                [
                    pa.array([pid], pa.int32()),
                    pa.array([block_id], pa.int64()),
                    pa.array([bucket], pa.int32()),
                    pa.array([n], pa.int32()),
                    pa.array([json.dumps(metas)], pa.string()),
                ]
                + [pa.array([p], pa.binary()) for p in payloads]
                + stat_arrays
            )
            stat_names = [x for c in columns if c in stats_cols for x in (f"_min_{c}", f"_max_{c}")]
            block_id += 1
            return pa.RecordBatch.from_arrays(
                arrays, names=["part_id", "block_id", "bucket", "n_rows", "meta"] + columns + stat_names
            )

        pending: list[pa.RecordBatch] = []
        n_pending = 0
        current_bucket = None
        for b in batches:
            if b.num_rows == 0:
                continue
            if has_bucket:
                # split the batch at bucket boundaries (sorted within
                # partition) so a block never straddles buckets
                bvals = b.column(BUCKET_COL).to_numpy()
                cut = np.flatnonzero(np.diff(bvals)) + 1
                pieces = np.split(np.arange(len(bvals)), cut) if len(cut) else [np.arange(len(bvals))]
                segs = [(int(bvals[p[0]]), b.slice(int(p[0]), len(p))) for p in pieces]
            else:
                segs = [(None, b)]
            for seg_bucket, seg in segs:
                if has_bucket and seg_bucket != current_bucket:
                    if n_pending:
                        yield encode_block(pa.Table.from_batches(pending))
                        pending, n_pending = [], 0
                    current_bucket = seg_bucket
                pending.append(seg)
                n_pending += seg.num_rows
                while n_pending >= block_rows:
                    tbl = pa.Table.from_batches(pending)
                    yield encode_block(tbl.slice(0, block_rows))
                    rest = tbl.slice(block_rows)
                    pending = rest.to_batches() if rest.num_rows else []
                    n_pending = rest.num_rows
        if n_pending:
            yield encode_block(pa.Table.from_batches(pending))

    return fn


def encode_table(
    df: DataFrame,
    columns: list[str] | None = None,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    codecs: dict | None = None,
    compression: str | None = None,
) -> DataFrame:
    """DataFrame → blocks DataFrame (one row per block, one binary payload
    column per encoded input column). Purely declarative — the encode runs
    inside one mapInArrow stage per partition when the result is consumed."""
    has_bucket = BUCKET_COL in df.columns
    columns = columns or [c for c in df.columns if c != BUCKET_COL]
    type_of = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    stats_cols = [c for c in columns if type_of.get(c) in _STATS_SPARK_TYPES]
    out_ddl = (
        "part_id int, block_id long, bucket int, n_rows int, meta string, "
        + ", ".join(f"`{c}` binary" for c in columns)
        + "".join(f", `_min_{c}` {type_of[c]}, `_max_{c}` {type_of[c]}" for c in stats_cols)
    )
    return df.mapInArrow(_encode_fn(columns, block_rows, codecs, compression, has_bucket, stats_cols), out_ddl)


def manifest_from_blocks(blocks_df: DataFrame) -> DataFrame:
    """Explode the per-block meta JSON into the manifest relation."""
    meta_schema = (
        "map<string, struct<codec:string, compression:string, n_values:long, "
        "n_nulls:long, raw_bytes:long, enc_bytes:long, crc:long, "
        "vmin:string, vmax:string>>"
    )
    m = blocks_df.select(
        "bucket", "part_id", "block_id", F.explode(F.from_json("meta", meta_schema)).alias("column", "s")
    )
    return m.select(
        "bucket", "part_id", "block_id", "column",
        F.col("s.codec").alias("codec"),
        F.col("s.compression").alias("compression"),
        F.col("s.n_values").alias("n_values"),
        F.col("s.n_nulls").alias("n_nulls"),
        F.col("s.raw_bytes").alias("raw_bytes"),
        F.col("s.enc_bytes").alias("enc_bytes"),
        F.col("s.crc").alias("crc"),
        F.col("s.vmin").alias("vmin"),
        F.col("s.vmax").alias("vmax"),
    )


def _snapshot_path(path: str) -> str:
    return os.path.join(path, "snapshot.json")


def write_snapshot(path: str, schema_json: str, columns: list[str], fingerprint: str, extra: dict | None = None) -> None:
    snap = {
        "version": 1,
        "schema": json.loads(schema_json),
        "columns": columns,
        "fingerprint": fingerprint,
        "created_unix": int(time.time()),
    }
    if extra:
        snap.update(extra)
    os.makedirs(path, exist_ok=True)
    with open(_snapshot_path(path), "w") as f:
        json.dump(snap, f)


def read_snapshot(path: str) -> dict | None:
    p = _snapshot_path(path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def dataset_fingerprint(df: DataFrame, explicit: str | None = None) -> str:
    """Lineage key for resumability: input files + schema (no data scan)."""
    if explicit:
        return explicit
    files = sorted(df.inputFiles())
    h = zlib.crc32(("\n".join(files) + df.schema.json()).encode())
    return f"fp-{h:08x}-{len(files)}"


def write_encoded(
    df: DataFrame,
    path: str,
    target_partitions: int | None = None,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    codecs: dict | None = None,
    compression: str | None = None,
    resume: bool = True,
    fingerprint: str | None = None,
    source_col: str = "source",
    salt_key: str = "doc_id",
    weight_col: str | None = "n_tok",
    cluster_col: str | None = None,
) -> dict:
    """Full encode pipeline: salted repartition → encode → data + manifest +
    snapshot. Resumable: re-running after a partial failure anti-joins the
    completed buckets out of the input and appends only the missing ones.
    `cluster_col` orders rows within each bucket so blocks carry tight
    min/max ranges on that column (see read_encoded(where=...)).

    Returns a summary dict (buckets encoded/skipped, manifest path)."""
    spark = df.sparkSession
    fp = dataset_fingerprint(df, fingerprint)
    columns = [c for c in df.columns]
    if target_partitions is None:
        target_partitions = max(spark.sparkContext.defaultParallelism * 2, 8)

    salted, n_buckets = salted_repartition(
        df, target_partitions, source_col=source_col, salt_key=salt_key,
        weight_col=weight_col, cluster_col=cluster_col,
    )

    data_dir = os.path.join(path, "data")
    man_dir = os.path.join(path, "manifest")
    skipped = 0
    mode = "overwrite"
    snap = read_snapshot(path) if resume else None
    if snap and snap.get("fingerprint") == fp and os.path.exists(data_dir):
        # completed buckets come from the DATA dir (the source of truth —
        # a crash between the data and manifest writes must not cause a
        # re-encode and duplicate rows); the scan is meta-only, so Catalyst
        # prunes every payload column out of the parquet read
        done = spark.read.parquet(data_dir).select("bucket").distinct()
        skipped = done.count()
        if skipped:
            salted = salted.join(F.broadcast(done.withColumnRenamed("bucket", BUCKET_COL)), BUCKET_COL, "left_anti")
            mode = "append"

    if skipped < n_buckets:
        blocks = encode_table(salted, columns=columns, block_rows=block_rows, codecs=codecs, compression=compression)
        blocks.write.mode(mode).parquet(data_dir)

    # manifest: incremental — append entries only for buckets the manifest
    # does not know yet (at 10⁶ blocks a full rebuild per resume would
    # re-read and re-write every historical entry). This also heals a
    # manifest left behind by a crash after the data write.
    data_meta = spark.read.parquet(data_dir).select("bucket", "part_id", "block_id", "meta")
    if mode == "append" and os.path.exists(man_dir):
        known = spark.read.schema(MANIFEST_DDL).parquet(man_dir).select("bucket").distinct()
        fresh = data_meta.join(F.broadcast(known), "bucket", "left_anti")
        if not fresh.isEmpty():
            manifest_from_blocks(fresh).write.mode("append").parquet(man_dir)
    else:
        manifest_from_blocks(data_meta).write.mode("overwrite").parquet(man_dir)
    write_snapshot(path, df.schema.json(), columns, fp, {"n_buckets": n_buckets, "block_rows": block_rows})
    return {"fingerprint": fp, "buckets_total": n_buckets, "buckets_skipped": skipped, "path": path}


def append_encoded(
    df: DataFrame,
    path: str,
    target_partitions: int = 64,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    codecs: dict | None = None,
    source_col: str = "source",
    salt_key: str = "doc_id",
    weight_col: str | None = "n_tok",
) -> dict:
    """Batch append: encode `df` as a new immutable batch directory
    (`data/batch=<n>`) next to the existing ones — the same layout and
    code path as the streaming sink, so batch and streaming ingestion
    compose on one table. `read_encoded` reads the union through parquet
    partition discovery (stats pruning included); `compact_table` folds
    fragmented batches back into full blocks. To replace a table
    wholesale use `write_encoded`; the flat and batch layouts must not be
    mixed under one path (this function refuses a flat table)."""
    import re

    from parquet_spark.streaming.encode_stream import StreamingEncoder

    data_dir = os.path.join(path, "data")
    next_id = 0
    if os.path.isdir(data_dir):
        entries = os.listdir(data_dir)
        ids = [int(m.group(1)) for d in entries if (m := re.match(r"batch=(\d+)$", d))]
        if not ids and any(not e.startswith(("_", ".")) for e in entries):
            raise ValueError(
                f"{path} holds a flat write_encoded table; append_encoded "
                "requires the batch layout (create the table with "
                "append_encoded or the streaming sink)"
            )
        next_id = max(ids, default=-1) + 1
    enc = StreamingEncoder(
        path, target_partitions=target_partitions, block_rows=block_rows,
        codecs=codecs, source_col=source_col, salt_key=salt_key, weight_col=weight_col,
    )
    enc._snapshot_written = os.path.exists(_snapshot_path(path))
    enc(df, next_id)
    return {"path": path, "batch_id": next_id}
