"""The encoded table as a Spark Python Data Source:
spark.read.format("parquet_spark").load(path) — schema from snapshot,
(file, row-group) partitions, footer-stats partition pruning, as_of
time travel, crc verify. Results must equal read_encoded on every path.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from parquet_spark.operators.decode import read_encoded
from parquet_spark.operators.encode import write_encoded
from parquet_spark.sources.spark_datasource import (
    EncodedTableReader,
    register,
)
from parquet_spark.sources.synth import sequences_df


def _crc(df):
    return df.agg(
        F.sum(F.crc32(F.concat_ws(",", F.col("doc_id"), F.col("tokens").cast("string"))))
    ).collect()[0][0]


@pytest.fixture()
def table(spark, tmp_path):
    src = sequences_df(spark, 4000, seed=13, n_partitions=4)
    path = str(tmp_path / "t")
    write_encoded(src, path, target_partitions=8, resume=False, cluster_col="n_tok")
    register(spark)
    return src, path


def test_datasource_full_read_matches(spark, table):
    src, path = table
    df = spark.read.format("parquet_spark").load(path)
    assert df.schema == src.schema
    assert df.count() == src.count()
    assert _crc(df) == _crc(src)


def test_datasource_filter_matches_and_prunes(spark, table):
    src, path = table
    df = spark.read.format("parquet_spark").load(path)
    for cond in (F.col("n_tok") > 400, F.col("n_tok") <= 30,
                 F.col("source") == "wiki"):
        got, want = df.where(cond), src.where(cond)
        assert got.count() == want.count()
        assert _crc(got) == _crc(want)

    # pruning skips row groups: with a cluster_col-ordered table, a tight
    # n_tok range must plan fewer partitions than the full scan
    from pyspark.sql.datasource import GreaterThan

    r = EncodedTableReader({"path": path}, df.schema)
    all_parts = r.partitions()
    r2 = EncodedTableReader({"path": path}, df.schema)
    r2.pushFilters([GreaterThan(("n_tok",), 1_000_000)])  # beyond max
    assert len(r2.partitions()) < len(all_parts)
    assert len(all_parts) > 0


def test_datasource_verify_and_missing_table(spark, table, tmp_path):
    src, path = table
    df = spark.read.format("parquet_spark").option("verify", "true").load(path)
    assert _crc(df) == _crc(src)
    with pytest.raises(Exception, match="snapshot"):
        spark.read.format("parquet_spark").load(str(tmp_path / "nope")).count()


def test_datasource_as_of_batches(spark, tmp_path):
    from parquet_spark.operators.encode import append_encoded, list_snapshots

    src = sequences_df(spark, 2000, seed=17, n_partitions=4)
    b1 = src.where(F.col("n_tok") % 2 == 0)
    b2 = src.where(F.col("n_tok") % 2 != 0)
    path = str(tmp_path / "tt")
    append_encoded(b1, path, target_partitions=4)
    seq1 = max(s["sequence"] for s in list_snapshots(path))
    append_encoded(b2, path, target_partitions=4)
    register(spark)
    live = spark.read.format("parquet_spark").load(path)
    assert live.count() == src.count()
    old = spark.read.format("parquet_spark").option("as_of", seq1).load(path)
    assert old.count() == b1.count()
    assert _crc(old) == _crc(read_encoded(spark, path, as_of=seq1))


def test_datasource_ignores_hidden_dirs(spark, table, tmp_path):
    """Review finding: uncommitted task output under _temporary/ (or any
    hidden path component) must not be planned as table data."""
    import os
    import shutil

    src, path = table
    from parquet_spark.operators.encode import read_snapshot

    data_dir = os.path.join(path, read_snapshot(path).get("data_dir", "data"))
    real = next(
        f for f in os.listdir(data_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    hidden = os.path.join(data_dir, "_temporary", "0")
    os.makedirs(hidden)
    shutil.copy(os.path.join(data_dir, real), os.path.join(hidden, "part-junk.parquet"))
    df = spark.read.format("parquet_spark").load(path)
    assert df.count() == src.count()  # phantom copy not double-counted


def test_datasource_batch_regex_anchored(spark, tmp_path):
    """Review finding: a batch=N component in the TABLE's own path must
    not be mistaken for a file's batch id during as_of scoping."""
    from parquet_spark.operators.encode import append_encoded, list_snapshots
    from parquet_spark.sources.synth import sequences_df

    base = tmp_path / "batch=7"
    base.mkdir()
    path = str(base / "t")
    b1 = sequences_df(spark, 300, seed=3, n_partitions=2)
    append_encoded(b1, path, target_partitions=2)
    seq1 = max(s["sequence"] for s in list_snapshots(path))
    append_encoded(sequences_df(spark, 200, seed=4, n_partitions=2), path, target_partitions=2)
    register(spark)
    old = spark.read.format("parquet_spark").option("as_of", seq1).load(path)
    assert old.count() == 300  # batch=7 in the table path must not zero this


def test_datasource_nan_stats_do_not_prune(spark, tmp_path):
    """Review finding: a block with vmax=NaN (encode records NaN-largest
    for float blocks holding NaN) writes footer max=nan; Python
    comparisons with nan are all False, which read as 'prune'. The NaN
    bound must mean KEEP — results equal read_encoded."""
    import math

    from parquet_spark.operators.decode import read_encoded
    from parquet_spark.operators.encode import write_encoded

    path = str(tmp_path / "nan_t")
    rows = [(i, float(i)) for i in range(100)] + [(100, float("nan")), (101, 500.0)]
    df = spark.createDataFrame(rows, "doc_id long, x double").repartition(1)
    write_encoded(df, path, target_partitions=1, block_rows=16,
                  resume=False, bucket_mode="partition", cluster_col="doc_id")
    register(spark)
    ds = spark.read.format("parquet_spark").load(path)
    for cond in (F.col("x") > 100.0, F.col("x") == 500.0):
        got = ds.where(cond).count()
        want = read_encoded(spark, path).where(cond).count()
        assert got == want, (str(cond), got, want)
    # NaN rows themselves survive a > filter under Spark NaN-largest order
    assert ds.where(F.col("x") > 1000.0).count() == 1


def test_datasource_many_files_defers_footers_to_tasks(spark, table, monkeypatch):
    """Above the file-count threshold, partition planning reads ZERO
    data-file footers on the driver (one whole-file partition each,
    rg=-1); tasks prune row groups themselves with the identical stats
    logic, so query results and filters match the footer-planned path
    (r5 VERDICT missing-item #3 / r6 optimization)."""
    import pyarrow.parquet as _pq

    from parquet_spark.sources import spark_datasource as ds

    src, path = table
    df = spark.read.format("parquet_spark").load(path)

    # force the many-files regime for this small fixture
    monkeypatch.setattr(ds, "_MAX_DRIVER_FOOTER_READS", 0)

    calls = {"n": 0}
    real_read_metadata = _pq.read_metadata

    def counting(*a, **k):
        calls["n"] += 1
        return real_read_metadata(*a, **k)

    monkeypatch.setattr(_pq, "read_metadata", counting)
    r = ds.EncodedTableReader({"path": path}, df.schema)
    parts = r.partitions()
    assert calls["n"] == 0, "driver read data-file footers in deferred mode"
    assert parts and all(p.value[1] == -1 for p in parts)

    # drive the deferred read() directly (the Spark plan worker is a
    # separate process the monkeypatch cannot reach): whole-table rows
    # must tile exactly once across the per-file partitions
    total = sum(b.num_rows for p in parts for b in r.read(p))
    assert total == src.count()

    # task-side pruning: an impossible pushed range must skip every row
    # group inside read() (the same probe the driver-planned test uses),
    # without the driver having read any footer
    from pyspark.sql.datasource import GreaterThan

    r2 = ds.EncodedTableReader({"path": path}, df.schema)
    r2.pushFilters([GreaterThan(("n_tok",), 1_000_000)])  # beyond max
    parts2 = r2.partitions()
    assert parts2 and all(p.value[1] == -1 for p in parts2)
    kept = sum(b.num_rows for p in parts2 for b in r2.read(p))
    assert kept == 0

    # results identical through the real Spark path too
    assert _crc(df) == _crc(src)
    cond = F.col("n_tok") > 400
    assert df.where(cond).count() == src.where(cond).count()
    assert _crc(df.where(cond)) == _crc(src.where(cond))
