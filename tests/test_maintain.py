"""Compaction (Iceberg rewrite_data_files analogue): fragmented tables are
rewritten at full block size with identical content."""

from __future__ import annotations

from pyspark.sql import functions as F


def _crc(df):
    return df.select(
        F.sum(F.crc32(F.concat_ws(",", "doc_id", F.col("tokens").cast("string"), "n_tok", "source"))).alias("c")
    ).collect()[0]["c"]


def test_compact_fragmented_table(spark, tmp_path):
    from parquet_spark.operators.decode import read_encoded
    from parquet_spark.operators.maintain import compact_table, fragmentation
    from parquet_spark.sources.synth import sequences_df

    path = str(tmp_path / "frag")
    df = sequences_df(spark, 5000, seed=21, n_partitions=2)
    # 128-row blocks = heavy fragmentation vs the 4096 target
    from parquet_spark.operators.encode import write_encoded

    write_encoded(df, path, target_partitions=4, block_rows=128, resume=False)
    orig_crc = _crc(read_encoded(spark, path))
    before = fragmentation(spark, path, 4096)
    assert before["fill_ratio"] < 0.5

    rep = compact_table(spark, path, block_rows=4096, target_partitions=2)
    assert rep["compacted"]
    assert rep["after"]["n_blocks"] < rep["before"]["n_blocks"]
    assert rep["after"]["fill_ratio"] > rep["before"]["fill_ratio"]
    assert rep["after"]["n_rows"] == rep["before"]["n_rows"] == 5000
    assert _crc(read_encoded(spark, path)) == orig_crc


def test_compact_noop_when_already_full(spark, tmp_path):
    from parquet_spark.operators.encode import write_encoded
    from parquet_spark.operators.maintain import compact_table
    from parquet_spark.sources.synth import sequences_df

    path = str(tmp_path / "full")
    # blocks never straddle buckets, so "compact" means full relative to a
    # block size the per-bucket row counts can actually fill
    write_encoded(sequences_df(spark, 4000, seed=22, n_partitions=2), path, target_partitions=2, block_rows=64, resume=False)
    rep = compact_table(spark, path, block_rows=64)
    assert not rep["compacted"]


def test_recover_table_after_interrupted_swap(spark, tmp_path):
    """Simulate a crash between compact_table's two renames: the table is
    parked at <path>.old; read_encoded must recover it transparently."""
    import os

    from parquet_spark.operators.decode import read_encoded
    from parquet_spark.operators.encode import write_encoded
    from parquet_spark.sources.synth import sequences_df

    path = str(tmp_path / "crash_t")
    df = sequences_df(spark, 500, seed=9, n_partitions=2)
    write_encoded(df, path, target_partitions=2, resume=False)
    os.rename(path, path + ".old")  # the mid-swap crash state
    assert read_encoded(spark, path).count() == 500
    assert os.path.exists(os.path.join(path, "snapshot.json"))
    assert not os.path.exists(path + ".old")
