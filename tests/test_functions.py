"""SQL-expressible stats operators (parquet_spark.functions)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_run_length_stats_partitioned_matches_global(spark):
    """The partitioned variant (the 100-TB plan: hash shuffle + local sort
    instead of a one-partition global sort) must count the same runs when
    partition boundaries coincide with run boundaries, and its plan must
    not contain a single-partition Exchange."""
    from parquet_spark.functions import run_length_stats

    df = spark.range(0, 10_000).select(
        (F.col("id") / 100).cast("long").alias("grp"),  # 100 runs of 100
        F.col("id"),
    )
    g = run_length_stats(df, "grp", ["id"]).first()
    p = run_length_stats(df, "grp", ["id"], partition_col="grp").first()
    assert g["n_values"] == p["n_values"] == 10_000
    assert g["n_runs"] == p["n_runs"] == 100

    # the window input must be hash-partitioned; the only single-partition
    # exchange allowed is the final 2-row aggregate
    plan = run_length_stats(df, "grp", ["id"], partition_col="grp")._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(grp" in plan, plan
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_run_length_stats_partitioned_bounded_overcount(spark):
    """With arbitrary partitioning, per-partition counting over-counts by
    at most n_partitions - 1 boundary runs (documented contract)."""
    from parquet_spark.functions import run_length_stats

    df = spark.range(0, 1_000).select(
        F.lit(7).alias("v"),
        F.col("id"),
        (F.col("id") % 8).alias("pcol"),  # 8 partitions, one global run
    )
    g = run_length_stats(df, "v", ["id"]).first()
    p = run_length_stats(df, "v", ["id"], partition_col="pcol").first()
    assert g["n_runs"] == 1
    assert 1 <= p["n_runs"] <= 8
