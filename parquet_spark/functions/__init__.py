"""SQL-expressible statistics operators (DataFrame API, oracle-checkable).

These are the queryable faces of the engine's stats layer (reference ops
T1-T7, /root/reference/parquet.go:102-107 and gen/template_*.go stats
blocks, upgraded per SURVEY.md §2.4): min/max/null-count parity, exact ndv
(the reference declares DistinctCount but never computes it —
template_required.go:102-104), run-length structure via window functions,
and the deterministic dictionary-size estimator that drives codec choice.

Every helper aliases its outputs so the DuckDB oracle can match columns
by name (driver contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def minmax_null_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row: min_<c>, max_<c>, nulls_<c> per column (reference T1-T6)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
    return df.agg(*aggs)


def ndv_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact distinct counts (T7 upgraded — drives dict-codec selection)."""
    return df.agg(*[F.countDistinct(c).alias(f"ndv_{c}") for c in cols])


def run_length_stats(
    df: DataFrame, col: str, order_cols: list[str], partition_col: str | None = None
) -> DataFrame:
    """Run structure of `col` under a total order: n_values, n_runs.

    With `partition_col` (a column name OR expression string, e.g.
    "pmod(l_orderkey, 16)") the window is partitioned — each partition's
    runs are counted independently after one hash shuffle (the 100-TB
    plan; n_runs is then the sum of per-partition runs, which over-counts
    by at most n_partitions-1 boundary runs — exact per partition, and
    deterministic whenever order_cols is a total order within each
    partition). Without it, the single unpartitioned window is a
    ONE-PARTITION global sort: keep it for oracle parity / small
    relations only. The engine's production path computes run stats per
    block inside the encode kernel (stats/analyze.py) with no shuffle at
    all."""
    if partition_col is not None:
        w = Window.partitionBy(F.expr(partition_col)).orderBy(*[F.col(c) for c in order_cols])
    else:
        w = Window.orderBy(*[F.col(c) for c in order_cols])
    # null-safe run semantics: NULL is a value, a stretch of NULLs is one
    # run. `lag IS NULL` can't mark run starts (the previous VALUE may be
    # NULL) — row_number()==1 marks them, eqNullSafe compares the rest.
    changed = (F.row_number().over(w) == 1) | ~F.col(col).eqNullSafe(F.lag(col, 1).over(w))
    runs = df.select(changed.cast("long").alias("chg"))
    return runs.agg(
        F.count("*").alias("n_values"),
        F.sum("chg").alias("n_runs"),
    )


def dict_size_estimate(df: DataFrame, col: str, value_bytes: int) -> DataFrame:
    """Deterministic dictionary-encoding size model: index bits =
    ceil(log2(ndv)), estimated bytes = n*bits/8 + ndv*value_bytes."""
    agg = df.agg(F.count(col).alias("n"), F.countDistinct(col).alias("ndv"))
    bits = F.ceil(F.log2(F.greatest(F.col("ndv"), F.lit(2))))
    return agg.select(
        "n",
        "ndv",
        bits.cast("long").alias("idx_bits"),
        (F.ceil(F.col("n") * bits / 8) + F.col("ndv") * F.lit(value_bytes)).cast("long").alias("est_bytes"),
    )


def source_weight_plan(df: DataFrame, source_col: str, weight_col: str) -> DataFrame:
    """The salted-repartition planning aggregation (operators/repartition.py)
    as an oracle-checkable relation: per-source weight."""
    return df.groupBy(source_col).agg(F.sum(weight_col).alias("weight")).orderBy(source_col)
