"""Explicit skew management: salted repartitioning for hot `source` values
and long token arrays (north-rule requirement — AQE alone is not relied on).

The plan: one cheap aggregation computes per-source weight (bytes ≈ sum of
n_tok); each source gets a salt-bucket count proportional to its weight, so
a source holding 30% of all tokens lands in ~30% of the buckets instead of
one hot partition. The bucket id is deterministic in (source, doc_id), which
also makes it the resumable-checkpoint key (operators/encode.py).

The per-source table is tiny (≈ distinct sources) and is broadcast; nothing
here scales with row count except the one distributed agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def plan_salted_buckets(
    df: DataFrame,
    target_partitions: int,
    source_col: str = "source",
    weight_col: str | None = "n_tok",
) -> list[tuple[str, int, int]]:
    """Returns [(source, bucket_offset, n_salts)]; total buckets ≈
    target_partitions, proportional to per-source weight."""
    w = F.sum(weight_col).alias("w") if weight_col else F.count("*").alias("w")
    rows = df.groupBy(source_col).agg(w).collect()
    rows.sort(key=lambda r: r[source_col])
    total = sum(r["w"] for r in rows) or 1
    plan: list[tuple[str, int, int]] = []
    offset = 0
    for r in rows:
        k = max(1, round(target_partitions * r["w"] / total))
        plan.append((r[source_col], offset, k))
        offset += k
    return plan


def with_salted_bucket(
    df: DataFrame,
    plan: list[tuple[str, int, int]],
    source_col: str = "source",
    salt_key: str = "doc_id",
    bucket_col: str = "__bucket",
) -> DataFrame:
    """Attach the deterministic bucket id: offset(source) +
    pmod(xxhash64(salt_key), n_salts(source))."""
    spark = df.sparkSession
    plan_df = spark.createDataFrame(plan, f"{source_col} string, __offset int, __k int")
    out = (
        df.join(F.broadcast(plan_df), source_col)
        .withColumn(bucket_col, (F.col("__offset") + F.pmod(F.xxhash64(salt_key), F.col("__k"))).cast("int"))
        .drop("__offset", "__k")
    )
    return out


def salted_repartition(
    df: DataFrame,
    target_partitions: int,
    source_col: str = "source",
    salt_key: str = "doc_id",
    weight_col: str | None = "n_tok",
    bucket_col: str = "__bucket",
) -> tuple[DataFrame, int]:
    """repartition(P, bucket) + sortWithinPartitions(bucket) so each encode
    task sees whole buckets contiguously (blocks never straddle buckets —
    the property the resumable checkpoint relies on)."""
    plan = plan_salted_buckets(df, target_partitions, source_col, weight_col)
    n_buckets = plan[-1][1] + plan[-1][2] if plan else target_partitions
    out = with_salted_bucket(df, plan, source_col, salt_key, bucket_col)
    return out.repartition(min(n_buckets, target_partitions), bucket_col).sortWithinPartitions(bucket_col), n_buckets
