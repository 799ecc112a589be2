"""Similarity search over an embedding column (`array<float>`).

Two tiers:
  knn_bruteforce — exact cosine top-k: broadcast the (small) query set
                   against the full corpus; one narrow shuffle for the
                   per-query top-k (window rank). The correctness baseline
                   and the oracle-checked path.
  knn_lsh        — random-hyperplane LSH (sign-bit bucketing, vectorized
                   pandas UDF): queries only score vectors sharing a
                   bucket in ≥1 of `n_tables` hash tables. The scale path:
                   probe cost is O(corpus/2^bits) per table instead of
                   O(corpus); recall measured against brute force in tests.

Float determinism: both Spark and the DuckDB oracle compute the dot/norms
as an explicit LEFT FOLD in float64 over the float32 inputs, so the IEEE
operation sequence — and therefore every last bit — is identical; results
are rounded to 6 decimals before ranking with (sim DESC, id ASC) tiebreak.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

SIM_ROUND = 6


def _fold_dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _fold_sq(a):
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)


def cosine_cols(a, b):
    a64 = a.cast("array<double>")
    b64 = b.cast("array<double>")
    return F.round(_fold_dot(a64, b64) / F.sqrt(_fold_sq(a64) * _fold_sq(b64)), SIM_ROUND)


def _fold_dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(list_zip(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])), "
        f"p -> p[1] * p[2])), (x, y) -> x + y)"
    )


def _fold_sq_sql(a: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(CAST({a} AS DOUBLE[]), v -> v * v)), (x, y) -> x + y)"
    )


def cosine_sql(a: str, b: str) -> str:
    return f"round({_fold_dot_sql(a, b)} / sqrt({_fold_sq_sql(a)} * {_fold_sq_sql(b)}), {SIM_ROUND})"


def knn_bruteforce(
    df: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for the first `n_queries` ids (deterministic query
    set). The query side is tiny → broadcast hash join, no shuffle of the
    corpus; ranking shuffles only (n_queries × corpus) scored rows pruned
    to k by the window."""
    q = df.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    scored = (
        df.alias("c")
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            F.col(id_col).alias("n_id"),
            cosine_cols(F.col("q_vec"), F.col(vec_col)).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "sim", "rnk")
    )


def knn_bruteforce_oracle(
    table: str = "embeddings", k: int = 5, n_queries: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    sim = cosine_sql(f"q.{vec_col}", f"c.{vec_col}")
    return (
        f"WITH q AS (SELECT {id_col}, {vec_col} FROM {table} WHERE {id_col} < {n_queries}), "
        f"s AS (SELECT q.{id_col} AS q_id, c.{id_col} AS n_id, {sim} AS sim "
        f"FROM {table} c CROSS JOIN q WHERE c.{id_col} <> q.{id_col}), "
        f"r AS (SELECT q_id, n_id, sim, row_number() OVER "
        f"(PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rnk FROM s) "
        f"SELECT q_id, n_id, sim, rnk FROM r WHERE rnk <= {k}"
    )


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. With `block_col` the join is
    an equi-join on the block (cluster/label/LSH bucket) — the scale path;
    block_col=None enumerates all pairs (testing only)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                  *( [F.col(block_col).alias("blk")] if block_col else []))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                  *( [F.col(block_col).alias("blk")] if block_col else []))
    joined = a.join(b, ([ "blk" ] if block_col else [])) if block_col else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine_cols(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def near_dup_oracle(
    table: str = "embeddings", threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding", block_col: str | None = "label",
) -> str:
    sim = cosine_sql(f"a.{vec_col}", f"b.{vec_col}")
    blk = f"AND a.{block_col} = b.{block_col} " if block_col else ""
    return (
        f"SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, {sim} AS sim "
        f"FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col} {blk}"
        f"WHERE {sim} >= {threshold}"
    )


# ----------------------------------------------------------------- LSH tier

# P(query and neighbor collide in one table) = (1 - θ/π)^BITS; at θ≈60°
# (cosine 0.5) that is (2/3)^4 ≈ 0.20 per table → 1-(1-0.2)^8 ≈ 0.83 recall
# over 8 tables. BITS should grow ~log2(corpus/target_bucket_size) at scale.
LSH_BITS = 4
LSH_TABLES = 8


def _hyperplanes(dim: int, seed: int = 13) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((LSH_TABLES, LSH_BITS, dim)).astype(np.float32)


def lsh_buckets(df: DataFrame, dim: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, table, bucket) sign-bit buckets — one matmul per Arrow batch."""
    planes = _hyperplanes(dim)

    @F.pandas_udf("array<int>")
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim) float32
        proj = np.einsum("bd,tkd->btk", m, planes)  # (batch, tables, bits)
        bits = (proj > 0).astype(np.int32)
        weights = (1 << np.arange(LSH_BITS, dtype=np.int32))
        return pd.Series(list((bits * weights).sum(axis=2).astype(np.int32)))

    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(bucket_udf(F.col(vec_col))).alias("table", "bucket"),
    )


def knn_lsh(
    df: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: candidates share an LSH bucket with the
    query in ≥1 table; exact rescoring + window top-k on candidates only."""
    buckets = lsh_buckets(df, dim, id_col, vec_col)
    qb = buckets.filter(F.col("id") < n_queries).withColumnRenamed("id", "q_id")
    cand = (
        buckets.join(qb, ["table", "bucket"])
        .filter(F.col("id") != F.col("q_id"))
        .select("q_id", F.col("id").alias("n_id"))
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    scored = (
        cand.join(F.broadcast(vecs.filter(F.col("vid") < n_queries)
                              .withColumnRenamed("vid", "q_id").withColumnRenamed("vec", "q_vec")), "q_id")
        .join(vecs.withColumnRenamed("vid", "n_id").withColumnRenamed("vec", "n_vec"), "n_id")
        .withColumn("sim", cosine_cols(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "sim", "rnk")
    )
