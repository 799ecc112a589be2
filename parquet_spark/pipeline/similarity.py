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

# P(query and neighbor collide in one table) = (1 - θ/π)^bits; at θ≈60°
# (cosine 0.5) that is (2/3)^4 ≈ 0.20 per table → 1-(1-0.2)^8 ≈ 0.83 recall
# over 8 tables. bits grows ~log2(corpus/target_bucket_size) at scale —
# adaptive_lsh_bits derives it from the corpus size (pass bits=None).
LSH_BITS = 4
LSH_TABLES = 8
LSH_TARGET_BUCKET = 128


def adaptive_lsh_bits(n_rows: int, target_bucket: int = LSH_TARGET_BUCKET) -> int:
    """Hash width that keeps E[bucket size] ≈ target_bucket: at 10⁹ vectors
    this gives 23 bits (≈120 rows/bucket) instead of a fixed 4 (62M/bucket,
    which would re-quadratize the candidate join)."""
    import math

    return max(LSH_BITS, min(30, math.ceil(math.log2(max(n_rows, 1) / target_bucket))))


def _hyperplanes(dim: int, bits: int = LSH_BITS, tables: int = LSH_TABLES, seed: int = 13) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, bits, dim)).astype(np.float32)


def lsh_buckets(
    df: DataFrame, dim: int, id_col: str = "vec_id", vec_col: str = "embedding",
    bits: int | None = None,
) -> DataFrame:
    """(id, table, bucket) sign-bit buckets. The projection is a float64
    LEFT FOLD over dimensions (not einsum/BLAS, whose summation order is
    implementation-defined) so the DuckDB oracle reproduces every sign bit
    exactly. bits=None derives the hash width from the corpus size."""
    if bits is None:
        bits = adaptive_lsh_bits(df.count())
    planes = _hyperplanes(dim, bits).astype(np.float64)  # (tables, bits, dim)
    n_bits = bits

    @F.pandas_udf("array<long>")
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        proj = np.zeros((len(m), LSH_TABLES, n_bits))
        for d in range(dim):  # sequential fold: acc += m[d] * plane[d]
            proj += m[:, d, None, None] * planes[None, :, :, d]
        bits_m = (proj > 0).astype(np.int64)
        weights = np.int64(1) << np.arange(n_bits, dtype=np.int64)
        return pd.Series(list((bits_m * weights).sum(axis=2)))

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
    bits: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates share an LSH bucket with the
    query in ≥1 table; exact rescoring + window top-k on candidates only.
    bits=None sizes the hash width to the corpus (adaptive_lsh_bits)."""
    buckets = lsh_buckets(df, dim, id_col, vec_col, bits=bits)
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


def knn_lsh_oracle(
    table: str = "embeddings",
    k: int = 5,
    n_queries: int = 10,
    dim: int = 64,
    bits: int = LSH_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Exact SQL replica of knn_lsh: the hyperplane constants are embedded
    (float32 planes printed as round-trip float64 decimals) and each
    projection is the same left-to-right float64 term sum the UDF computes,
    so every sign bit — hence the candidate set, hence the output — is
    bit-identical. Generated SQL is large (~tables*bits*dim terms) but
    that is the price of hash-exactness for a data-dependent bucketing."""
    planes = _hyperplanes(dim, bits).astype(np.float64)  # (tables, bits, dim)

    def proj_sql(t: int, b: int) -> str:
        return " + ".join(
            f"CAST({vec_col}[{d + 1}] AS DOUBLE) * {planes[t, b, d]!r}" for d in range(dim)
        )

    def bucket_sql(t: int) -> str:
        return " + ".join(
            f"(CASE WHEN {proj_sql(t, b)} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)
        )

    buckets = ", ".join(bucket_sql(t) for t in range(LSH_TABLES))
    tbls = ", ".join(str(t) for t in range(LSH_TABLES))
    sim = cosine_sql(f"qv.{vec_col}", f"nv.{vec_col}")
    return (
        f"WITH b AS (SELECT {id_col} AS id, unnest([{buckets}]) AS bucket, "
        f"unnest([{tbls}]) AS tbl FROM {table}), "
        f"qb AS (SELECT id AS q_id, tbl, bucket FROM b WHERE id < {n_queries}), "
        f"cand AS (SELECT DISTINCT qb.q_id, b.id AS n_id FROM b JOIN qb "
        f"USING (tbl, bucket) WHERE b.id <> qb.q_id), "
        f"s AS (SELECT c.q_id, c.n_id, {sim} AS sim FROM cand c "
        f"JOIN {table} qv ON qv.{id_col} = c.q_id "
        f"JOIN {table} nv ON nv.{id_col} = c.n_id), "
        f"r AS (SELECT q_id, n_id, sim, row_number() OVER "
        f"(PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rnk FROM s) "
        f"SELECT q_id, n_id, sim, rnk FROM r WHERE rnk <= {k}"
    )


# ----------------------------------------------------------------- IVF tier

def ivf_fit_cap(n_lists: int, max_fit_rows: int | None = None) -> int:
    """Upper bound on k-means training rows: ~256 per centroid (FAISS
    guidance) — quantizer quality is insensitive to more."""
    return max_fit_rows if max_fit_rows is not None else 256 * n_lists


def ivf_index(
    df: DataFrame,
    n_lists: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 17,
    max_fit_rows: int | None = None,
) -> "tuple[DataFrame, object]":
    """IVF coarse quantizer. Returns an (assignments, KMeansModel) TUPLE:
    assignments is (id, list_id) — the inverted-file bucketing that bounds
    ANN probe cost to nprobe/n_lists of the corpus; the model carries the
    centroids for query-side probing. n_lists=None uses the ~sqrt(n) rule
    of thumb (FAISS guidance), so bucket size scales as sqrt(n).

    The k-means FIT trains on a sample capped at ivf_fit_cap(n_lists)
    rows (~256 per centroid): at 10⁹ vectors a full-corpus fit would
    dominate the whole index build while adding nothing to recall — only
    the cheap transform (assignment) touches every vector. One count job
    total, reused for n_lists and the sample fraction."""
    import math

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    n = df.count()
    if n_lists is None:
        n_lists = max(4, min(4096, int(math.sqrt(n))))
    feats = df.select(F.col(id_col).alias("id"), array_to_vector(F.col(vec_col)).alias("features"))
    cap = ivf_fit_cap(n_lists, max_fit_rows)
    fit_input = feats if n <= cap else feats.sample(fraction=min(1.0, cap / n), seed=seed)
    model = KMeans(k=n_lists, seed=seed, maxIter=10).fit(fit_input)
    return model.transform(feats).select("id", F.col("prediction").alias("list_id")), model


def knn_ivf(
    df: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    nprobe: int = 4,
    n_lists: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate cosine top-k: each query scores only the vectors in
    its `nprobe` nearest centroid lists — probe cost ≈ nprobe/n_lists of
    the corpus (vs every vector for brute force). Exact rescoring + window
    top-k on the probed candidates; recall vs brute force is pinned in
    tests. Non-SQL-expressible (k-means training), so this op carries no
    DuckDB oracle — the recall assertion is its check."""
    assigns, model = ivf_index(df, n_lists, dim, id_col, vec_col)
    centers = model.clusterCenters()
    planes = np.stack(centers)  # (n_lists, dim)

    planes_sq = (planes**2).sum(axis=1)  # ‖c‖² per centroid, once

    @F.pandas_udf("array<int>")
    def probe_udf(vecs: pd.Series) -> pd.Series:
        # ‖q−c‖² = ‖q‖² + ‖c‖² − 2 q·c; the per-query ‖q‖² term is
        # constant within a row, so argsort needs only ‖c‖² − 2 q·cᵀ —
        # a (chunk × n_lists) matmul instead of the full
        # (batch × n_lists × dim) difference cube (r6 fix of the r5
        # review nit: with √n lists at 10⁹ vectors the cube is tens of
        # GB per batch; the matmul form is bounded by the chunk size)
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        outs = []
        for lo in range(0, len(m), 4096):
            chunk = m[lo : lo + 4096]
            d = planes_sq[None, :] - 2.0 * (chunk @ planes.T)
            outs.append(np.argsort(d, axis=1)[:, :nprobe].astype(np.int32))
        order = np.concatenate(outs) if outs else np.zeros((0, nprobe), np.int32)
        return pd.Series(list(order))

    q = df.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.explode(probe_udf(F.col(vec_col))).alias("list_id"),
    )
    cand = (
        assigns.join(q, "list_id")
        .filter(F.col("id") != F.col("q_id"))
        .select("q_id", "q_vec", F.col("id").alias("n_id"))
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = cand.join(vecs, "n_id").withColumn("sim", cosine_cols(F.col("q_vec"), F.col("n_vec")))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "sim", "rnk")
    )
