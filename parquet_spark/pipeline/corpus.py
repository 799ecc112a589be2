"""Corpus-level statistics and hygiene operators for training-data
pipelines: n-gram frequency, benchmark-contamination detection, and
boilerplate-segment removal (CCNet-style repeated-paragraph dedup).

All operators are pure Spark built-in expression trees — no Python UDFs —
so they run entirely inside whole-stage codegen and shuffle only on their
natural keys (the n-gram / segment), which is the 100-TB shape: nothing
enumerates document pairs, hot keys are bounded by `top_k`/`min_df`
semantics, and every aggregation is map-side combinable.

Word semantics match pipeline.textops/dedup: lowercase, split on
whitespace, empty tokens dropped — so oracle SQL is shared across the
pipeline modules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _words(text: Column) -> Column:
    return F.filter(F.split(F.trim(F.lower(text)), r"\s+"), lambda w: w != F.lit(""))


def _word_ngrams(text: Column, n: int) -> Column:
    """Array of word n-grams ('_'-joined) of `text`; empty when the text
    has fewer than n words. Built-ins only: transform over an index
    sequence + slice."""
    words = _words(text)
    k = F.size(words) - F.lit(n - 1)
    return F.when(k > 0, F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws("_", F.slice(words, i, n)),
    )).otherwise(F.array().cast("array<string>"))


def ngram_counts(
    df: DataFrame,
    n: int = 3,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Top-k word n-grams by total occurrence count → (ngram, n_occurrences).

    Ordering is fully deterministic: count desc, then ngram asc, limit k.
    One explode + one shuffle on the n-gram key with map-side partial
    aggregation; the result is bounded by top_k, so the driver-side
    footprint is O(k) regardless of corpus size. Used for corpus
    vocabulary audits and building contamination indexes."""
    grams = df.select(F.explode(_word_ngrams(F.col(text_col), n)).alias("ngram"))
    return (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(top_k)
    )


def ngram_counts_oracle(
    table: str = "documents", n: int = 3, top_k: int = 100, text_col: str = "text"
) -> str:
    w = f"list_filter(string_split_regex(trim(lower({text_col})), '\\s+'), x -> x <> '')"
    gram = f"array_to_string(w[i:i+{n - 1}], '_')"
    return (
        f"WITH d AS (SELECT {w} AS w FROM {table}), "
        f"g AS (SELECT {gram} AS ngram FROM d, "
        f"unnest(range(1, len(w) - {n - 1} + 1)) AS t(i)) "
        f"SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences FROM g "
        f"GROUP BY ngram ORDER BY n_occurrences DESC, ngram ASC LIMIT {top_k}"
    )


def contamination(
    df: DataFrame,
    bench: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination check: per corpus document, how many
    DISTINCT word n-grams it shares with the benchmark set →
    (doc_id, n_shared), contaminated docs only, ordered by id.

    The benchmark n-gram set is deduplicated and joined on the n-gram
    key (equi-join, broadcastable when the benchmark is small — the
    normal case: eval sets are tiny next to a training corpus). No
    document-pair enumeration anywhere."""
    doc_grams = df.select(
        F.col(id_col), F.explode(_word_ngrams(F.col(text_col), n)).alias("ngram")
    ).distinct()
    bench_grams = bench.select(
        F.explode(_word_ngrams(F.col(text_col), n)).alias("ngram")
    ).distinct()
    return (
        doc_grams.join(F.broadcast(bench_grams), "ngram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
        .orderBy(id_col)
    )


def contamination_oracle(
    table: str = "documents",
    bench_where: str = "doc_id % 10 = 0",
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    w = f"list_filter(string_split_regex(trim(lower({text_col})), '\\s+'), x -> x <> '')"
    gram = f"array_to_string(w[i:i+{n - 1}], '_')"
    return (
        f"WITH d AS (SELECT {id_col} AS id, {w} AS w FROM {table}), "
        f"dg AS (SELECT DISTINCT id, {gram} AS ngram FROM d, "
        f"unnest(range(1, len(w) - {n - 1} + 1)) AS t(i)), "
        f"b AS (SELECT {id_col} AS id, {w} AS w FROM {table} WHERE {bench_where}), "
        f"bg AS (SELECT DISTINCT {gram} AS ngram FROM b, "
        f"unnest(range(1, len(w) - {n - 1} + 1)) AS t(i)) "
        f"SELECT dg.id AS {id_col}, CAST(count(*) AS BIGINT) AS n_shared "
        f"FROM dg JOIN bg USING (ngram) GROUP BY dg.id ORDER BY dg.id"
    )


def boilerplate_segments(
    df: DataFrame,
    min_df: int = 2,
    sep: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segments (lines/paragraphs, split on `sep`) that occur in at least
    `min_df` DISTINCT documents → (segment, n_docs) — the CCNet-style
    boilerplate inventory (navigation chrome, licence footers, repeated
    headers). Document frequency, not occurrence count.

    One explode + one distinct + one count shuffle, all on the segment
    key; min_df bounds the result to genuinely repeated segments."""
    seg = F.explode(F.split(F.col(text_col), sep)).alias("segment")
    segs = df.select(F.col(id_col), seg).where(F.col("segment") != "").distinct()
    return (
        segs.groupBy("segment")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_df)
        .orderBy(F.col("n_docs").desc(), F.col("segment").asc())
    )


def boilerplate_segments_oracle(
    table: str = "documents",
    min_df: int = 2,
    sep_sql: str = "chr(10)",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    return (
        f"WITH s AS (SELECT DISTINCT {id_col} AS id, "
        f"unnest(string_split({text_col}, {sep_sql})) AS segment FROM {table}) "
        f"SELECT segment, CAST(count(*) AS BIGINT) AS n_docs FROM s "
        f"WHERE segment <> '' GROUP BY segment HAVING count(*) >= {min_df} "
        f"ORDER BY n_docs DESC, segment ASC"
    )


def strip_boilerplate(
    df: DataFrame,
    min_df: int = 2,
    sep: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove boilerplate segments from every document → (doc_id,
    text_clean): each document is rebuilt from its segments minus those
    occurring in ≥ min_df distinct documents, original order preserved.

    The boilerplate set is aggregated once and joined back on the segment
    key (left_anti, broadcastable — the boilerplate inventory is tiny
    next to the corpus); segment order is restored via posexplode +
    array_sort on (pos, segment) structs, never a window over the
    corpus."""
    bp = boilerplate_segments(df, min_df=min_df, sep=sep, text_col=text_col, id_col=id_col)
    seg = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "segment"),
    )
    kept = seg.join(F.broadcast(bp.select("segment")), "segment", "left_anti")
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "segment"))),
                    lambda s: s["segment"],
                ),
                sep,
            ).alias("text_clean")
        )
        .orderBy(id_col)
    )
