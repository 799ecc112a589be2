"""Corpus hygiene/statistics operators: n-gram counts, contamination,
boilerplate segment inventory + removal (pipeline/corpus.py)."""

import pytest

from parquet_spark.pipeline import corpus


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox sleeps all day long today"),
        (3, "pack my box with five dozen liquor jugs"),
        (4, "the quick brown fox jumps over a fence"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_ngram_counts_deterministic_topk(docs):
    got = corpus.ngram_counts(docs, n=3, top_k=5).collect()
    # both top grams tie at 3; ascending-ngram tiebreak orders them
    assert got[0]["ngram"] == "quick_brown_fox"
    assert got[0]["n_occurrences"] == 3
    assert got[1]["ngram"] == "the_quick_brown"
    assert got[1]["n_occurrences"] == 3
    # deterministic tiebreak: count desc then ngram asc
    counts = [r["n_occurrences"] for r in got]
    assert counts == sorted(counts, reverse=True)
    assert len(got) == 5


def test_ngram_counts_short_text(spark):
    one = spark.createDataFrame([(1, "hi")], "doc_id long, text string")
    assert corpus.ngram_counts(one, n=3).count() == 0


def test_contamination_counts_distinct_shared(docs, spark):
    bench = docs.where("doc_id = 1")  # doc 1 is the 'eval set'
    got = {r["doc_id"]: r["n_shared"] for r in corpus.contamination(docs, bench, n=3).collect()}
    assert got[1] == 7  # doc 1 shares everything with itself (7 trigrams)
    # doc 4 shares 'the quick brown', 'quick brown fox', 'brown fox jumps',
    # 'fox jumps over' with doc 1
    assert got[4] == 4
    assert got[2] == 2  # 'the quick brown', 'quick brown fox'
    assert 3 not in got  # no shared trigram → not reported


def test_boilerplate_segments_and_strip(spark):
    rows = [
        (1, "intro A\ncopyright foo corp\nbody one"),
        (2, "intro B\ncopyright foo corp\nbody two\nsubscribe now"),
        (3, "intro C\nbody three\nsubscribe now\ncopyright foo corp"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bp = {r["segment"]: r["n_docs"] for r in corpus.boilerplate_segments(df, min_df=2).collect()}
    assert bp == {"copyright foo corp": 3, "subscribe now": 2}
    clean = {r["doc_id"]: r["text_clean"] for r in corpus.strip_boilerplate(df, min_df=2).collect()}
    assert clean[1] == "intro A\nbody one"
    assert clean[2] == "intro B\nbody two"
    assert clean[3] == "intro C\nbody three"  # order preserved, both removed


def test_oracle_parity_duckdb(spark):
    """The SQL oracles reproduce the Spark results hash-exactly on a
    multi-doc fixture (the same check the driver gate runs on sf0.01)."""
    import duckdb

    rows = [
        (i, " ".join(["alpha beta gamma delta"] * (i % 3 + 1)) + f" tail{i}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("documents", df.toPandas())

    got = corpus.ngram_counts(df, n=3, top_k=10).toPandas()
    want = con.execute(corpus.ngram_counts_oracle("documents", n=3, top_k=10)).fetchdf()
    assert got.values.tolist() == want.values.tolist()

    bench = df.where("doc_id % 10 = 0")
    got_c = corpus.contamination(df, bench, n=5).toPandas()
    want_c = con.execute(corpus.contamination_oracle("documents", "doc_id % 10 = 0", n=5)).fetchdf()
    assert got_c.values.tolist() == want_c.values.tolist()

    got_b = corpus.boilerplate_segments(df, min_df=2, sep=" ").toPandas()
    want_b = con.execute(
        corpus.boilerplate_segments_oracle("documents", min_df=2, sep_sql="' '")
    ).fetchdf()
    assert got_b.values.tolist() == want_b.values.tolist()
