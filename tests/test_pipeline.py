"""Training-data pipeline operators: dedup, similarity, textops, multimodal.

Each deterministic operator is checked against its colocated DuckDB oracle
SQL (the same comparison the driver's correctness gate runs); approximate
operators (SimHash, LSH-ANN) are checked for determinism + recall against
their exact counterparts.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_oracle_match(spark_df, ddb, sql: str):
    got = _norm(spark_df.toPandas())
    want = _norm(ddb.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"rows {len(got)} != {len(want)}"
    for c in got.columns:
        gv, wv = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(np.asarray(gv).dtype, np.floating) or np.issubdtype(np.asarray(wv).dtype, np.floating):
            np.testing.assert_allclose(gv.astype(float), wv.astype(float), rtol=0, atol=1e-9, err_msg=c)
        else:
            assert (gv == wv).all(), f"column {c} mismatch"


# ------------------------------------------------------------------ textops

def test_token_counts_oracle(docs, ddb):
    from parquet_spark.pipeline import textops

    assert_oracle_match(textops.token_counts(docs), ddb, textops.token_counts_oracle())


def test_quality_scores_oracle(docs, ddb):
    from parquet_spark.pipeline import textops

    assert_oracle_match(textops.quality_scores(docs), ddb, textops.quality_scores_oracle())


def test_language_id_oracle(docs, ddb):
    from parquet_spark.pipeline import textops

    assert_oracle_match(textops.language_id(docs), ddb, textops.language_id_oracle())


def test_fingerprints_oracle(docs, ddb):
    from parquet_spark.pipeline import textops

    assert_oracle_match(textops.fingerprints(docs), ddb, textops.fingerprints_oracle())


# -------------------------------------------------------------------- dedup

def test_dedup_exact_oracle(docs, ddb):
    from parquet_spark.pipeline import dedup

    assert_oracle_match(dedup.dedup_exact(docs), ddb, dedup.dedup_exact_oracle())


def test_dedup_exact_finds_injected_dupes(spark):
    from parquet_spark.pipeline import dedup

    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "unique text")],
        "doc_id long, text string",
    )
    out = {r["keep_id"]: r["n_dupes"] for r in dedup.dedup_exact(df).collect()}
    assert out == {1: 2, 3: 1}


def test_ngram_jaccard_oracle(docs, ddb):
    from parquet_spark.pipeline import dedup

    assert_oracle_match(
        dedup.ngram_jaccard_pairs(docs, threshold=0.2), ddb,
        dedup.ngram_jaccard_oracle(threshold=0.2, max_df="auto"),
    )


def test_minhash_matches_exact_jaccard(spark, docs, ddb):
    """b=64/r=2 recall at the threshold is ~1 − verified output must equal
    the exact operator's pairs."""
    from parquet_spark.pipeline import dedup

    got = dedup.minhash_lsh_pairs(docs, threshold=0.4).toPandas()
    want = ddb.execute(dedup.ngram_jaccard_oracle(threshold=0.4)).df()
    assert_oracle_match_frames(got, want)


def assert_oracle_match_frames(got: pd.DataFrame, want: pd.DataFrame):
    g, w = _norm(got), _norm(want)
    assert len(g) == len(w)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(np.asarray(gv).dtype, np.floating):
            np.testing.assert_allclose(gv.astype(float), wv.astype(float), atol=1e-9)
        else:
            assert (gv == wv).all()


def test_simhash_deterministic_and_self_dup(spark):
    from parquet_spark.pipeline import dedup

    base = " ".join(f"word{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base + " ending one"),
         (2, base + " ending two"),
         (3, " ".join(f"other{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    sigs1 = {r["id"]: r["simhash"] for r in dedup.simhash_signatures(df).collect()}
    sigs2 = {r["id"]: r["simhash"] for r in dedup.simhash_signatures(df).collect()}
    assert sigs1 == sigs2  # deterministic
    pairs = dedup.simhash_pairs(df, max_hamming=5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found  # one-word difference → small hamming
    assert (1, 3) not in found and (2, 3) not in found


# --------------------------------------------------------------- similarity

def test_knn_bruteforce_oracle(emb, ddb):
    from parquet_spark.pipeline import similarity

    assert_oracle_match(
        similarity.knn_bruteforce(emb, k=5, n_queries=10), ddb,
        similarity.knn_bruteforce_oracle(k=5, n_queries=10),
    )


def test_near_dup_oracle(emb, ddb):
    from parquet_spark.pipeline import similarity

    assert_oracle_match(
        similarity.near_dup_pairs(emb, threshold=0.3), ddb,
        similarity.near_dup_oracle(threshold=0.3),
    )


def test_knn_lsh_recall(emb):
    from parquet_spark.pipeline import similarity

    exact = similarity.knn_bruteforce(emb, k=5, n_queries=10).toPandas()
    approx = similarity.knn_lsh(emb, k=5, n_queries=10, dim=64).toPandas()
    e = {(r.q_id, r.n_id) for r in exact.itertuples()}
    a = {(r.q_id, r.n_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall {recall} too low"


# --------------------------------------------------------------- multimodal

def test_media_features_oracle(docs, ddb):
    from parquet_spark.pipeline import multimodal

    assert_oracle_match(
        multimodal.media_features(docs), ddb, multimodal.media_features_oracle()
    )


def test_decode_media_stub():
    from parquet_spark.pipeline import multimodal

    assert list(multimodal.decode_media(b"abc", "raw")) == [97, 98, 99]
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\xff\xd8", "jpeg")


def test_frame_sample_plumbing(spark, docs):
    from parquet_spark.pipeline import multimodal

    media = multimodal.attach_media(docs.limit(20))
    out = multimodal.frame_sample(media, every_n=7).toPandas()
    assert len(out) == 20
    assert (out["n_frames"] > 0).all()
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in out.itertuples():
        assert bytes(r.frames) == src[r.media_id][::7]


def test_simhash_oracle(docs, ddb):
    """SimHash is deterministic → exact DuckDB oracle: FNV-1a word hashes,
    bit votes, all-pairs Hamming ≤ 3 (band blocking is recall-lossless)."""
    from parquet_spark.pipeline import dedup

    assert_oracle_match(
        dedup.simhash_pairs(docs, max_hamming=3), ddb, dedup.simhash_oracle(max_hamming=3)
    )


def test_knn_lsh_oracle(emb, ddb):
    """The oracle embeds the hyperplanes and replicates the float64 fold,
    so bucket bits — and the whole output — are bit-identical."""
    from parquet_spark.pipeline import similarity

    assert_oracle_match(
        similarity.knn_lsh(emb, k=5, n_queries=10, dim=64, bits=4), ddb,
        similarity.knn_lsh_oracle(k=5, n_queries=10, dim=64, bits=4),
    )


def test_adaptive_lsh_bits_scale():
    from parquet_spark.pipeline.similarity import LSH_TARGET_BUCKET, adaptive_lsh_bits

    assert adaptive_lsh_bits(1_000) == 4          # floor at the legacy width
    assert adaptive_lsh_bits(10**6) == 13
    assert adaptive_lsh_bits(10**9) == 23
    # derived width keeps expected bucket size near the target at any n
    for n in (10**5, 10**7, 10**9, 10**12):
        bits = adaptive_lsh_bits(n)
        assert bits == 30 or n / (1 << bits) <= LSH_TARGET_BUCKET


def test_ngram_jaccard_hot_shingle_capped(spark):
    """Skew control: a stop-bigram shared by every document must not
    explode the candidate join — with the default auto cap the planted hot
    shingle is dropped from blocking, real near-dups are still found via
    their rare shingles, and hot-shingle-only pairs are (documentedly) not
    proposed."""
    from parquet_spark.pipeline import dedup

    n = 300
    rows = [(i, f"of the unique{i} tokens{i} tail{i}") for i in range(n)]
    # two real near-dups sharing rare shingles
    rows += [(n, "alpha beta gamma delta epsilon zeta"),
             (n + 1, "alpha beta gamma delta epsilon eta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.ngram_jaccard_pairs(df, threshold=0.3).toPandas()
    pairs = {(r.id_a, r.id_b) for r in out.itertuples()}
    assert (n, n + 1) in pairs
    # every proposed pair shares a NON-hot shingle; "of the" (df=300) is
    # excluded from blocking so no quadratic fan-out of hot-only pairs
    assert len(out) < 10


def test_simhash_blocking_invariant(spark, docs, ddb):
    """Output is identical for every n_blocks > max_hamming (pigeonhole
    recall = 1): legacy B=4 and scale blockings B=5..7 all equal the
    all-pairs oracle."""
    from parquet_spark.pipeline import dedup

    want = ddb.execute(dedup.simhash_oracle(max_hamming=3)).df()
    for n_blocks in (4, 5, 7):
        got = dedup.simhash_pairs(docs, max_hamming=3, n_blocks=n_blocks).toPandas()
        assert_oracle_match_frames(got, want)


def test_adaptive_simhash_blocks_scale():
    from parquet_spark.pipeline.dedup import adaptive_simhash_blocks

    assert adaptive_simhash_blocks(1_000) == 4            # 16-bit keys suffice
    assert adaptive_simhash_blocks(10**9) >= 5            # ≥24-bit keys
    assert adaptive_simhash_blocks(10**12) >= 6           # ≥30-bit keys
    big = adaptive_simhash_blocks(10**15)
    assert 4 < big <= 10


def test_vectorized_word_and_bigram_extraction_matches_python():
    """The Arrow/numpy word splitter and fold-continuation bigram hasher
    must equal the scalar Python reference ((t or '').lower().split();
    FNV-1a over 'w1 w2') on every edge: empties, nulls, repeated and
    multi-whitespace, unicode case."""
    import pandas as pd

    from parquet_spark.pipeline.dedup import _bigram_hashes, _split_words

    def fnv(s: str) -> int:
        h = 0xCBF29CE484222325
        for by in s.encode():
            h = ((h ^ by) * 0x100000001B3) % (1 << 64)
        return h

    texts = pd.Series([
        "Hello  World", "", None, "  a\tb\nc  ", "one", "x y x y",
        "Ünïcode WÖRDS here", "trailing space ", " leading",
    ])
    words, counts = _split_words(texts)
    py_words = [("" if t is None else t).lower().split() for t in texts]
    assert words.to_pylist() == [w for doc in py_words for w in doc]
    assert counts.tolist() == [len(doc) for doc in py_words]
    hb, bcounts = _bigram_hashes(words, counts)
    py_bigrams = [f"{doc[i]} {doc[i+1]}" for doc in py_words for i in range(len(doc) - 1)]
    assert bcounts.tolist() == [max(len(doc) - 1, 0) for doc in py_words]
    assert [int(h) for h in hb] == [fnv(g) for g in py_bigrams]


def test_dedup_components_planted_graph(spark):
    """Chain a-b-c plus isolated pair d-e: every node maps to its
    cluster's min id, chain transitivity included."""
    from parquet_spark.pipeline import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (20, 21)], "id_a long, id_b long"
    )
    got = {r["id"]: r["keep_id"] for r in dedup.dedup_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 20: 20, 21: 20}


def test_dedup_components_oracle(docs, ddb):
    from parquet_spark.pipeline import dedup

    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.2)
    assert_oracle_match(
        dedup.dedup_components(pairs), ddb,
        dedup.dedup_components_oracle(dedup.ngram_jaccard_oracle(threshold=0.2, max_df="auto")),
    )


def test_quality_filter_oracle(docs, ddb):
    from parquet_spark.pipeline import textops

    assert_oracle_match(
        textops.quality_filter(docs, min_score=0.5), ddb,
        textops.quality_filter_oracle(min_score=0.5),
    )


def test_sample_by_hash_oracle_and_determinism(spark, docs, ddb):
    from parquet_spark.pipeline import textops

    out = textops.sample_by_hash(docs, rate=0.25)
    assert_oracle_match(out, ddb, textops.sample_by_hash_oracle(rate=0.25))
    # deterministic across runs and partitionings
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in textops.sample_by_hash(docs.repartition(7), rate=0.25).collect())
    assert a == b
    # rate lands near the target
    n = docs.count()
    assert 0.1 * n <= len(a) <= 0.4 * n


def test_knn_ivf_recall(emb):
    """IVF coarse quantizer (k-means lists + nprobe probing): recall vs
    brute force must clear the same bar as the LSH tier while scoring only
    a fraction of the corpus per query."""
    from parquet_spark.pipeline import similarity

    exact = similarity.knn_bruteforce(emb, k=5, n_queries=10).toPandas()
    approx = similarity.knn_ivf(emb, k=5, n_queries=10, nprobe=4, n_lists=16).toPandas()
    e = {(r.q_id, r.n_id) for r in exact.itertuples()}
    a = {(r.q_id, r.n_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall {recall} too low"
    # probe cost bound: candidates scored << corpus * n_queries
    assigns, _ = similarity.ivf_index(emb, n_lists=16)
    sizes = assigns.groupBy("list_id").count().toPandas()["count"]
    assert sizes.max() < emb.count()  # lists actually partition the corpus


def test_dedup_components_deep_chain(spark):
    """A 25-edge path graph needs >20 label-propagation rounds; the
    periodic localCheckpoint keeps the logical plan shallow so the loop
    finishes without Catalyst re-analyzing an ever-deeper tree."""
    from parquet_spark.pipeline import dedup

    n = 26
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {r["id"]: r["keep_id"] for r in dedup.dedup_components(pairs, max_iters=40).collect()}
    assert got == {i: 0 for i in range(n)}


def test_ivf_fit_input_bounded(emb):
    """The k-means quantizer trains on a bounded sample (~256 rows per
    centroid), never the full corpus — the 100-TB scale requirement."""
    from parquet_spark.pipeline import similarity

    n = emb.count()
    cap = similarity.ivf_fit_cap(4, max_fit_rows=None)
    assert cap == 1024
    # with a tiny explicit cap the index still builds and still partitions
    assigns, model = similarity.ivf_index(emb, n_lists=4, max_fit_rows=64)
    assert assigns.count() == n  # every vector assigned despite sampled fit
    assert assigns.select("list_id").distinct().count() > 1
    # recall path unchanged: sampled-fit IVF still finds real neighbors
    exact = similarity.knn_bruteforce(emb, k=5, n_queries=5).toPandas()
    approx = similarity.knn_ivf(emb, k=5, n_queries=5, nprobe=3, n_lists=8).toPandas()
    e = {(r.q_id, r.n_id) for r in exact.itertuples()}
    a = {(r.q_id, r.n_id) for r in approx.itertuples()}
    assert len(e & a) / len(e) >= 0.5


def test_media_features_all_empty_payloads(spark):
    """A batch whose payloads are ALL empty has a zero-length data buffer —
    the gather must not index into it (regression: IndexError)."""
    from parquet_spark.pipeline import multimodal

    docs = spark.createDataFrame(
        [(i, "") for i in range(5)], "doc_id long, text string"
    )
    got = multimodal.media_features(docs).toPandas().sort_values("media_id")
    assert list(got["n_bytes"]) == [0] * 5
    assert list(got["first_byte"]) == [-1] * 5
    assert list(got["last_byte"]) == [-1] * 5
    assert list(got["byte_sum"]) == [0] * 5


def test_pii_scrub_categories_and_counts(spark):
    """Known positives for every PII category; counts and replacement
    tokens exact; clean text untouched."""
    from parquet_spark.pipeline.textops import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+spam@corp-mail.example.org today"),
            (2, "server 10.0.255.7 and backup 192.168.1.1 are up"),
            (3, "call +44 20 7946 0958 now"),
            (4, "totally clean text with no identifiers"),
            (5, "a@b.io mails 127.0.0.1 from +1 800 555 0100"),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[1]["scrubbed"] == "reach me at <EMAIL> today"
    assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (1, 0, 0)
    assert got[2]["scrubbed"] == "server <IP> and backup <IP> are up"
    assert got[2]["n_ip"] == 2
    assert got[3]["scrubbed"] == "call <PHONE> now"
    assert got[3]["n_phone"] == 1
    assert got[4]["scrubbed"] == "totally clean text with no identifiers"
    assert (got[4]["n_email"], got[4]["n_ip"], got[4]["n_phone"]) == (0, 0, 0)
    assert got[5]["scrubbed"] == "<EMAIL> mails <IP> from <PHONE>"


def test_strip_repeated_lines_consecutive_only(spark):
    """Only CONSECUTIVE duplicates collapse; non-adjacent repeats stay
    (they are legitimate content, e.g. a refrain)."""
    from parquet_spark.pipeline.textops import strip_repeated_lines

    df = spark.createDataFrame(
        [
            (1, "a\na\na\nb\na"),
            (2, "x\ny\nz"),
            (3, "only"),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in strip_repeated_lines(df).collect()}
    assert got[1]["scrubbed"] == "a\nb\na" and got[1]["n_removed"] == 2
    assert got[2]["scrubbed"] == "x\ny\nz" and got[2]["n_removed"] == 0
    assert got[3]["scrubbed"] == "only" and got[3]["n_removed"] == 0


def test_pii_scrub_plan_stays_in_codegen(spark):
    """The scrub must be a pure expression tree — no Python eval nodes."""
    from parquet_spark.pipeline.textops import pii_scrub

    df = spark.createDataFrame([(1, "t")], "doc_id int, text string")
    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sessionize_gap_semantics(spark):
    """Sessions split on gaps STRICTLY greater than the threshold; exact
    boundary stays in-session; numbering restarts per user."""
    import datetime as dt

    from parquet_spark.pipeline.events import session_stats, sessionize

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: two sessions (gap of 31 min between e2 and e3)
        (1, 1, t0, 1.0),
        (2, 1, t0 + 5 * m, 9.0),
        (3, 1, t0 + 36 * m, 2.0),
        # user 2: exactly-30-min gap stays ONE session (strict >)
        (4, 2, t0, 3.0),
        (5, 2, t0 + 30 * m, 4.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    per_event = {r["event_id"]: r["session_num"] for r in sessionize(df, gap_minutes=30).collect()}
    assert per_event == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}
    stats = {(r["user_id"], r["session_num"]): r for r in session_stats(df, gap_minutes=30).collect()}
    assert stats[(1, 1)]["n_events"] == 2 and stats[(1, 1)]["max_value"] == 9.0
    assert stats[(1, 2)]["n_events"] == 1
    assert stats[(2, 1)]["n_events"] == 2
    assert stats[(2, 1)]["t_end"] - stats[(2, 1)]["t_start"] == 30 * m


def test_asof_join_semantics(spark):
    """Backward as-of join: greatest right.ts <= left.ts per key,
    exact-timestamp inclusive, and a later NULL attribute must shadow an
    older non-null one (the struct carrier, not per-column last)."""
    import datetime as dt

    from parquet_spark.pipeline.events import asof_join

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    left = spark.createDataFrame(
        [(1, 1, t0, "a"), (2, 1, t0 + 60 * m, "b"), (3, 2, t0 - 10 * m, "c"), (4, 1, t0 + 30 * m, "d")],
        "event_id long, user_id long, ts timestamp, x string",
    )
    right = spark.createDataFrame(
        [(1, t0, 5.0, "p1"), (1, t0 + 30 * m, None, "p2"), (2, t0, 9.0, "p3")],
        "user_id long, ts timestamp, v double, tag string",
    )
    out = {r["event_id"]: (r["v"], r["tag"]) for r in asof_join(left, right, value_cols=["v", "tag"]).collect()}
    assert out[1] == (5.0, "p1")      # exact-ts inclusive
    assert out[4] == (None, "p2")     # later NULL shadows older non-null
    assert out[2] == (None, "p2")
    assert out[3] == (None, None)     # no right row at or before
    import pytest

    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("v", "x"), value_cols=["x"])


def test_asof_join_plan_single_shuffle(spark):
    """The as-of join is ONE hash shuffle on the key — no range join, no
    cartesian, no second exchange."""
    import datetime as dt

    from parquet_spark.pipeline.events import asof_join

    t0 = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame([(1, 1, t0, 1.0)], "event_id long, user_id long, ts timestamp, value double")
    right = spark.createDataFrame([(1, t0, 2.0)], "user_id long, ts timestamp, mark double")
    plan = asof_join(left, right, value_cols=["mark"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_interval_join_semantics_and_plan(spark):
    """Point-in-interval join: inclusive bounds, multi-match, zero-length
    intervals, intervals crossing bin boundaries — and the plan is a hash
    equi-join on (key, bin), never a nested-loop/cartesian."""
    import datetime as dt

    from parquet_spark.pipeline.events import interval_join

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    pts = spark.createDataFrame(
        [(1, 1, t0), (2, 1, t0 + 90 * m), (3, 2, t0 + 5 * m), (4, 1, t0 + 300 * m)],
        "event_id long, user_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (1, t0 - 5 * m, t0 + 10 * m, "A"),
            (1, t0 + 80 * m, t0 + 95 * m, "B"),   # crosses the hour-bin edge
            (1, t0, t0 + 120 * m, "C"),           # multi-match
            (2, t0 + 5 * m, t0 + 5 * m, "D"),     # zero-length inclusive
        ],
        "user_id long, t_start timestamp, t_end timestamp, tag string",
    )
    got = sorted((r["event_id"], r["tag"]) for r in interval_join(pts, iv).collect())
    assert got == [(1, "A"), (1, "C"), (2, "B"), (2, "C"), (3, "D")]
    plan = interval_join(pts, iv)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_time_rollup_buckets(spark):
    import datetime as dt

    from parquet_spark.pipeline.events import time_rollup

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    ev = spark.createDataFrame(
        [(i, i % 3, t0 + dt.timedelta(minutes=i), float(i)) for i in range(100)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    r = {(x["bucket_start"], x["user_id"]): x for x in time_rollup(ev, bucket_minutes=15).collect()}
    first = r[(t0, 0)]
    assert first["n_events"] == 5 and first["min_value"] == 0.0 and first["max_value"] == 12.0
    # global (keyless) variant
    g = time_rollup(ev, bucket_minutes=15, key_col=None).collect()
    assert sum(x["n_events"] for x in g) == 100


def test_media_decoder_hook():
    """register_media_decoder plugs a real codec in; 'raw' stays built-in
    and unoverridable; unknown codecs still raise the honest stub error."""
    import numpy as np
    import pytest

    from parquet_spark.pipeline import multimodal as mm

    assert list(mm.decode_media(b"\x01\x02", "raw")) == [1, 2]
    with pytest.raises(NotImplementedError, match="register_media_decoder"):
        mm.decode_media(b"x", "jpeg")
    mm.register_media_decoder("jpeg", lambda p: np.frombuffer(p, np.uint8)[::-1])
    try:
        assert list(mm.decode_media(b"\x01\x02", "jpeg")) == [2, 1]
    finally:
        mm._MEDIA_DECODERS.pop("jpeg")
    with pytest.raises(ValueError, match="raw"):
        mm.register_media_decoder("raw", lambda p: p)
    with pytest.raises(TypeError):
        mm.register_media_decoder("png", 42)


def test_knn_ivf_probe_memory_bounded(emb):
    """The probe distance uses the matmul expansion in bounded chunks
    (r5 VERDICT nit #4): with a large n_lists the old
    (batch x n_lists x dim) float64 difference cube would allocate
    batch*n_lists*dim*8 bytes per pandas batch; the chunked
    ||c||^2 - 2 q.c form is bounded by (4096 x n_lists). Recall must
    hold at high list counts too."""
    from parquet_spark.pipeline import similarity

    exact = similarity.knn_bruteforce(emb, k=5, n_queries=10).toPandas()
    # n_lists far above sqrt(n) for this corpus: many near-empty lists,
    # the shape where the cube was most disproportionate
    approx = similarity.knn_ivf(emb, k=5, n_queries=10, nprobe=16, n_lists=64).toPandas()
    e = {(r.q_id, r.n_id) for r in exact.itertuples()}
    a = {(r.q_id, r.n_id) for r in approx.itertuples()}
    assert len(e & a) / len(e) >= 0.5
