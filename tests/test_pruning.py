"""Physical-plan checks: decode projections must prune unread payload
columns at the parquet scan (Catalyst column pruning through mapInArrow),
and encode must stay a single shuffle."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def encoded_table(spark, tmp_path_factory):
    from parquet_spark.operators.encode import write_encoded
    from parquet_spark.sources.synth import sequences_df

    path = str(tmp_path_factory.mktemp("enc") / "table")
    df = sequences_df(spark, 3000, seed=9, n_partitions=2)
    write_encoded(df, path, target_partitions=4, resume=False)
    return path


def test_decode_projection_prunes_scan(spark, encoded_table):
    from parquet_spark.operators.decode import read_encoded

    proj = read_encoded(spark, encoded_table, columns=["n_tok"])
    plan = proj._jdf.queryExecution().executedPlan().toString()
    # the parquet scan's ReadSchema must contain the projected payload column
    # and NOT the heavy ones that weren't asked for
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    rs = read_schema[0]
    assert "n_tok" in rs
    assert "tokens" not in rs and "doc_id" not in rs, rs


def test_decode_full_reads_all_payloads(spark, encoded_table):
    from parquet_spark.operators.decode import read_encoded

    full = read_encoded(spark, encoded_table)
    plan = full._jdf.queryExecution().executedPlan().toString()
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    for c in ("doc_id", "tokens", "n_tok", "source"):
        assert c in rs


def test_encode_is_single_shuffle(spark):
    from parquet_spark.operators.encode import encode_table
    from parquet_spark.operators.repartition import salted_repartition
    from parquet_spark.sources.synth import sequences_df

    df = sequences_df(spark, 2000, seed=9, n_partitions=2)
    salted, _ = salted_repartition(df, 4)
    blocks = encode_table(salted)
    plan = blocks._jdf.queryExecution().executedPlan().toString()
    # exactly one Exchange moving the data (the salted repartition); the
    # broadcast of the tiny bucket plan must be a BroadcastExchange, not a
    # second data shuffle
    n_exchange = sum(
        1 for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln or "Exchange rangepartitioning" in ln
    )
    assert n_exchange == 1, plan
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_pipeline_joins_broadcast_small_side(spark):
    from parquet_spark.pipeline import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    knn = similarity.knn_bruteforce(emb, k=5, n_queries=10)
    plan = knn._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
