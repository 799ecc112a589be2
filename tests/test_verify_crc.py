"""Decode-side integrity: verify=True checks each payload's crc32 against
the block's recorded checksum (manifest lineage) before decoding."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_verify_passes_on_clean_table(spark, tmp_path):
    from parquet_spark.operators.decode import read_encoded
    from parquet_spark.operators.encode import write_encoded
    from parquet_spark.sources.synth import sequences_df

    path = str(tmp_path / "ok")
    write_encoded(sequences_df(spark, 1500, seed=31, n_partitions=2), path, target_partitions=2, resume=False)
    assert read_encoded(spark, path, verify=True).count() == 1500


def test_verify_raises_on_tampered_payload(spark):
    from parquet_spark.operators.decode import decode_table
    from parquet_spark.operators.encode import encode_table
    from parquet_spark.sources.synth import sequences_df

    df = sequences_df(spark, 1000, seed=32, n_partitions=1)
    blocks = encode_table(df)
    # flip bytes in one payload column; meta checksums now disagree
    tampered = blocks.withColumn("n_tok", F.expr("concat(substring(n_tok, 1, 20), X'FF', substring(n_tok, 22, octet_length(n_tok)))"))
    bad = decode_table(tampered, df.schema, verify=True)
    with pytest.raises(Exception, match="checksum mismatch"):
        bad.count()
    # without verify, tampering may or may not surface — with it, it must
    ok = decode_table(blocks, df.schema, verify=True)
    assert ok.count() == 1000
