"""Inspector CLI (parquetgen -metadata/-pageheaders analogue): snapshot,
per-column rollup, and per-block dumps read only manifest/meta columns."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    from parquet_spark.operators.encode import write_encoded
    from parquet_spark.sources.synth import sequences_df

    path = str(tmp_path_factory.mktemp("insp") / "t")
    write_encoded(sequences_df(spark, 2000, seed=3, n_partitions=2), path, target_partitions=4, resume=False)
    return path


def test_snapshot_dump(table, capsys):
    from parquet_spark.tools import cmd_snapshot

    cmd_snapshot(table)
    snap = json.loads(capsys.readouterr().out)
    assert snap["version"] == 1 and "fingerprint" in snap
    assert [f["name"] for f in snap["schema"]["fields"]] == ["doc_id", "tokens", "n_tok", "source"]


def test_metadata_rollup(spark, table, capsys):
    from parquet_spark.tools import cmd_metadata

    cmd_metadata(table)
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    cols = {r["column"] for r in rows}
    assert cols == {"doc_id", "tokens", "n_tok", "source"}
    assert all(r["enc_bytes"] > 0 and r["n_blocks"] > 0 for r in rows)


def test_blocks_dump_filtered(spark, table, capsys):
    from parquet_spark.tools import cmd_blocks

    cmd_blocks(table, "tokens")
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert rows and all(r["column"] == "tokens" for r in rows)


def test_parquet_meta_dump(tmp_path, capsys):
    """The raw-footer inspector parses any writer's file — ours and
    pyarrow's — with no Spark session."""
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_spark.sources import parquet_raw as praw
    from parquet_spark.tools import cmd_parquet_meta

    t = pa.table({"x": pa.array(np.arange(10, dtype=np.int64))})
    ours = str(tmp_path / "ours.parquet")
    theirs = str(tmp_path / "theirs.parquet")
    praw.write_file(ours, t)
    pq.write_table(t, theirs)
    for path, expect_creator in ((ours, "parquet_spark"), (theirs, "parquet-cpp")):
        cmd_parquet_meta(path)
        lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
        assert lines[0]["num_rows"] == 10
        assert expect_creator in lines[0]["created_by"]
        assert lines[0]["schema"][0] == {"name": "x", "type": "INT64", "repetition": "OPTIONAL"}
        assert lines[1]["num_values"] == 10


def test_verify_cli_clean_and_corrupt(spark, tmp_path, capsys):
    """`verify` decodes every payload with the crc gate: clean table →
    JSON summary; a flipped payload byte → loud failure."""
    import glob
    import os

    import pyarrow.parquet as pq
    import pyarrow as pa

    from parquet_spark.operators.encode import write_encoded
    from parquet_spark.sources.synth import sequences_df
    from parquet_spark.tools import cmd_verify

    path = str(tmp_path / "vt")
    write_encoded(sequences_df(spark, 1500, seed=8, n_partitions=2), path, target_partitions=2, resume=False)
    cmd_verify(path)
    out = json.loads(capsys.readouterr().out)
    assert out["rows"] == 1500 and out["crc"] == "ok"
    assert set(out["blocks_per_column"]) == {"doc_id", "tokens", "n_tok", "source"}

    # corrupt one payload cell (rewrite a data file with a flipped byte);
    # drop Hadoop's .crc sidecars so the ENGINE's per-block crc gate —
    # not the filesystem — is what detects it
    f = sorted(glob.glob(os.path.join(path, "data", "*.parquet")))[0]
    t = pq.read_table(f)
    col = t.column("tokens").to_pylist()
    col[0] = bytes([col[0][0] ^ 0xFF]) + bytes(col[0][1:])
    t = t.set_column(t.schema.get_field_index("tokens"), "tokens", pa.array(col, pa.binary()))
    pq.write_table(t, f)
    for sidecar in glob.glob(os.path.join(path, "data", ".*.crc")):
        os.remove(sidecar)
    with pytest.raises(Exception, match="checksum mismatch decoding column"):
        cmd_verify(path)


def test_verify_cli_bloom_consistency(spark, tmp_path, capsys):
    """On a bloom-enabled table, verify also probes every value against
    its block's filter: clean → status ok; a corrupted (emptied) filter →
    exit code 2 with false_negatives counted. A bloom FALSE NEGATIVE is
    the one failure mode that silently drops rows from pruned reads."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_spark.operators.encode import write_encoded
    from parquet_spark.sources.synth import sequences_df
    from parquet_spark.tools import cmd_verify

    path = str(tmp_path / "vb")
    write_encoded(
        sequences_df(spark, 1200, seed=9, n_partitions=2), path,
        target_partitions=2, resume=False, bloom_cols=["source"],
    )
    cmd_verify(path)
    out = json.loads(capsys.readouterr().out)
    assert out["bloom"]["status"] == "ok"
    assert out["bloom"]["false_negatives"] == 0
    assert out["bloom"]["values_checked"] == 1200

    # zero out one block's filter bits (valid container, wrong contents)
    f = sorted(glob.glob(os.path.join(path, "data", "*.parquet")))[0]
    t = pq.read_table(f)
    col = t.column("_bloom_source").to_pylist()
    col[0] = col[0][:8] + bytes(len(col[0]) - 8)
    t = t.set_column(
        t.schema.get_field_index("_bloom_source"), "_bloom_source",
        pa.array(col, pa.binary()),
    )
    pq.write_table(t, f)
    for sidecar in glob.glob(os.path.join(path, "data", ".*.crc")):
        os.remove(sidecar)
    with pytest.raises(SystemExit):
        cmd_verify(path)
    out = json.loads(capsys.readouterr().out)
    assert out["bloom"]["status"] == "CORRUPT" and out["bloom"]["false_negatives"] > 0


def test_verify_cli_tolerates_null_bloom_sidecars(spark, tmp_path, capsys):
    """Review finding: blocks copied byte-for-byte from a pre-bloom
    generation carry NULL _bloom_ sidecars; the verify probe must treat
    them as 'keep' (like the reader), not flag the table CORRUPT."""
    from pyspark.sql import functions as F

    from parquet_spark.operators.encode import write_encoded
    from parquet_spark.operators.maintain import merge_into
    from parquet_spark.tools import cmd_verify

    path = str(tmp_path / "bloomnull")
    df = spark.range(0, 400).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
        (F.col("id") % 7).alias("v"),
    )
    write_encoded(df, path, target_partitions=2, block_rows=32, resume=False)
    ups = spark.createDataFrame([("k3", 99), ("brand-new", 1)], "key string, v long")
    merge_into(spark, path, ups, key_col="key", bloom_cols=["key"])
    cmd_verify(path)  # must NOT SystemExit(2)
    out = capsys.readouterr().out
    assert '"status": "ok"' in out
