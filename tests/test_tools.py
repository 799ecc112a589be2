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
