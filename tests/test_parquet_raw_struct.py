"""Nested-struct columns and multi-row-group output through the raw
standards-Parquet writer/reader.

The reference flattens nested structs into dotted-path leaf columns with
per-level definition levels (/root/reference/cmd/parquetgen/parse/
parse.go:108-114; generated instance `hobby.name` in
parquet_generated_test.go:66). This file certifies the same layout from
the from-spec writer: struct leaves as independent column chunks whose
def levels count defined optional ancestors, readable element-exact by
pyarrow AND duckdb AND our own reader; plus row-group rolling, matching
the reference's one-row-group-per-Write() semantics (README.md:70-72).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_spark.sources import parquet_raw as praw


@pytest.fixture()
def person_table() -> pa.Table:
    """Nested optional struct: person.hobby{name, difficulty} with a
    deeper person.hobby.skill{name} level; nulls at every level."""
    n = 211
    hobby_name = pa.array(
        [None if i % 13 == 0 else f"hobby-{i % 7}" for i in range(n)], pa.string()
    )
    difficulty = pa.array(
        [None if i % 5 == 0 else i % 10 for i in range(n)], pa.int32()
    )
    skill_name = pa.array(
        [None if i % 3 == 0 else f"skill-{i % 4}" for i in range(n)], pa.string()
    )
    skill_valid = np.array([i % 4 != 1 for i in range(n)])
    skill = pa.StructArray.from_arrays(
        [skill_name], names=["name"], mask=pa.array(~skill_valid)
    )
    hobby_valid = np.array([i % 6 != 2 for i in range(n)])
    hobby = pa.StructArray.from_arrays(
        [hobby_name, difficulty, skill],
        names=["name", "difficulty", "skill"],
        mask=pa.array(~hobby_valid),
    )
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "hobby": hobby,
    })


def _normalize(t: pa.Table, like: pa.Table) -> pa.Table:
    """Null out struct-child slots under null parents: writers discard
    them (Dremel has no representation for a value below a null ancestor),
    so equality is defined on the canonicalized form."""
    import pyarrow.compute as pc

    def canon(arr: pa.Array) -> pa.Array:
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_struct(arr.type):
            parent_null = pc.is_null(arr)
            kids = []
            for i, f in enumerate(arr.type):
                kid = canon(arr.field(i))
                kid = pc.if_else(parent_null, pa.nulls(len(arr), kid.type), kid)
                kids.append(kid)
            return pa.StructArray.from_arrays(
                kids, fields=list(arr.type), mask=parent_null
            )
        return arr

    return pa.table({name: canon(t.column(name)) for name in like.column_names})


def test_struct_file_opens_in_pyarrow_duckdb_and_self(tmp_path, person_table):
    import duckdb

    p = str(tmp_path / "person.parquet")
    summary = praw.write_file(p, person_table, compression="snappy", page_rows=64)
    # dotted-path leaves, one chunk each (reference's flatten layout)
    assert set(summary) >= {"id", "hobby.name", "hobby.difficulty", "hobby.skill.name"}

    want = _normalize(person_table, person_table)
    got_pa = pq.read_table(p)
    assert _normalize(got_pa, person_table).equals(want)
    got_dd = duckdb.query(f"SELECT * FROM read_parquet('{p}')").arrow()
    assert _normalize(got_dd.cast(person_table.schema), person_table).equals(want)
    got_self = praw.read_file(p)
    assert _normalize(got_self.cast(person_table.schema), person_table).equals(want)


def test_struct_projection_and_required_fields(tmp_path):
    n = 40
    x_field = pa.field("x", pa.int32(), nullable=False)
    inner = pa.StructArray.from_arrays(
        [pa.array(np.arange(n, dtype=np.int32))], fields=[x_field]
    )
    schema = pa.schema([
        pa.field("k", pa.string(), nullable=False),
        pa.field("s", pa.struct([x_field]), nullable=False),
    ])
    t = pa.Table.from_arrays(
        [pa.array([f"k{i}" for i in range(n)], pa.string()), inner], schema=schema
    )
    p = str(tmp_path / "req.parquet")
    praw.write_file(p, t, page_rows=16)
    assert pq.read_table(p).equals(t)
    got = praw.read_file(p, columns=["s"])
    assert got.column_names == ["s"]
    assert got.column("s").combine_chunks().field("x").to_pylist() == list(range(n))


def test_struct_required_with_nulls_fails_loudly(tmp_path):
    n = 10
    inner = pa.StructArray.from_arrays(
        [pa.array(list(range(n)), pa.int32())],
        names=["x"],
        mask=pa.array([i == 3 for i in range(n)]),  # null structs
    )
    # struct declared NON-nullable in the schema, but data has null structs
    t = pa.Table.from_arrays(
        [inner],
        schema=pa.schema([pa.field("s", inner.type, nullable=False)]),
    )
    with pytest.raises(ValueError, match="non-nullable"):
        praw.write_file(str(tmp_path / "bad.parquet"), t)


def test_raw_reader_reads_pyarrow_struct_file(tmp_path, person_table):
    p = str(tmp_path / "pa_struct.parquet")
    pq.write_table(person_table, p, use_dictionary=False, data_page_version="1.0",
                   compression="snappy")
    got = praw.read_file(p)
    want = _normalize(person_table, person_table)
    assert _normalize(got.cast(person_table.schema), person_table).equals(want)


def test_multi_row_group_write(tmp_path, person_table):
    import duckdb

    p = str(tmp_path / "rg.parquet")
    praw.write_file(p, person_table, compression="snappy", page_rows=32,
                    row_group_rows=64)
    meta = pq.ParquetFile(p).metadata
    assert meta.num_row_groups == 4  # 211 rows / 64
    assert sum(meta.row_group(i).num_rows for i in range(4)) == 211
    want = _normalize(person_table, person_table)
    assert _normalize(pq.read_table(p), person_table).equals(want)
    got_dd = duckdb.query(f"SELECT * FROM read_parquet('{p}')").arrow()
    assert _normalize(got_dd.cast(person_table.schema), person_table).equals(want)
    assert _normalize(praw.read_file(p).cast(person_table.schema), person_table).equals(want)


def test_parquet_meta_cli_reports_row_groups_and_struct_leaves(tmp_path, person_table, capsys):
    """The page-header-walk CLI must surface every row group and the
    dotted struct leaf paths."""
    import json

    from parquet_spark import tools

    p = str(tmp_path / "rg_cli.parquet")
    praw.write_file(p, person_table, page_rows=64, row_group_rows=64)
    tools.cmd_parquet_meta(p)
    lines = capsys.readouterr().out.strip().splitlines()
    head = json.loads(lines[0])
    assert head["n_row_groups"] == 4
    chunks = [json.loads(line) for line in lines[1:]]
    assert {c["row_group"] for c in chunks} == {0, 1, 2, 3}
    assert any(c["column"] == "hobby.skill.name" for c in chunks)


def test_multi_row_group_flat_and_list(tmp_path):
    """Row-group rolling composes with the existing flat + list paths."""
    n = 150
    t = pa.table({
        "v": pa.array(np.arange(n, dtype=np.int64)),
        "tags": pa.array(
            [None if i % 11 == 0 else [f"t{j}" for j in range(i % 4)] for i in range(n)],
            pa.list_(pa.string()),
        ),
    })
    p = str(tmp_path / "rg_list.parquet")
    praw.write_file(p, t, page_rows=16, row_group_rows=50)
    assert pq.ParquetFile(p).metadata.num_row_groups == 3
    assert pq.read_table(p).cast(t.schema).equals(t)
    assert praw.read_file(p).cast(t.schema).equals(t)
