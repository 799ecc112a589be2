"""End-to-end round-trip of the reference's `Person` schema (FIXTURES.md F2,
/root/reference/parquet_test.go:989-1023): 22 leaf columns across every
type × optionality × nesting combination the reference's test matrix
covers — required/optional scalars, doubly-optional nested struct fields,
optional→repeated→required paths (hobby.skills), and repeated structs with
optional members (friends). uint64 extremes are covered at the Arrow level
in test_blocks/test_dict_for_fsst (Spark has no unsigned types; FIXTURES
maps uint32→long)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _person_df(spark, n=200):
    i = F.col("id")
    rnd = F.pmod(F.xxhash64(i), F.lit(1000)) / 1000.0  # deterministic "random"
    skill = lambda s: F.struct(  # noqa: E731
        F.concat(F.lit("skill"), (i + s).cast("string")).alias("name"),
        F.concat(F.lit("d"), ((i + s) % 5).cast("string")).alias("difficulty"),
    )
    friend = lambda k: F.struct(  # noqa: E731
        (i * 10 + k).cast("int").alias("id"),
        F.concat(F.lit("friend"), k.cast("string")).alias("name"),
        F.when((i + k) % 2 == 0, ((i + k) % 90).cast("int")).alias("age"),
    )
    return spark.range(n).select(
        i.cast("int").alias("id"),
        F.lit("").alias("name"),
        F.when(i % 2 == 1, (i % 100).cast("int")).alias("age"),
        (i * 2).alias("happiness"),
        F.when(i % 3 == 0, i * 3).alias("sadness"),
        F.when(rnd > 0.5, F.substring(F.md5(i.cast("string")), 1, 8)).alias("code"),
        rnd.cast("float").alias("funkiness"),
        (rnd * 2).cast("double").alias("boldness"),
        F.when(i % 2 == 0, rnd.cast("float")).alias("lameness"),
        F.when(i % 5 == 0, F.lit(True)).alias("keen"),
        (i * 1000).alias("birthday"),
        F.when(i % 3 == 0, F.lit(9223372036854775807) - i * 100).alias("anniversary"),
        F.concat(F.lit("bff"), i.cast("string")).alias("bff"),
        (i % 2 == 0).alias("hungry"),
        F.when(
            i % 4 != 0,
            F.struct(
                F.concat(F.lit("hobby"), (i % 7).cast("string")).alias("name"),
                F.when(i % 3 != 0, (i % 10).cast("int")).alias("difficulty"),
                F.when(
                    i % 2 == 0,
                    F.array(skill(F.lit(0)), skill(F.lit(1))),
                ).otherwise(F.array().cast("array<struct<name:string,difficulty:string>>")).alias("skills"),
            ),
        ).alias("hobby"),
        F.when(
            i % 3 != 1,
            F.array(friend(F.lit(0)), friend(F.lit(1)), friend(F.lit(2))),
        ).alias("friends"),
        (i % 6 == 0).alias("Sleepy"),
    )


def test_person_schema_full_roundtrip(spark):
    from parquet_spark.operators.decode import decode_table
    from parquet_spark.operators.encode import encode_table

    df = _person_df(spark)
    decoded = decode_table(encode_table(df), df.schema)
    assert decoded.schema == df.schema
    a = df.orderBy("id").collect()
    b = decoded.orderBy("id").collect()
    assert a == b


def test_person_schema_written_table_roundtrip(spark, tmp_path):
    from parquet_spark.operators.decode import read_encoded
    from parquet_spark.operators.encode import write_encoded

    path = str(tmp_path / "person")
    df = _person_df(spark, 300)
    write_encoded(df, path, target_partitions=4, resume=False,
                  source_col="bff", salt_key="id", weight_col=None)
    got = read_encoded(spark, path)
    assert sorted(got.collect(), key=lambda r: r.id) == sorted(df.collect(), key=lambda r: r.id)
