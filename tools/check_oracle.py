"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry against its oracle_sql() on DuckDB at
sf0.01 and compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray) else (tuple(v) if isinstance(v, list) else v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(want.columns):
        errs.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        return errs
    if len(got) != len(want):
        errs.append(f"rows {len(got)} != {len(want)}")
        return errs
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        # the driver's value hash distinguishes int from float (observed:
        # DuckDB HUGEINT→float64 vs Spark int64 hash-mismatched in round 1
        # while int32-vs-int64 matched) — treat kind mismatch as failure
        kinds = {gv.dtype.kind, wv.dtype.kind}
        if "f" in kinds and kinds & {"i", "u"}:
            errs.append(f"col {c}: dtype kind mismatch got {gv.dtype} want {wv.dtype} (driver hash diverges)")
            continue
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            ok = np.array_equal(gv.astype(np.float64), wv.astype(np.float64), equal_nan=True)
        else:
            ok = (pd.isna(gv) == pd.isna(wv)).all() and (pd.Series(gv).fillna(0) == pd.Series(wv).fillna(0)).all()
        if not ok:
            bad = np.flatnonzero(~((pd.isna(gv) & pd.isna(wv)) | (gv == wv)))[:3]
            errs.append(f"col {c}: first diffs at {bad.tolist()}: got {gv[bad].tolist()} want {wv[bad].tolist()}")
    return errs


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"WEAK {name}: no oracle, rows={len(got)}")
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        errs = compare(name, got, want)
        if errs:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(errs))
        else:
            print(f"OK   {name}: rows={len(got)}")
    # entry smoke
    res = entrymod.entry(spark)
    n = res.count()
    print(f"OK   entry: rows={n}" if n >= 0 else "FAIL entry")
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
