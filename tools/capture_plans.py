"""Dump .explain("formatted") for declared queries to plans/<round>/ files.

Usage: python tools/capture_plans.py <out_dir> <suffix> [query ...]
e.g.   python tools/capture_plans.py plans/r06 after roundtrip_auto_all

Measurement-infrastructure only (judge evidence); not part of the engine.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("capture-plans")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.getcwd())
    from __spark_entry__ import queries

    q = queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = q[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
