"""Stage-isolated measurements for the optimization round (guide §1.4).

NOT the driver bench — bench.py stays frozen. This file times individual
pipeline stages with the noop sink so each optimization can be attributed:
scan alone, scan→encode, scan→encode→decode, and the write_encoded phases.

Usage: python bench_extra.py [legs...]   (default: all)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS (default 5)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))
    seq_rows = int(os.environ.get("SPARK_GRAFT_SEQ_ROWS", "300000"))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    work = f"{base}/psbench-extra-{cpus}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"parquet_spark-bench-extra-{cpus}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.local.dir", os.path.join(work, "spark-local"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from parquet_spark.operators.decode import read_encoded
    from parquet_spark.operators.encode import encode_table, write_encoded
    from parquet_spark.operators.decode import decode_table
    from parquet_spark.sources.synth import sequences_df, write_sequences

    want = set(sys.argv[1:])

    def on(name: str) -> bool:
        return not want or name in want

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn, n=reps):
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"leg": name, "min": min(runs), "runs": runs}), flush=True)

    sc = spark.sparkContext

    # ---------- lineitem auto roundtrip stages
    if on("lineitem"):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus"
        )
        sc.setJobDescription("lineitem: scan only")
        timed("lineitem_scan_noop", lambda: noop(li))
        sc.setJobDescription("lineitem: scan+encode")
        timed("lineitem_encode_noop", lambda: noop(encode_table(li)))
        sc.setJobDescription("lineitem: full roundtrip agg")
        timed(
            "lineitem_roundtrip_agg",
            lambda: decode_table(encode_table(li), li.schema).agg(F.count("*")).collect(),
        )
        sc.setJobDescription("lineitem: full roundtrip noop")
        timed(
            "lineitem_roundtrip_noop",
            lambda: noop(decode_table(encode_table(li), li.schema)),
        )

    # ---------- documents fsst stages
    if on("fsst"):
        doc = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
        print(json.dumps({"leg": "documents_npart", "n": doc.rdd.getNumPartitions()}), flush=True)
        sc.setJobDescription("documents: scan only")
        timed("documents_scan_noop", lambda: noop(doc))
        sc.setJobDescription("documents: scan+fsst encode")
        timed("documents_fsst_encode_noop", lambda: noop(encode_table(doc, codecs={"text": "fsst"})))
        sc.setJobDescription("documents: fsst roundtrip agg")
        timed(
            "documents_fsst_roundtrip_agg",
            lambda: decode_table(encode_table(doc, codecs={"text": "fsst"}), doc.schema)
            .agg(F.count("*"))
            .collect(),
        )

    # ---------- sequences encode/decode phases
    if on("seq"):
        inp = os.path.join(work, "input")
        write_sequences(spark, inp, n_rows=seq_rows, seed=42, n_partitions=32)
        seq = spark.read.parquet(inp)
        # warmup like bench.py
        encode_table(sequences_df(spark, 2000, seed=1, n_partitions=cpus)).write.format(
            "noop"
        ).mode("overwrite").save()
        enc_path = os.path.join(work, "encoded")
        sc.setJobDescription("sequences: write_encoded")
        timed("encode_sequences", lambda: write_encoded(seq, enc_path, target_partitions=64, resume=False))
        sc.setJobDescription("sequences: scan+encode noop (no table IO)")
        timed("sequences_encode_noop", lambda: noop(encode_table(seq)))
        sc.setJobDescription("sequences: parquet baseline")
        pq_path = os.path.join(work, "pq")
        timed("parquet_write_baseline", lambda: seq.write.mode("overwrite").option("compression", "snappy").parquet(pq_path))
        dec = read_encoded(spark, enc_path)
        sc.setJobDescription("sequences: decode agg")
        timed(
            "decode_sequences",
            lambda: dec.agg(
                F.sum("n_tok"), F.sum(F.size("tokens")), F.count("doc_id"), F.count("source")
            ).collect(),
        )

    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
