"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule's N → 4N *executor* criterion cannot use a real cluster in this
sandbox, so it is evidenced as the same encode job, on byte-identical input
(bench.py pins the synthetic generator's partition count), at two
parallelism levels. Efficiency is computed on the ENCODE stage only (the
distributed kernel under test):

    raw_efficiency = (tokens_per_sec@hi / tokens_per_sec@lo) / (hi / lo)

One confound is unavoidable here and is measured explicitly: every "core"
of this single VM shares ONE memory subsystem, whereas the rule's N and 4N
*executors* each bring their own memory bus. The `platform` section holds a
weak-scaling ceiling: the engine's own encode kernel (parquet_spark.codecs
.blocks.encode_array, no Spark) run with FIXED work per process at each
core count via multiprocessing. If the hardware were ideal, wall time would
stay flat; on this VM it does not — per-core throughput collapses past ~8
processes for *any* numpy workload. `efficiency_vs_platform` =
engine_speedup / platform_speedup therefore isolates what the rule actually
asks about — whether the ENGINE adds a serial bottleneck or skewed stage on
top of the hardware — and is the predictor for a real N → 4N cluster where
the memory-bus ceiling does not bind. Target: raw ≥ 0.8 where the platform
allows it, vs-platform ≥ 0.8 everywhere.

Usage: python tools/bench_scaling.py [rows]    # default 300000
Writes BENCH_SCALING.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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


def platform_ceiling(core_counts: list[int]) -> dict:
    """Weak scaling of the raw kernel (no Spark): wall time for `p`
    processes each doing identical work. rate(p) = p / wall(p)."""
    out: dict = {}
    # warm caches / imports once
    _kernel_work(0)
    # 3 repeats per core count, min wall: the shared host's available CPU
    # fluctuates between runs (noisy neighbors), min = capability
    for rep in range(3):
        for p in core_counts:
            with mp.Pool(p) as pool:
                t0 = time.perf_counter()
                pool.map(_kernel_work, range(p))
                wall = time.perf_counter() - t0
            prev = out.get(str(p), {}).get("wall_sec", 1e9)
            if wall < prev:
                out[str(p)] = {"wall_sec": round(wall, 3), "rate": round(p / wall, 3)}
    return out


# ------------------------------------------------------------------ engine
def run(cpus: int, rows: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SEQ_ROWS=str(rows),
        SPARK_GRAFT_WORKDIR=f"/tmp/psbench-scale-{cpus}",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench.py (cpus={cpus}) produced no JSON:\n{proc.stderr[-2000:]}")


def pair(lo: int, hi: int, rows: int, platform: dict) -> dict:
    r_lo = run(lo, rows)
    r_hi = run(hi, rows)
    tps_lo = r_lo["encode_tokens_per_sec"]
    tps_hi = r_hi["encode_tokens_per_sec"]
    speedup = tps_hi / tps_lo
    d = {
        "cores_low": lo,
        "cores_high": hi,
        "encode_tokens_per_sec_low": round(tps_lo, 1),
        "encode_tokens_per_sec_high": round(tps_hi, 1),
        "encode_sec_low": r_lo["queries"]["encode_sequences"],
        "encode_sec_high": r_hi["queries"]["encode_sequences"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(speedup / (hi / lo), 3),
        "bytes_per_token": r_hi["engine_bytes_per_token"],
        "parquet_bytes_per_token": r_hi["parquet_bytes_per_token"],
        "roundtrip_crc_match": r_lo["roundtrip_crc_match"] and r_hi["roundtrip_crc_match"],
        "n_tokens": r_lo["n_tokens"],
    }
    p_lo, p_hi = platform.get(str(lo)), platform.get(str(hi))
    if p_lo and p_hi:
        plat_speedup = p_hi["rate"] / p_lo["rate"]
        d["platform_speedup"] = round(plat_speedup, 3)
        d["platform_efficiency"] = round(plat_speedup / (hi / lo), 3)
        d["efficiency_vs_platform"] = round(speedup / plat_speedup, 3)
    return d


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    cores = [2, 8, 32]
    platform = platform_ceiling(cores)
    out = {
        "rows": rows,
        "target": 0.8,
        "platform_weak_scaling": platform,
        # primary pair (N -> 4N): per-core memory bandwidth is not yet
        # saturated at 8 procs, so this is the closest same-box model of
        # adding executors that each bring their own memory bus
        "pair_2_to_8": pair(2, 8, rows, platform),
        # same-box stress pair: 32 local cores share one memory subsystem;
        # the platform ceiling (see platform_weak_scaling) binds here, and
        # efficiency_vs_platform is the meaningful engine number
        "pair_8_to_32": pair(8, 32, rows, platform),
    }
    with open(os.path.join(ROOT, "BENCH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
