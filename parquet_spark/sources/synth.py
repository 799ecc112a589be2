"""Deterministic synthetic `sequences` table — the engine's primary input
(BASELINE.json input_hint; FIXTURES.md F1).

Schema: (doc_id string, tokens array<int32>, n_tok int32, source string).

Generation is seeded and partition-parallel: each partition's slice is
produced from an RNG keyed on (seed, absolute start row), so the same
(seed, n_rows, n_partitions) always yields the same table regardless of
cluster size or core count — no external data, no driver-side
materialization (rows are born distributed, which is what makes this
generator valid at 10^12-sequence scale). Scaling benchmarks pin
n_partitions so both cluster sizes see byte-identical input.

Distributions chosen to exercise every codec (SURVEY.md §7 Phase 0):
- token ids: Zipf-ish over a 50k vocab  -> dictionary wins on many blocks
- injected bursts of repeated ids        -> RLE runs
- narrow-range segments                  -> frame-of-reference + bit-pack
- doc_id: shared `srcNN-` prefixes       -> FSST symbols
- source: Zipfian over ~20 values        -> hot keys for salted repartition
- n_tok: long-tailed (lognormal, mean ~512 nominal) -> skewed partition bytes
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

VOCAB = 50_000
N_SOURCES = 20


def _source_probs(n_sources: int = N_SOURCES) -> np.ndarray:
    ranks = np.arange(1, n_sources + 1, dtype=np.float64)
    p = 1.0 / ranks  # Zipf s=1
    return p / p.sum()


def generate_batch(
    start_row: int,
    n_rows: int,
    seed: int = 42,
    mean_tokens: int = 256,
    max_tokens: int = 8192,
) -> pa.RecordBatch:
    """Generate rows [start_row, start_row+n_rows) as one Arrow batch.
    Pure numpy; deterministic in (seed, start_row, n_rows... row-aligned:
    the same absolute row always gets the same content because the RNG is
    keyed on (seed, start_row)."""
    rng = np.random.default_rng((seed, start_row))
    # --- source: Zipfian over N_SOURCES
    src_idx = rng.choice(N_SOURCES, size=n_rows, p=_source_probs())
    # --- lengths: long-tailed lognormal, clipped
    lens = np.clip(
        np.exp(rng.normal(np.log(mean_tokens * 0.6), 0.9, size=n_rows)), 1, max_tokens
    ).astype(np.int32)
    total = int(lens.sum())
    # --- tokens: three interleaved regimes per the fixture spec
    # regime A (60%): Zipf-ish over the vocab (dict/entropy territory)
    # regime B (25%): bursts of repeated ids (RLE territory)
    # regime C (15%): narrow-range windows (FOR+bitpack territory)
    u = rng.random(total)
    zipf = (VOCAB ** u - 1.0) / (VOCAB - 1) * VOCAB  # heavy head
    tokens = zipf.astype(np.int32) % VOCAB
    # burst injection (vectorized ragged fill): ~25% of positions end up in
    # runs of 8..64 repeats of the burst-start token
    n_burst = max(1, total // 128)
    bstart = rng.integers(0, total, size=n_burst).astype(np.int64)
    blen = rng.integers(8, 64, size=n_burst).astype(np.int64)
    rel_base = np.zeros(n_burst, dtype=np.int64)
    np.cumsum(blen[:-1], out=rel_base[1:])
    rel = np.arange(int(blen.sum())) - np.repeat(rel_base, blen)
    idx = np.repeat(bstart, blen) + rel
    ok = idx < total
    tokens[idx[ok]] = np.repeat(tokens[bstart], blen)[ok]
    # narrow-range windows (vectorized): 256-token spans remapped into a
    # random 16-id window
    n_win = max(1, total // 4096)
    wstart = rng.integers(0, max(total - 256, 1), size=n_win).astype(np.int64)
    bases = rng.integers(0, VOCAB - 16, size=n_win).astype(np.int32)
    widx = (wstart[:, None] + np.arange(256)).ravel()
    wok = widx < total
    widx = widx[wok]
    wbase = np.repeat(bases, 256)[wok]
    tokens[widx] = wbase + (tokens[widx] % 16)

    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    rows = np.arange(start_row, start_row + n_rows)
    doc_ids = np.char.add(
        np.char.add("src", src_idx.astype("U2")),
        np.char.add("-", np.char.zfill(rows.astype("U12"), 12)),
    )
    sources = np.char.add("src", src_idx.astype("U2"))
    tokens_arr = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int64()).cast(pa.int32()), pa.array(tokens, pa.int32())
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array(doc_ids, pa.string()),
            tokens_arr,
            pa.array(lens, pa.int32()),
            pa.array(sources, pa.string()),
        ],
        names=["doc_id", "tokens", "n_tok", "source"],
    )


SEQUENCES_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def sequences_df(spark, n_rows: int, seed: int = 42, n_partitions: int | None = None, mean_tokens: int = 256):
    """Distributed deterministic sequences DataFrame: each partition
    generates its own slice with mapInArrow (no per-row Python, no driver
    materialization)."""
    from pyspark.sql import functions as F

    if n_partitions is None:
        n_partitions = max(1, spark.sparkContext.defaultParallelism)
    per = (n_rows + n_partitions - 1) // n_partitions
    bounds = [(i * per, min((i + 1) * per, n_rows)) for i in range(n_partitions)]
    bounds = [b for b in bounds if b[1] > b[0]]
    # one bound per RDD partition: the generator is born partitioned, no
    # Exchange in the plan (matters: encode must be a single-shuffle job)
    rdd = spark.sparkContext.parallelize(bounds, len(bounds))
    bdf = spark.createDataFrame(rdd, "start long, end long")

    def gen(batches):
        for batch in batches:
            starts = batch.column("start").to_numpy()
            ends = batch.column("end").to_numpy()
            for s, e in zip(starts, ends):
                # chunk to ~64k rows per Arrow batch to bound memory
                step = 65536
                for cs in range(int(s), int(e), step):
                    yield generate_batch(cs, min(step, int(e) - cs), seed=seed, mean_tokens=mean_tokens)

    return bdf.mapInArrow(gen, SEQUENCES_DDL)


def write_sequences(spark, path: str, n_rows: int, seed: int = 42, n_partitions: int | None = None, mean_tokens: int = 256) -> None:
    sequences_df(spark, n_rows, seed, n_partitions, mean_tokens).write.mode("overwrite").parquet(path)
