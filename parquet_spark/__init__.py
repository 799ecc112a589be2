"""parquet_spark — a PySpark-native per-column lightweight-compression engine.

Re-expresses the capabilities of the reference Go library parsyl/parquet
(record shredding, per-column encoding, page compression, column statistics,
metadata/manifest, decode/assembly — see SURVEY.md §2) as an idiomatic Spark
engine, and extends it with the codecs the reference lacks: dictionary,
RLE/bit-packed hybrid at arbitrary width, FSST-style symbol-table string
compression, frame-of-reference + bit-packing, and stats-driven codec
auto-selection.

Layout
------
codecs/     pure numpy/pyarrow encode/decode kernels (vectorized; no Spark)
stats/      per-block sampled statistics + codec auto-selection
operators/  Spark-side encode/decode (mapInArrow), skew repartition, resume
sources/    deterministic synthetic `sequences` generator, manifest layout
functions/  SQL-expressible statistic helpers (DataFrame API, oracle-checkable)
plans/      human-readable encode-plan description (which codec & why)
streaming/  Structured-Streaming encode sink (foreachBatch)

All encode/decode paths are vectorized over whole Arrow/numpy arrays — there
is no per-row Python anywhere on the hot path (north-rule requirement).
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: keep `import parquet_spark.codecs` Spark-free
    if name in ("encode_table", "write_encoded"):
        from parquet_spark.operators import encode as _e

        return getattr(_e, name)
    if name in ("decode_table", "read_encoded"):
        from parquet_spark.operators import decode as _d

        return getattr(_d, name)
    raise AttributeError(name)
