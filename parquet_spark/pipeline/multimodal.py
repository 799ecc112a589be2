"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata.

The Spark-side contract is real and tested — schema, partition-preserving
mapInPandas, Arrow batch shapes, projection pushdown — while the actual
media decode is stubbed: the container ships no image/audio libraries, so
`decode_media` raises NotImplementedError for real codecs and provides a
deterministic fake ("raw" codec = the payload bytes themselves) that the
tests and the oracle exercise end-to-end.

Feature extraction over the fake codec is integer byte arithmetic, which
both Spark and DuckDB can compute — so even the UDF path is oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, media_type string, codec string, "
    "width int, height int, n_bytes int"
)

FEATURE_DDL = "media_id bigint, n_bytes int, first_byte int, last_byte int, byte_sum bigint, mean_byte double"


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from the documents table: payload = UTF-8 bytes
    of the text (the deterministic fake), typed metadata derived from it.
    At scale this is the schema a real ingest (S3 image manifest) lands in."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit("raw").alias("codec"),
        (F.pmod(F.col(id_col), F.lit(64)) + F.lit(1)).cast("int").alias("width"),
        (F.pmod(F.col(id_col), F.lit(48)) + F.lit(1)).cast("int").alias("height"),
        F.octet_length(payload).alias("n_bytes"),
    )


def decode_media(payload: bytes, codec: str) -> np.ndarray:
    """Per-payload decode. Real codecs are stubbed (no PIL/ffmpeg in the
    container); 'raw' interprets the payload as a uint8 vector."""
    if codec == "raw":
        return np.frombuffer(payload, dtype=np.uint8)
    raise NotImplementedError(
        f"media codec {codec!r} requires an image/audio library not shipped "
        "in this container; plug a decoder into decode_media"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: whole Arrow
    batches in, vectorized byte stats out. The pattern (schema + batch
    iterator + per-batch numpy) is exactly what a real image featurizer
    (resize / embed) drops into."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [decode_media(p, c) for p, c in zip(pdf["payload"], pdf["codec"])]
            n = np.array([len(p) for p in payloads], dtype=np.int32)
            first = np.array([int(p[0]) if len(p) else -1 for p in payloads], dtype=np.int32)
            last = np.array([int(p[-1]) if len(p) else -1 for p in payloads], dtype=np.int32)
            tot = np.array([int(p.sum(dtype=np.int64)) for p in payloads], dtype=np.int64)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n,
                    "first_byte": first,
                    "last_byte": last,
                    # pure float64 division (no rounding): IEEE division is
                    # deterministic, so Spark and the DuckDB oracle agree
                    # bit-for-bit; round() implementations would not
                    "byte_sum": tot,
                    "mean_byte": tot / np.maximum(n, 1),
                }
            )

    return df.select("media_id", "payload", "codec").mapInPandas(fn, FEATURE_DDL)


def media_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return extract_features(attach_media(df, text_col, id_col))


def media_features_oracle(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    # byte stats over the UTF-8 payload, computed in SQL (ASCII corpus).
    # list_sum over BIGINT returns HUGEINT (pandas float64) — CAST back to
    # BIGINT so the driver value-hash sees the same int64 Spark emits; the
    # mean is a bare double division (bit-deterministic, unlike round()).
    codes = f"list_transform(string_split({text_col}, ''), c -> CAST(ascii(c) AS BIGINT))"
    bsum = f"CAST(list_sum({codes}) AS BIGINT)"
    return (
        f"SELECT {id_col} AS media_id, CAST(length({text_col}) AS INTEGER) AS n_bytes, "
        f"CASE WHEN length({text_col}) = 0 THEN -1 ELSE ascii(substr({text_col}, 1, 1)) END AS first_byte, "
        f"CASE WHEN length({text_col}) = 0 THEN -1 ELSE ascii(substr({text_col}, length({text_col}), 1)) END AS last_byte, "
        f"{bsum} AS byte_sum, "
        f"CAST({bsum} AS DOUBLE) / greatest(length({text_col}), 1) AS mean_byte "
        f"FROM {table}"
    )


def frame_sample(df: DataFrame, every_n: int = 7) -> DataFrame:
    """Frame-sampling plumbing: slice every Nth byte of the payload (the
    fake analogue of sampling every Nth video frame) — stays in Arrow."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                bytes(decode_media(p, c)[::every_n].tobytes())
                for p, c in zip(pdf["payload"], pdf["codec"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frames": frames,
                    "n_frames": [len(f) for f in frames],
                }
            )

    return df.select("media_id", "payload", "codec").mapInPandas(
        fn, "media_id bigint, frames binary, n_frames int"
    )
