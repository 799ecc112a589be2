"""Stateful streaming dedup: drop documents whose (normalized) text hash
was already seen in ANY earlier micro-batch.

The reference has no streaming surface at all (SURVEY.md §2.5); this is
the custom-stateful-operator pattern the engine adds on top:
`applyInPandasWithState` keyed by the text hash, with a boolean "seen"
state per key — the Structured Streaming analogue of
`pipeline/dedup.dedup_exact`, but incremental: each micro-batch emits only
rows whose key has never been seen before, across batches and restarts
(state lives in the checkpoint).

Scale notes: state is one tiny record per distinct document hash, hash-
partitioned by Spark's state store — the same shuffle key as the batch
dedup's groupBy. For unbounded corpora set `ttl_minutes` so the state
store evicts keys that have not recurred (a sliding dedup window), which
bounds state size; ttl None keeps exact global semantics.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from parquet_spark.pipeline.dedup import normalize_text

_STATE_SCHEMA = "seen boolean"


def streaming_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming DataFrame → first-occurrence rows (id, text_md5).

    Keyed stateful map: key = md5(normalized text); state = seen flag.
    A key's first row (smallest id within its first batch, for
    determinism) is emitted once; every later occurrence — same batch or
    any later one — is dropped."""
    out_schema = f"{id_col} long, text_md5 string"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_minutes else GroupStateTimeout.NoTimeout
    )

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first_id = None
        for pdf in pdfs:
            batch_min = pdf[id_col].min()
            if first_id is None or batch_min < first_id:
                first_id = batch_min
        if state.exists or first_id is None:
            if ttl_minutes:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
            return
        state.update((True,))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame({id_col: [first_id], "text_md5": [key[0]]})

    keyed = stream_df.select(
        F.md5(normalize_text(F.col(text_col))).alias("text_md5"), F.col(id_col)
    ).groupBy("text_md5")
    return keyed.applyInPandasWithState(fn, out_schema, _STATE_SCHEMA, "update", timeout)
