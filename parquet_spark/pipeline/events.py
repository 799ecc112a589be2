"""Event-stream operators: gap-based sessionization.

The classic behavioral-data primitive (and a standard building block for
interaction-log training corpora): group each user's events into sessions
separated by inactivity gaps. Spark-first shape: ONE hash shuffle on the
user key, then per-user windows — no iteration, no Python. Every output
is order-independent (counts, min/max), so the DuckDB oracle is exact.

Scale note: the window puts one user's events on one partition, which is
the minimum data movement the semantics allow (session numbering is a
running count over the user's timeline). Pathological hot keys (bot
accounts with billions of events) should be pre-split upstream on
(user, coarse time bucket) before sessionizing within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-event session assignment: a session starts at a user's first
    event or after an inactivity gap strictly greater than `gap_minutes`.
    Ordered by (ts, id) — a total order whenever ids are unique, so the
    numbering is deterministic. Comparisons are in microseconds
    (unix_micros / epoch_us) so both engines see identical arithmetic."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # timestampdiff is exact for TIMESTAMP and TIMESTAMP_NTZ alike — an
    # NTZ→LTZ cast would shift by the DST offset in non-UTC session
    # timezones and split sessions differently from the epoch arithmetic
    # the oracle does
    tagged = df.withColumn("__prev_ts", F.lag(ts_col).over(w))
    diff_us = F.expr(f"timestampdiff(MICROSECOND, __prev_ts, `{ts_col}`)")
    start = F.when(F.col("__prev_ts").isNull() | (diff_us > gap_us), 1).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return tagged.withColumn("session_num", F.sum(start).over(running)).drop("__prev_ts")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_minutes: int = 30,
) -> DataFrame:
    """Session summary: events per session, first/last timestamps, max
    value. All aggregates are order-independent (count/min/max — a float
    SUM would make the result depend on reduction order and break
    bit-exact cross-engine comparison)."""
    s = sessionize(df, user_col, ts_col, id_col, gap_minutes)
    return s.groupBy(user_col, "session_num").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
        F.max(value_col).alias("max_value"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward AS-OF join (an operator Spark lacks natively): each left
    row picks the right row with the greatest right.ts <= left.ts for the
    same key — the point-in-time lookup every feature/training pipeline
    needs (no future leakage by construction).

    Spark-first shape: tag both sides, union, ONE hash shuffle on the key,
    and a running last-non-null window over the merged timeline — never a
    range join or per-key collect. The right row's values ride in a single
    struct so a genuinely-NULL attribute at a later timestamp correctly
    shadows an older non-null one. Ties: a right row at exactly left.ts
    matches (inclusive); multiple right rows on the same (key, ts) are
    ambiguous — deduplicate the right side first (the certification query
    does) or the window picks one nondeterministically.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (key_col, ts_col)]
    clash = [c for c in value_cols if c in left.columns]
    if clash:
        raise ValueError(f"right value column(s) {clash} collide with left columns; alias them")
    lcols = list(left.columns)
    l = left.withColumn("__is_l", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
            ) + ">"
        )
    )
    r = right.select(
        F.col(key_col), F.col(ts_col),
        F.lit(0).alias("__is_l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "__is_l")  # right rows sort before left at equal ts → inclusive
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    return u.where(F.col("__is_l") == 1).select(
        *lcols, *[F.col(f"__r.{c}").alias(c) for c in value_cols]
    )


def _epoch_us(df: DataFrame, colname: str):
    """Microseconds on a tz-independent linear clock: NTZ columns measure
    from the NTZ epoch (no session-timezone cast, so no DST shear), LTZ
    from the instant epoch."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[colname].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{colname}`)"
        )
    return F.unix_micros(F.col(colname).cast("timestamp"))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    start_col: str = "t_start",
    end_col: str = "t_end",
    bin_minutes: int = 60,
) -> DataFrame:
    """Range (point-in-interval) join: each point row matched to every
    interval row of the same key with start <= ts <= end (inclusive).

    Spark-first shape: a naive non-equi join degenerates to
    BroadcastNestedLoop/cartesian at scale, so the time axis is BINNED —
    intervals explode into the bins they cover, the join is a plain hash
    equi-join on (key, bin), and the exact range predicate filters after.
    Pick `bin_minutes` near the typical interval length: shorter bins
    multiply interval rows, longer bins multiply false candidates; both
    only cost work, never correctness."""
    bw = int(bin_minutes) * 60 * 1_000_000
    pt_bin = F.floor(_epoch_us(points, ts_col) / bw)
    iv_start = _epoch_us(intervals, start_col)
    iv_end = _epoch_us(intervals, end_col)
    pts = points.withColumn("__bin", pt_bin)
    iv = intervals.withColumn(
        "__bin", F.explode(F.sequence(F.floor(iv_start / bw), F.floor(iv_end / bw)))
    )
    out = pts.join(iv, [key_col, "__bin"]).where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return out.drop("__bin")


def time_rollup(
    df: DataFrame,
    bucket_minutes: int = 15,
    key_col: str | None = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: order-independent
    aggregates per (epoch-aligned time bucket[, key]). Pure groupBy —
    map-side partial aggregation, one shuffle on the bucket key. Bucket
    widths that divide a day evenly align identically in Spark's window
    and DuckDB/TimescaleDB's time_bucket, which is what the oracle
    checks."""
    w = F.window(F.col(ts_col), f"{int(bucket_minutes)} minutes")
    keys = [w.start.alias("bucket_start")] + ([F.col(key_col)] if key_col else [])
    return df.groupBy(*keys).agg(
        F.count("*").alias("n_events"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def session_stats_windowed(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
    watermark: str | None = None,
) -> DataFrame:
    """Session aggregation via Spark's native session window — the
    STREAMING-capable form of `session_stats` (works on static frames
    too). Boundary semantics match `sessionize` exactly: an event landing
    exactly `gap_minutes` after the previous one stays in-session; the
    split is strictly-greater (pinned by test). Output window end is
    last-event-ts + gap (Spark's definition), so `t_end` here differs
    from `session_stats`'s max(ts) by exactly the gap.

    Pass `watermark` (e.g. "1 hour") on unbounded streams: it bounds the
    session state Spark keeps and lets append-mode emit closed sessions.
    Scale note: same single shuffle on the user key as the batch path;
    state store size is O(open sessions), not O(events).
    """
    w = df.withWatermark(ts_col, watermark) if watermark else df
    return (
        w.groupBy(F.col(user_col), F.session_window(F.col(ts_col), f"{int(gap_minutes)} minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            user_col,
            F.col("session_window.start").alias("t_start"),
            F.col("session_window.end").alias("t_end"),
            "n_events",
            "max_value",
        )
    )


def session_window_oracle(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
) -> str:
    """Independent SQL reproduction of Spark's session_window semantics:
    split on gap strictly greater than the threshold; window start = first
    event, window end = last event + gap."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    win = f"PARTITION BY {user_col} ORDER BY {ts_col}"
    return (
        f"WITH e AS (SELECT {user_col}, {ts_col}, {value_col}, "
        f"CASE WHEN lag({ts_col}) OVER ({win}) IS NULL "
        f"OR epoch_us({ts_col}) - epoch_us(lag({ts_col}) OVER ({win})) > {gap_us} "
        f"THEN 1 ELSE 0 END AS s FROM {table}), "
        f"n AS (SELECT {user_col}, {ts_col}, {value_col}, "
        f"sum(s) OVER ({win} ROWS UNBOUNDED PRECEDING) AS session_num FROM e) "
        f"SELECT {user_col}, min({ts_col}) AS t_start, "
        f"max({ts_col}) + INTERVAL {int(gap_minutes)} MINUTE AS t_end, "
        f"CAST(count(*) AS BIGINT) AS n_events, "
        f"max({value_col}) AS max_value "
        f"FROM n GROUP BY {user_col}, session_num"
    )


def session_stats_oracle(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_minutes: int = 30,
) -> str:
    gap_us = int(gap_minutes) * 60 * 1_000_000
    win = f"PARTITION BY {user_col} ORDER BY {ts_col}, {id_col}"
    return (
        f"WITH e AS (SELECT {user_col}, {id_col}, {ts_col}, {value_col}, "
        f"CASE WHEN lag({ts_col}) OVER ({win}) IS NULL "
        f"OR epoch_us({ts_col}) - epoch_us(lag({ts_col}) OVER ({win})) > {gap_us} "
        f"THEN 1 ELSE 0 END AS s FROM {table}), "
        f"n AS (SELECT {user_col}, {ts_col}, {value_col}, "
        f"sum(s) OVER ({win} ROWS UNBOUNDED PRECEDING) AS session_num FROM e) "
        f"SELECT {user_col}, CAST(session_num AS BIGINT) AS session_num, "
        f"CAST(count(*) AS BIGINT) AS n_events, "
        f"min({ts_col}) AS t_start, max({ts_col}) AS t_end, "
        f"max({value_col}) AS max_value "
        f"FROM n GROUP BY {user_col}, session_num"
    )
