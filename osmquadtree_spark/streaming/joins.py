"""Stream-stream joins: the time-bounded event-correlation shape
(view→click attribution, request→response pairing, sensor→alarm windows).

This is the one Structured Streaming join form that keeps BOUNDED state
at 10^12-event scale: an inner join between two watermarked streams whose
join condition carries an explicit event-time range. Spark derives the
state-retention window from the range (a left row can only ever match
right rows within ``horizon`` of it, and vice versa), so each side's
state store holds at most watermark-delay + horizon of data per key —
independent of total stream length. Without the time bound the state
grows forever; that shape is deliberately not exposed here.

No reference analog (the reference is batch-only); the batch twin is a
plain range-predicate join, which is exactly what the sweep's DuckDB
oracle states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bounded_join_stream(
    stream: DataFrame,
    left_type: str,
    right_type: str,
    key: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "240 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner stream-stream self-join: pair every ``right_type`` event with
    each ``left_type`` event of the same ``key`` that happened within
    ``horizon`` BEFORE it (right.ts in [left.ts, left.ts + horizon)).

    The watermark is applied to the shared source BEFORE the type filters
    split it, so a single flush/heartbeat row advances event time on both
    branches (the replay harness's far-future sentinel never survives the
    filters but still moves the watermark). Inner matches emit as soon as
    both rows have arrived — append mode needs no window finalization —
    while the watermark + range bound let Spark evict state from both
    sides.

    Output: (left_id, right_id, key, left_ts, right_ts) with epoch-micro
    BIGINT timestamps (the events corpus carries microsecond precision).
    """
    wm = stream.withWatermark(ts_col, watermark)
    left = wm.filter(F.col("event_type") == left_type).select(
        F.col("event_id").alias("left_id"),
        F.col(key).alias("_lk"),
        F.col(ts_col).alias("_lts"),
    )
    right = wm.filter(F.col("event_type") == right_type).select(
        F.col("event_id").alias("right_id"),
        F.col(key).alias("_rk"),
        F.col(ts_col).alias("_rts"),
    )
    joined = left.join(
        right,
        (F.col("_lk") == F.col("_rk"))
        & (F.col("_rts") >= F.col("_lts"))
        & (F.col("_rts") < F.col("_lts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    )
    return joined.select(
        "left_id",
        "right_id",
        F.col("_lk").alias(key),
        F.unix_micros(F.col("_lts")).alias("left_ts"),
        F.unix_micros(F.col("_rts")).alias("right_ts"),
    )
