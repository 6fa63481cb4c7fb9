"""Interval-containment (range) join — point ts ∈ [start, end) per key.

Spark has no range-join optimization: expressing ``p.ts BETWEEN i.start
AND i.end`` directly compiles to a broadcast-nested-loop or cartesian
join, which dies at scale. The standard distributed shape (used by
Databricks' range-join hints and every stream-warehouse) is bucketizing:
chunk time into coarse buckets, explode each interval into the buckets it
overlaps (intervals are short relative to the bucket, so the fan-out is
1-3 rows), bucket each point, equi-join on (key, bucket), then apply the
exact containment predicate. One shuffle, no pairwise scan, skew bounded
by points-per-(key, bucket).

The reference engine has no temporal joins; this is a north-rule
training-pipeline extension (event attribution, log windowing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, width_us: int):
    # NTZ-safe: cast to TIMESTAMP interprets the wall time in the session
    # timezone, which shifts ALL rows by one constant offset — bucket
    # boundaries move with it, so join completeness is unaffected (the
    # exact containment filter below compares the raw columns, tz-free).
    return F.floor(F.unix_micros(col.cast("timestamp")) / width_us)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket: str = "1 day",
) -> DataFrame:
    """Inner join: every point row × the interval rows of the same ``on``
    key with ``start <= ts < end`` (half-open, so back-to-back intervals
    never double-match a boundary point). Output: all point columns plus
    the interval's non-key columns.

    ``bucket`` (SQL interval body, e.g. "1 day") should be chosen ≥ the
    typical interval length: shorter buckets mean more exploded rows per
    interval, longer buckets mean more false candidates for the exact
    filter. Both are correct; only the constant factors move."""
    qty, unit = bucket.split()
    width_us = int(qty) * {
        "second": 1_000_000, "seconds": 1_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "hour": 3_600_000_000, "hours": 3_600_000_000,
        "day": 86_400_000_000, "days": 86_400_000_000,
    }[unit]
    icols = [c for c in intervals.columns if c not in on]
    # drop empty/inverted intervals BEFORE the explode: they can match no
    # point under half-open semantics, and F.sequence(start_bkt, end_bkt)
    # with end < start would generate the whole DESCENDING bucket range —
    # one corrupt epoch-zero end date would explode into ~half a million
    # rows that the exact filter then discards
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    iv = intervals.select(
        *on,
        *icols,
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), width_us),
                # end is exclusive: an interval ending exactly on a bucket
                # boundary does not reach into the next bucket
                _bucket(F.col(end_col) - F.expr("INTERVAL 1 microsecond"), width_us),
            )
        ).alias("_bkt"),
    )
    pt = points.withColumn("_bkt", _bucket(F.col(ts_col), width_us))
    return (
        pt.join(iv, [*on, "_bkt"])
        .filter(
            (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bkt")
    )


def sessionize(
    df: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    gap: str = "12 hours",
) -> DataFrame:
    """Batch gaps-and-islands sessionization — the batch twin of
    streaming/ingest.session_counts_stream (same >= break convention:
    an event at exactly last + gap opens a NEW session, so sessions are
    half-open [first, last + gap) and back-to-back sessions are disjoint).
    Returns (on..., sess_start, sess_end, n_events). One shuffle + two
    linear window passes per key."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*on).orderBy(ts_col)
    brk = F.when(
        F.col(ts_col) - F.lag(ts_col).over(w) >= F.expr(f"INTERVAL {gap}"), 1
    ).otherwise(0)  # first row's NULL lag falls to 0: sid starts at 0 per key
    sid = F.sum(brk).over(
        Window.partitionBy(*on).orderBy(ts_col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return (
        df.select(*on, ts_col, sid.alias("_sid"))
        .groupBy(*on, "_sid")
        .agg(
            F.min(ts_col).alias("sess_start"),
            (F.max(ts_col) + F.expr(f"INTERVAL {gap}")).alias("sess_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_sid")
    )
