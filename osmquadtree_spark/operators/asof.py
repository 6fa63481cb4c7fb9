"""As-of (most-recent-prior) temporal join — a training-data-pipeline
primitive Spark lacks as a built-in (feature lookups "as of" an example's
event time; log enrichment against slowly-updating reference streams).

The reference engine has no temporal joins (its merges are id-ordered,
src/elements/combineblocks.cpp); this is a north-rule pipeline extension.

Scale shape: ONE shuffle. Both sides are tagged and unioned, the union is
hash-partitioned on the join keys and sorted per key by (ts, side,
tiebreak); a running ``last(ignorenulls)`` window then carries each ref
row's payload forward to every later probe row. No broadcast, no range
join, no per-row Python — the window is a single linear pass per
partition, so the cost is that of one sort-merge aggregation regardless
of how far back a probe has to look. Skewed keys: the partitioning is by
key only (the window needs whole-key ordering), so one pathological key
serializes — the standard mitigation is the same as any window (pre-split
by coarse time range and stitch across the boundary); not needed for the
synthetic corpus and documented rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probes: DataFrame,
    refs: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    ref_cols: tuple[str, ...] = ("event_id",),
    tolerance: str | None = None,
) -> DataFrame:
    """For every probe row, attach the LATEST ref row with
    ``ref.ts <= probe.ts`` in the same ``on`` group (left-join semantics:
    probes with no prior ref keep NULL ref columns).

    Tie rules (deterministic): a ref at exactly probe.ts matches (the
    ``>=`` convention, same as DuckDB's ASOF JOIN); among refs sharing one
    timestamp the one with the greatest ``ref_cols[0]`` wins — callers
    wanting DuckDB-comparable output should pre-dedupe refs per
    (key, ts) the same way, since SQL ASOF leaves that tie unspecified.

    ``tolerance``: optional maximum probe.ts − ref.ts gap as a SQL
    interval literal body, e.g. ``"30 minutes"`` (pandas
    ``merge_asof(tolerance=...)`` semantics) — a match older than the
    tolerance is nulled out, not replaced by an older one. Implemented
    as timestamp subtraction (day-time interval), so it is
    timezone-interpretation-free and works for TIMESTAMP and
    TIMESTAMP_NTZ columns alike.

    Output: every probe column, plus ``ref_<c>`` for each ``ref_cols``
    entry and ``ref_<ts_col>``."""
    carry = [f"ref_{c}" for c in ref_cols] + [f"ref_{ts_col}"]
    # the carried ref payload travels as ONE struct so last(ignorenulls)
    # picks an ENTIRE ref row atomically — carrying columns independently
    # would let a NULL in one ref payload column pull that column from an
    # older ref row, emitting a mixed match that corresponds to no real row
    struct_type = (
        "struct<"
        + ", ".join(
            [f"ref_{c}: {refs.schema[c].dataType.simpleString()}" for c in ref_cols]
            + [f"ref_{ts_col}: {refs.schema[ts_col].dataType.simpleString()}"]
        )
        + ">"
    )
    tie_type = refs.schema[(ref_cols + (ts_col,))[0]].dataType
    p = probes.select(
        *probes.columns,
        F.lit(1).alias("_side"),
        F.lit(None).cast(struct_type).alias("_ref"),
        F.lit(None).cast(tie_type).alias("_tie"),
    )
    r = refs.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.struct(
            *[F.col(c).alias(f"ref_{c}") for c in ref_cols],
            F.col(ts_col).alias(f"ref_{ts_col}"),
        ).alias("_ref"),
        F.col((ref_cols + (ts_col,))[0]).alias("_tie"),
        *[
            F.lit(None).cast(probes.schema[c].dataType).alias(c)
            for c in probes.columns
            if c not in on and c != ts_col
        ],
    )
    u = p.unionByName(r)
    # refs (side 0) sort before probes at equal ts -> the >= convention;
    # equal-ts refs resolve by the first ref column, greatest-wins
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    best = F.last("_ref", ignorenulls=True).over(w)
    matched = u.select(
        *[c for c in probes.columns],
        "_side",
        *[best.getField(c).alias(c) for c in carry],
    ).filter(F.col("_side") == 1)
    if tolerance is not None:
        too_old: Column = (
            F.col(ts_col) - F.col(f"ref_{ts_col}") > F.expr(f"INTERVAL {tolerance}")
        )
        matched = matched.select(
            *[c for c in probes.columns],
            *[F.when(too_old, F.lit(None)).otherwise(F.col(c)).alias(c) for c in carry],
        )
    return matched.drop("_side")
