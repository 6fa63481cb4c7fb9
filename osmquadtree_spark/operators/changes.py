"""Incremental change application — sorted-merge latest-wins semantics.

Reference (/root/reference/src/elements/combineblocks.cpp:26-162): k sorted
streams merged by (type, id); on a tie the stream with the higher file index
wins (changes are folded newest-last); with apply_change the surviving row
is dropped if its changetype is Delete(1)/Remove(2), otherwise reset to
Normal(0).

Spark-first: union + one window (row_number over (type,id) ordered by file
index desc) + a filter — the reference's cursor merge exists only because
its inputs are files; a shuffle on the key is the same join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# changetype enum (baseelement.hpp:32-39)
CT_NORMAL = 0
CT_DELETE = 1
CT_REMOVE = 2
CT_UNCHANGED = 3
CT_MODIFY = 4
CT_CREATE = 5


def apply_changes(
    main: DataFrame,
    changes: list[DataFrame],
    key_cols: list[str],
    changetype_col: str = "changetype",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Merge ``main`` (file index 0) with change tables (file index 1..k,
    newest last); latest wins per key; Delete/Remove survivors dropped and
    the rest normalized to changetype 0.

    A key may repeat WITHIN one change table (a raw .osc can carry a
    <create> and a <modify> for the same element — sources/osc.py emits
    both). Ordering only by file index would pick a shuffle-dependent
    winner, so the window breaks same-file ties deterministically, by
    priority (r3 advice — the reference applies rows in FILE ORDER with
    last-wins, so a <modify> followed by a <delete> must delete, never
    resurrect):

    1. explicit ``tiebreak_cols`` (descending) when the caller passes them;
    2. else ``file_pos`` descending when present (sources/osc.py captures
       document order at parse time — the reference's exact rule);
    3. else ``version`` descending when present (OSM rows without a
       captured position: the higher version is the later edit);
    4. else ``changetype_col`` descending (content-only last resort for
       key-value change tables)."""
    parts = [main.withColumn("_file_idx", F.lit(0))]
    for i, ch in enumerate(changes):
        parts.append(ch.withColumn("_file_idx", F.lit(i + 1)))
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    if tiebreak_cols is None:
        cols = set(unioned.columns)
        if "file_pos" in cols:
            tiebreak_cols = ["file_pos"]
        elif "version" in cols:
            tiebreak_cols = ["version"]
        else:
            tiebreak_cols = [changetype_col]
    order = [F.col("_file_idx").desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(~F.col(changetype_col).isin(CT_DELETE, CT_REMOVE))
        .drop("_rn", "_file_idx")
        .withColumn(changetype_col, F.lit(CT_NORMAL))
    )
