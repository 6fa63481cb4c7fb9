"""`oqt count` — per-type reconciliation statistics
(/root/reference/src/count.cpp:44-220, run_count 568).

The reference folds CountElement/CountNode/CountWay/CountRelation
accumulators over every block and merges them (`expand`) — an algebraic
aggregate, i.e. exactly one Spark groupBy with partial+final combine. Used
before/after a sort to assert conservation (SURVEY §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_elements(nodes: DataFrame, ways: DataFrame, rels: DataFrame) -> DataFrame:
    """One row per element type (0 node / 1 way / 2 relation):
    count, min/max id, plus the type-specific extrema — node lon/lat bbox
    (count.cpp:115-140), way ref statistics (num refs, min/max ref,
    max refs-per-way, count.cpp:142-180), relation member statistics."""
    n = nodes.agg(
        F.lit(0).alias("element_type"),
        F.count(F.lit(1)).alias("num_objects"),
        F.min("node_id").alias("min_id"),
        F.max("node_id").alias("max_id"),
        F.min("lon").alias("min_lon"),
        F.min("lat").alias("min_lat"),
        F.max("lon").alias("max_lon"),
        F.max("lat").alias("max_lat"),
        F.lit(None).cast("bigint").alias("num_refs"),
        F.lit(None).cast("bigint").alias("min_ref"),
        F.lit(None).cast("bigint").alias("max_ref"),
        F.lit(None).cast("bigint").alias("max_per_obj"),
    )
    wr = ways.select("way_id", F.explode("refs").alias("ref"))
    w = (
        ways.select(
            "way_id", F.size("refs").cast("bigint").alias("_n")
        )
        .agg(
            F.lit(1).alias("element_type"),
            F.count(F.lit(1)).alias("num_objects"),
            F.min("way_id").alias("min_id"),
            F.max("way_id").alias("max_id"),
            F.lit(None).cast("bigint").alias("min_lon"),
            F.lit(None).cast("bigint").alias("min_lat"),
            F.lit(None).cast("bigint").alias("max_lon"),
            F.lit(None).cast("bigint").alias("max_lat"),
            F.sum("_n").alias("num_refs"),
            F.lit(None).cast("bigint").alias("min_ref"),
            F.lit(None).cast("bigint").alias("max_ref"),
            F.max("_n").alias("max_per_obj"),
        )
        .join(
            wr.agg(F.min("ref").alias("_minr"), F.max("ref").alias("_maxr")),
            F.lit(True),
        )
        .select(
            "element_type", "num_objects", "min_id", "max_id",
            "min_lon", "min_lat", "max_lon", "max_lat",
            "num_refs",
            F.col("_minr").alias("min_ref"),
            F.col("_maxr").alias("max_ref"),
            "max_per_obj",
        )
    )
    r = rels.select("rel_id", F.size("members").cast("bigint").alias("_n")).agg(
        F.lit(2).alias("element_type"),
        F.count(F.lit(1)).alias("num_objects"),
        F.min("rel_id").alias("min_id"),
        F.max("rel_id").alias("max_id"),
        F.lit(None).cast("bigint").alias("min_lon"),
        F.lit(None).cast("bigint").alias("min_lat"),
        F.lit(None).cast("bigint").alias("max_lon"),
        F.lit(None).cast("bigint").alias("max_lat"),
        F.sum("_n").alias("num_refs"),
        F.lit(None).cast("bigint").alias("min_ref"),
        F.lit(None).cast("bigint").alias("max_ref"),
        F.max("_n").alias("max_per_obj"),
    )
    return n.unionByName(w).unionByName(r)


# -- element diff / reconciliation (compare_element + diffreason,
#    /root/reference/python/src/count_python.cpp:82-186) -----------------------

DIFF_REASONS = (
    "Same", "Object", "Info", "Tags", "LonLat", "Refs",
    "Members", "Quadtree", "ChangeType", "NoLeft", "NoRight",
)


def element_diff(
    left: DataFrame,
    right: DataFrame,
    keys: tuple[str, ...] = ("element_type", "id"),
    include_same: bool = False,
) -> DataFrame:
    """compare_element over two element tables — the reference's
    operational diff harness restated as ONE full-outer join + a CASE
    chain in the reference's check precedence
    (count_python.cpp:114-186): missing side → NoLeft/NoRight; then
    Info (version/timestamp/changeset/user_id), Tags (sorted compare,
    the std::sort in compare_element), LonLat, Refs (ordered), Members
    (ordered incl. role), Quadtree, ChangeType; else Same.

    Compares whichever of the known columns are present in BOTH schemas;
    identity is the ``keys`` tuple (the reference iterates two id-sorted
    streams — the join replaces the merge walk). Returns
    (*keys, reason) — diffs only unless ``include_same``.
    """
    shared = [c for c in left.columns if c in right.columns and c not in keys]
    l = left.select(*keys, *[F.col(c).alias(f"_l_{c}") for c in shared]).withColumn(
        "_lp", F.lit(True)
    )
    r = right.select(*keys, *[F.col(c).alias(f"_r_{c}") for c in shared]).withColumn(
        "_rp", F.lit(True)
    )
    j = l.join(r, list(keys), "full_outer")

    def neq(c):
        lc, rc = F.col(f"_l_{c}"), F.col(f"_r_{c}")
        if c == "tags":  # reference sorts both sides by key before comparing
            lc, rc = F.array_sort(lc), F.array_sort(rc)
        # every other column (incl. ordered struct arrays like members/refs)
        # compares positionally
        return ~(lc.eqNullSafe(rc))

    def any_neq(cols):
        out = None
        for c in cols:
            if c not in shared:
                continue
            e = neq(c)
            out = e if out is None else (out | e)
        return out

    reason = F.when(F.col("_lp").isNull(), F.lit("NoLeft")).when(
        F.col("_rp").isNull(), F.lit("NoRight")
    )
    checks = [
        ("Info", ("version", "timestamp", "changeset", "user_id")),
        ("Tags", ("tags",)),
        ("LonLat", ("lon", "lat")),
        ("Refs", ("refs",)),
        ("Members", ("members",)),
        ("Quadtree", ("qt",)),
        ("ChangeType", ("changetype",)),
    ]
    for name, cols in checks:
        cond = any_neq(cols)
        if cond is not None:
            reason = reason.when(cond, F.lit(name))
    out = j.select(*keys, reason.otherwise(F.lit("Same")).alias("reason"))
    return out if include_same else out.filter(F.col("reason") != "Same")
