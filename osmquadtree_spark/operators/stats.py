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
