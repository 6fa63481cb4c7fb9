"""Multipolygon member-way fixture — constructed ground truth for the ring
assembler (split segments, alternating reversal, optional inner hole,
optional dangling open fragment), derived deterministically from the
orders keys. The DuckDB oracle states the closed-form ground truth over
the same arithmetic (functions/geometry_oracle), so engine and oracle
cannot drift.

Materialized into the qts store at build time (qts_store.build_qts_store →
``mp_members``): the member table is the INPUT of the multipolygon stage —
production reads relation members from tiled storage, it does not
re-synthesize them per query — so every run pays a prunable parquet scan,
not a ~40-array Catalyst projection per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEMBER_T = (
    "struct<role:string,refs:array<bigint>,lons:array<bigint>,lats:array<bigint>>"
)


def member_rows(orders: DataFrame, partitions: int) -> DataFrame:
    """orders → exploded member rows (rel_id, pos, role, refs, lons, lats)."""
    o = (
        orders.select(F.col("o_orderkey").cast("bigint").alias("k"))
        .repartition(partitions)
    )
    k = F.col("k")
    cx = (k * 7919) % 3000000000 - 1500000000
    cy = (k * 104729) % 1400000000 - 700000000
    s = (k % 10) * 100000 + 1000000
    o = o.withColumn("_s2", F.expr("((k % 10) * 100000 + 1000000) DIV 2"))
    s2 = F.col("_s2")

    def nid(i):
        return (k * 1000 + i).cast("bigint")

    corners = [(cx - s, cy - s), (cx + s, cy - s), (cx + s, cy + s), (cx - s, cy + s)]
    inner_c = [
        (cx - s2, cy - s2), (cx + s2, cy - s2), (cx + s2, cy + s2), (cx - s2, cy + s2)
    ]

    def member(role, ids, pts):
        return F.struct(
            F.lit(role).alias("role"),
            F.array(*[i.cast("bigint") for i in ids]).alias("refs"),
            F.array(*[p[0].cast("bigint") for p in pts]).alias("lons"),
            F.array(*[p[1].cast("bigint") for p in pts]).alias("lats"),
        )

    w1 = member("outer", [nid(0), nid(1), nid(2)], [corners[0], corners[1], corners[2]])
    w2_fwd = member("outer", [nid(2), nid(3)], [corners[2], corners[3]])
    w2_rev = member("outer", [nid(3), nid(2)], [corners[3], corners[2]])
    w3 = member("outer", [nid(3), nid(0)], [corners[3], corners[0]])
    inner = member(
        "inner",
        [nid(10), nid(11), nid(12), nid(13), nid(10)],
        [inner_c[0], inner_c[1], inner_c[2], inner_c[3], inner_c[0]],
    )
    dangling = member(
        "outer", [nid(20), nid(21)], [(cx + 2 * s, cy), (cx + 3 * s, cy)]
    )
    null_m = F.lit(None).cast(MEMBER_T)
    members = F.array(
        w1,
        F.when(k % 2 == 0, w2_rev).otherwise(w2_fwd),
        w3,
        F.when(k % 3 == 0, inner).otherwise(null_m),
        F.when(k % 5 == 0, dangling).otherwise(null_m),
    )
    return (
        o.select(k.alias("rel_id"), F.filter(members, lambda m: m.isNotNull()).alias("ms"))
        .select("rel_id", F.posexplode("ms").alias("pos", "m"))
        .select(
            "rel_id", "pos", F.col("m.role").alias("role"),
            F.col("m.refs").alias("refs"), F.col("m.lons").alias("lons"),
            F.col("m.lats").alias("lats"),
        )
    )
