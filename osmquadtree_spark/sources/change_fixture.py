"""Deterministic synthetic change set — the daily ``.osc`` analog.

The reference's update pipeline READS a diff-scale change file
(/root/reference/src/update/update.cpp:539 processes a parsed .osc change
map); it never derives the change set from the planet. This module is the
fixture-side equivalent: it derives a deterministic diff-scale change map
from the stored planet tables ONCE, at qts-store build time, and the
update queries then read the materialized change tables like production
reads the day's .osc — a diff-scale parquet scan, not a planet-scale
re-synthesis per run. The XML parsing path itself is covered separately by
sources/osc.py (the ``osc_parse`` driver query).

The modulus constants live in functions/update_oracle.py and are imported
here AND by the DuckDB oracle twins, so engine and oracle cannot drift:
node %47==0 → Modify with negated lon, node %47==1 ∧ %3==0 → Delete,
way %41==0 → Modify, rel %13==0 → Modify, plus Normal(0) context nodes
(resolvable refs of active ways). old_qt = the stored full-fixture calcqts
cell at CLI depth 17.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def derive_change_set(
    nodes: DataFrame,
    ways: DataFrame,
    rels: DataFrame,
    old: dict[str, DataFrame],
) -> dict[str, DataFrame]:
    """→ {"ch_nodes", "ch_ways", "ch_rels"} change tables (diff-scale)."""
    from ..functions.update_oracle import ACT_NODE_MOD, ACT_REL_MOD, ACT_WAY_MOD
    from ..operators.calcqts import way_node_pairs

    nid = F.col("node_id")
    act_n = nid % ACT_NODE_MOD == 0
    del_n = (nid % ACT_NODE_MOD == 1) & (nid % 3 == 0)
    act_ways = ways.filter(F.col("way_id") % ACT_WAY_MOD == 0)
    ctx = way_node_pairs(act_ways).select("node_id").distinct()
    ch_nodes = (
        nodes.join(ctx.withColumn("_ctx", F.lit(True)), "node_id", "left")
        .filter(act_n | del_n | F.col("_ctx").isNotNull())
        .select(
            "node_id",
            F.when(act_n, -F.col("lon")).otherwise(F.col("lon")).alias("lon"),
            "lat",
            F.when(act_n, F.lit(4))
            .when(del_n, F.lit(1))
            .otherwise(F.lit(0))
            .alias("changetype"),
        )
        .join(old["nodes"].withColumnRenamed("qt", "old_qt"), "node_id", "left")
    )
    ch_ways = act_ways.withColumn("changetype", F.lit(4)).join(
        old["ways"].withColumnRenamed("qt", "old_qt"), "way_id", "left"
    )
    ch_rels = (
        rels.filter(F.col("rel_id") % ACT_REL_MOD == 0)
        .withColumn("changetype", F.lit(4))
        .join(old["relations"].withColumnRenamed("qt", "old_qt"), "rel_id", "left")
    )
    return {"ch_nodes": ch_nodes, "ch_ways": ch_ways, "ch_rels": ch_rels}
