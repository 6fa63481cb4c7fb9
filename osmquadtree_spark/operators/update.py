"""Incremental update: re-derive quadtrees for a change set and route rows
to tiles, with Remove tombstones in vacated tiles.

Reference semantics (/root/reference/src/update/update.cpp):

* ``calc_change_qts`` (539-654): elements with changetype > Delete get new
  cells — ways from the bbox of their (possibly moved) member nodes at
  buffer 0.05 / depth 18, member nodes from the common()-fold of their
  active ways' cells, remaining active nodes from their point cell,
  relations from the member-LCA + the 5-pass rel→rel closure. Then per
  element: Normal context rows whose cell did not change are DROPPED
  (update.cpp:645-651 "remove unneeded extra nodes"); Normal rows whose
  cell changed become Unchanged with the new cell; Unchanged/Modify/Create
  take the new cell; Delete/Remove keep their old cell.
* ``find_change_tiles`` (656-700): survivors (ct > Remove) land in
  ``find_tile(cell)``; if the original allocation differs, a COPY with
  changetype Remove and qt 0 is added to the OLD tile (the tombstone that
  evicts the stale row); Delete/Remove rows go to their original tile with
  qt 0.

Spark-first: the reference's id-indexed element map is the shuffled key; the
whole pass is joins + CASE, reusing the calcqts operators at depth 18.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import cached
from ..functions.udfs import make_qt_calculate, qt_common_col
from ..kernels import quadtree as qtk
from .calcqts import relation_quadtrees, way_node_pairs, way_quadtrees
from .changes import CT_DELETE, CT_REMOVE, CT_UNCHANGED
from .sortblocks import make_assign_group_udf

UPDATE_DEPTH = 18  # update path uses depth 18 (update.cpp:562)


def calc_change_qts(
    nodes: DataFrame,
    ways: DataFrame,
    rels: DataFrame,
    buffer: float = qtk.BUFFER_DEFAULT,
    max_depth: int = UPDATE_DEPTH,
) -> dict[str, DataFrame]:
    """Change-set → resolved (id, qt, changetype) per element type.

    Inputs carry the change map: nodes(node_id, lon, lat, changetype,
    old_qt), ways(way_id, refs, changetype, old_qt), rels(rel_id, members,
    changetype, old_qt). Normal(0) rows are the context pulled from existing
    tiles; their old_qt is the stored cell. Rows dropped from the output are
    the reference's erased "unneeded extra nodes". Unresolvable way refs are
    skipped (the reference hard-fails after 10 missing nodes —
    strictness belongs to the caller; see missing_ref_count)."""
    ct = F.col("changetype")
    active_ways = ways.filter(ct > CT_DELETE)
    # way cells feed the node fold, the way resolution, and the relation
    # member lookup; node cells feed resolution + relations — persist both
    # (the reference's qts store plays the same role, update.cpp:539).
    # small_nodes: a change set is diff-scale by construction (update.cpp
    # processes daily .osc files), so the node-location lookup broadcasts.
    wq = cached(way_quadtrees(active_ways, nodes, buffer, max_depth, small_nodes=True))

    qt_calc = make_qt_calculate(buffer, max_depth)
    from_ways = (
        way_node_pairs(active_ways)
        .join(F.broadcast(wq), "way_id")
        .filter(F.col("qt") >= 0)
        .groupBy("node_id")
        .agg(F.min("qt").alias("qt_min"), F.max("qt").alias("qt_max"))
        .select("node_id", qt_common_col("qt_min", "qt_max").alias("way_qt"))
    )
    node_new = nodes.join(from_ways, "node_id", "left").select(
        "node_id",
        "changetype",
        "old_qt",
        F.when(F.col("way_qt").isNotNull(), F.col("way_qt"))
        .when(ct > CT_DELETE, qt_calc("lon", "lat", "lon", "lat"))
        .alias("new_qt"),
    )
    node_new = cached(node_new)

    active_rels = rels.filter(ct > CT_DELETE)
    rq = relation_quadtrees(
        active_rels.select("rel_id", "members"),
        node_new.filter(F.col("new_qt").isNotNull()).select(
            "node_id", F.col("new_qt").alias("qt")
        ),
        wq,
        small_member_qts=True,
    )

    def resolve(df: DataFrame, id_col: str) -> DataFrame:
        c = F.col("changetype")
        new, old = F.col("new_qt"), F.col("old_qt")
        return (
            df.withColumn(
                "_drop",
                # Normal context whose cell didn't change (the reference's
                # erased "extra nodes"), and survivors with NO derivable
                # cell (a way none of whose refs resolved — the reference
                # aborts instead, update.cpp:548-556; we skip like the
                # calcqts path and surface the count via missing_ref_count)
                ((c == 0) & (new.isNull() | (new == old)))
                | ((c > CT_REMOVE) & new.isNull()),
            )
            .filter(~F.col("_drop"))
            .select(
                F.col(id_col),
                F.when(c.isin(CT_DELETE, CT_REMOVE), old).otherwise(new).alias("qt"),
                F.when(c == 0, F.lit(CT_UNCHANGED)).otherwise(c).alias("changetype"),
            )
        )

    way_new = ways.join(wq.withColumnRenamed("qt", "new_qt"), "way_id", "left").select(
        "way_id", "changetype", "old_qt", "new_qt"
    )
    rel_new = rels.join(rq.withColumnRenamed("qt", "new_qt"), "rel_id", "left").select(
        "rel_id", "changetype", "old_qt", "new_qt"
    )
    return {
        "nodes": resolve(node_new, "node_id"),
        "ways": resolve(way_new, "way_id"),
        "relations": resolve(rel_new, "rel_id"),
    }


def missing_ref_count(nodes: DataFrame, ways: DataFrame) -> int:
    """Ways' refs missing from the change map — the reference aborts above
    10 (update.cpp:538, 548-556); callers enforce the policy."""
    ct = F.col("changetype")
    pairs = way_node_pairs(ways.filter(ct > CT_DELETE))
    return pairs.join(nodes.select("node_id"), "node_id", "left_anti").count()


def change_allocs(
    stored: DataFrame,
    elements: DataFrame,
    group_qts: np.ndarray,
) -> DataFrame:
    """Diff-bounded original-tile allocations (element_type, id, alloc).

    ``stored`` is the full old-element cell table (element_type, id, qt) —
    planet-scale; ``elements`` the resolved change rows. The stored table is
    SEMI-JOINED to the change-set ids BEFORE the ``find_tile`` kernel runs,
    so the assign UDF touches O(|change set|) rows per update, not
    O(planet) — the Spark analog of the reference's ``-index.pbf`` prune
    (update.cpp:217-254: only tiles containing affected ids are read).
    The change-set id list is diff-scale by construction (a daily .osc), so
    it broadcasts; the planet-side scan stays a pruned parquet scan and the
    only full-store work is the columnar (element_type, id, qt) read."""
    assign = make_assign_group_udf(stored.sparkSession, group_qts)
    ids = elements.select("element_type", "id")
    bounded = stored.join(F.broadcast(ids), ["element_type", "id"], "leftsemi")
    return bounded.select("element_type", "id", assign(F.col("qt")).alias("alloc"))


def find_change_tiles(
    elements: DataFrame,
    orig_allocs: DataFrame,
    group_qts: np.ndarray,
) -> DataFrame:
    """Route resolved change rows to tiles (update.cpp:656-700).

    ``elements``: (element_type, id, qt, changetype) from calc_change_qts;
    ``orig_allocs``: (element_type, id, alloc) — the tile each element lived
    in (the reference's ``-index.pbf`` side table, update.cpp:115-195);
    ``group_qts``: the sorted group table (find_tile domain).

    Output: (tile_qt, element_type, id, qt, changetype) — survivors in
    their new tile, tombstones (changetype Remove, qt 0) in vacated tiles,
    deletes in their original tile with qt 0. One shuffle (the join) + the
    broadcast assignment kernel; ordering by (tile_qt, element_type, id) is
    the tiled-file write order."""
    assign = make_assign_group_udf(elements.sparkSession, group_qts)
    # three output branches (placed / tombstones / deletes) read this join —
    # materialize once instead of re-running the resolution lineage 3×
    e = cached(elements.join(orig_allocs, ["element_type", "id"], "left"))
    ct = F.col("changetype")

    surv = e.filter(ct > CT_REMOVE).withColumn("tile_qt", assign(F.col("qt")))
    placed = surv.select("tile_qt", "element_type", "id", "qt", "changetype")
    tombstones = surv.filter(
        F.col("alloc").isNotNull() & (F.col("alloc") != F.col("tile_qt"))
    ).select(
        F.col("alloc").alias("tile_qt"),
        "element_type",
        "id",
        F.lit(0).cast("bigint").alias("qt"),
        F.lit(CT_REMOVE).alias("changetype"),
    )
    deletes = e.filter(ct.isin(CT_DELETE, CT_REMOVE) & F.col("alloc").isNotNull()).select(
        F.col("alloc").alias("tile_qt"),
        "element_type",
        "id",
        F.lit(0).cast("bigint").alias("qt"),
        "changetype",
    )
    return placed.unionByName(tombstones).unionByName(deletes)
