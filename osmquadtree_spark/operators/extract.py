"""Spatial extract operators — bbox/polygon filters with the reference's
id-expansion semantics, plus partition-level tile pruning.

Reference: run_mergechanges filter_objs (/root/reference/src/sorting/
mergechanges.cpp:164-317) — nodes hit by box/poly; ways kept if *any* ref
hit, and then all their refs become "extra nodes"; relations kept if any
member kept, closed over rel→rel membership for 5 passes. Tile-level
pre-prune via buffered cell bbox (readblockscaller.cpp:86-136).

Spark-first: the IdSet becomes a chain of semi-joins (no driver-side bitset;
the reference's set-vs-bitvec choice at mergechanges.cpp:300-317 is a RAM
workaround Spark doesn't need). Tile pruning is a driver-computed cell list
pushed into a partition filter on the tile-sorted table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..kernels import geom as gk
from ..kernels import quadtree as qtk

Box = tuple[int, int, int, int]  # minx, miny, maxx, maxy fixed-point


def box_filter(df: DataFrame, box: Box, minx="minx", miny="miny", maxx="maxx", maxy="maxy") -> DataFrame:
    """Rows whose bbox overlaps the query box — closed intervals, pure JVM
    comparisons (contains/overlaps, bbox.hpp:38-50)."""
    a, b, c, d = box
    return df.filter(
        (F.col(minx) <= F.lit(c))
        & (F.col(maxx) >= F.lit(a))
        & (F.col(miny) <= F.lit(d))
        & (F.col(maxy) >= F.lit(b))
    )


def make_pnpoly_udf(poly: gk.Polygon):
    @pandas_udf("boolean")
    def pnpoly(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(gk.point_in_poly(poly, lon.to_numpy("int64"), lat.to_numpy("int64")))

    return pnpoly


def poly_filter(df: DataFrame, poly: gk.Polygon, lon="minx", lat="miny") -> DataFrame:
    """Point-in-polygon row filter (pnpoly, geometry.cpp:30-80)."""
    return df.filter(make_pnpoly_udf(poly)(F.col(lon), F.col(lat)))


def prune_tiles(tile_qts: np.ndarray, box: Box, buffer: float = qtk.BUFFER_DEFAULT) -> np.ndarray:
    """Driver-side partition pruning: the subset of tile cells that can hold
    elements overlapping the box, via the sound mercator-space overlap test
    (see kernels.quadtree.tiles_overlapping_box)."""
    mask = qtk.tiles_overlapping_box(tile_qts, *box, buffer=buffer)
    return tile_qts[mask]


def extract_with_expansion(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    box: Box,
    poly: gk.Polygon | None = None,
) -> dict[str, DataFrame]:
    """The mergechanges IdSet filter as semi-joins.

    nodes: (node_id, lon, lat); ways: (way_id, refs array); relations:
    (rel_id, members array<struct<m_type, m_ref>>).

    Returns {'node_ids', 'way_ids', 'rel_ids'} DataFrames of kept ids:
    * node hit: lon/lat in box (and in poly if given) — check_node
      (mergechanges.cpp:236-240)
    * way kept iff any ref hit; then ALL its refs are kept ("extra nodes") —
      check_way (242-261)
    * relation kept iff any node/way member kept; rel→rel closed 5 passes;
      relations that remain member-only are dropped — check_relation +
      closure (263-298, 181-189)
    """
    a, b, c, d = box
    hit = nodes.filter(
        (F.col("lon") >= a) & (F.col("lon") <= c) & (F.col("lat") >= b) & (F.col("lat") <= d)
    )
    if poly is not None:
        hit = hit.filter(make_pnpoly_udf(poly)(F.col("lon"), F.col("lat")))
    node_hits = hit.select("node_id")

    pairs = ways.select("way_id", F.explode("refs").alias("node_id"))
    way_ids = pairs.join(node_hits, "node_id", "left_semi").select("way_id").distinct()
    # extra nodes: every ref of a kept way (mergechanges.cpp:249-259)
    node_ids = (
        pairs.join(way_ids, "way_id", "left_semi")
        .select("node_id")
        .unionByName(node_hits)
        .distinct()
    )

    members = relations.select(
        "rel_id", F.explode("members").alias("m")
    ).select("rel_id", F.col("m.m_type").alias("m_type"), F.col("m.m_ref").alias("m_ref"))
    rel_from_nodes = (
        members.filter(F.col("m_type") == 0)
        .join(node_ids.withColumnRenamed("node_id", "m_ref"), "m_ref", "left_semi")
        .select("rel_id")
    )
    rel_from_ways = (
        members.filter(F.col("m_type") == 1)
        .join(way_ids.withColumnRenamed("way_id", "m_ref"), "m_ref", "left_semi")
        .select("rel_id")
    )
    rel_ids = rel_from_nodes.unionByName(rel_from_ways).distinct()
    relrel = members.filter(F.col("m_type") == 2).select("rel_id", F.col("m_ref").alias("child_id"))
    for _ in range(5):  # fixed 5-pass closure (mergechanges.cpp:181-189)
        parents = relrel.join(
            rel_ids.withColumnRenamed("rel_id", "child_id"), "child_id", "left_semi"
        ).select("rel_id")
        rel_ids = rel_ids.unionByName(parents).distinct()
    return {"node_ids": node_ids, "way_ids": way_ids, "rel_ids": rel_ids}
