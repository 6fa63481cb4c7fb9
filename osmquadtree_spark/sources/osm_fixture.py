"""OSM-shaped fixture tables (nodes/ways/relations) derived deterministically
from the provided parquet, with DuckDB SQL twins.

The calcqts operators (operators/calcqts.py) reproduce the reference's
element→quadtree assignment (way bbox → cell; node LCA-of-ways → cell;
relation member LCA + 5-pass rel→rel closure,
/root/reference/src/calcqts/calcqtsinmem.cpp:120-310). To put those operators
under the driver's DuckDB correctness gate, this module derives an OSM-shaped
(node, way, relation) universe as a pure function of the sf tables:

* nodes      = the georeferenced elements (sources/geo.py): node_id=elem_id,
               lon=minx, lat=miny — ids are sparse (orderkey*8+linenumber).
* ways       = one per order: way ``w`` refs nodes [8w+1 .. 8w+12]. Lineitem
               numbers run 1..7, so a way covers its own order's nodes *and*
               the next order's low nodes — consecutive ways share nodes,
               which makes the node-qt LCA fold non-trivial. Refs that don't
               resolve are skipped, as in the reference
               (calcqtsinmem.cpp:262-271).
* relations  = one per customer ``r``: a node member (24r+1), two way members
               (3r, 3r+1), a rel→rel edge to r-1 when r%4==1 and to r+2 when
               r%16==0. The rel→rel graph is an acyclic DAG of depth ≤ 2, so
               the closure's fixpoint is reached within the reference's 5
               passes by both the engine's exact Gauss-Seidel order and the
               oracle's Jacobi restatement (they agree at the fixpoint; depth
               > 5 or cyclic graphs, where pass order becomes observable, are
               covered by tests/test_calcqts.py against the scalar oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .geo import elements_sql, geo_elements

WAY_REF_START = 1  # refs [8w+1, 8w+12]
WAY_REF_END = 12


def fixture_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node_id, lon, lat) from the georeferenced elements."""
    e = geo_elements(spark, sf_dir)
    # the synthetic lineitem repeats (orderkey, linenumber) pairs, so elem_id
    # is a multiset; coords are a pure function of the id → DISTINCT is exact
    return e.select(
        F.col("elem_id").alias("node_id"),
        F.col("minx").alias("lon"),
        F.col("miny").alias("lat"),
    ).distinct()


def nodes_sql() -> str:
    return (
        "SELECT DISTINCT elem_id AS node_id, minx AS lon, miny AS lat FROM ("
        + elements_sql(intdiv="//")
        + ")"
    )


def fixture_ways(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(way_id, refs array<bigint>): way per order, refs [8w+1 .. 8w+12]."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    return o.select(
        F.col("o_orderkey").alias("way_id"),
        F.sequence(
            F.col("o_orderkey") * 8 + WAY_REF_START,
            F.col("o_orderkey") * 8 + WAY_REF_END,
        ).alias("refs"),
    )


def way_pairs_sql() -> str:
    """DuckDB: exploded (way_id, node_id) pairs."""
    return (
        "SELECT o_orderkey AS way_id, "
        f"unnest(generate_series(o_orderkey * 8 + {WAY_REF_START}, "
        f"o_orderkey * 8 + {WAY_REF_END})) AS node_id FROM orders"
    )


def fixture_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rel_id, members array<struct<m_type:int, m_ref:bigint>>)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    r = F.col("c_custkey").cast("bigint")

    def m(t, ref):
        return F.struct(
            F.lit(t).cast("int").alias("m_type"), ref.cast("bigint").alias("m_ref")
        )

    null_m = F.lit(None).cast("struct<m_type:int,m_ref:bigint>")
    members = F.array(
        m(0, r * 24 + 1),
        m(1, r * 3),
        m(1, r * 3 + 1),
        F.when(r % 4 == 1, m(2, r - 1)).otherwise(null_m),
        F.when(r % 16 == 0, m(2, r + 2)).otherwise(null_m),
    )
    return c.select(
        r.alias("rel_id"),
        F.filter(members, lambda x: x.isNotNull()).alias("members"),
    )


def _tag_entry(key, val):
    return F.struct(F.lit(key).alias("key"), val.alias("val"))


def _tag_array(entries):
    null_t = F.lit(None).cast("struct<key:string,val:string>")
    guarded = [
        F.when(cond, _tag_entry(key, val)).otherwise(null_t) for key, val, cond in entries
    ]
    return F.filter(F.array(*guarded), lambda x: x.isNotNull())


# deterministic way tag rules (shared by the Spark fixture and the SQL
# oracle generator in functions/geometry_oracle.py — keep in sync with
# WAY_TAG_RULES below, which is the single source of truth)
HW_VALS = [None, "motorway", "residential", "footway", "services",
           "construction_zone", "service", "track", "rest_area"]

# (key, value_sql_template, cond_sql_template) with {w} the way id; the Spark
# side derives from the same table via _rule_col
WAY_TAG_RULES = [
    ("highway", "CASE ({w}) % 9 " + " ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(HW_VALS) if v) + " END",
        "({w}) % 9 != 0"),
    ("construction", "'primary'", "({w}) % 17 = 0"),
    ("railway", "CASE ({w}) % 13 WHEN 0 THEN 'rail' WHEN 1 THEN 'tram' WHEN 2 THEN 'station' END",
        "({w}) % 13 IN (0, 1, 2)"),
    ("aeroway", "CASE ({w}) % 21 WHEN 5 THEN 'runway' WHEN 6 THEN 'taxiway' END",
        "({w}) % 21 IN (5, 6)"),
    ("building", "'yes'", "({w}) % 7 = 3"),
    ("natural", "CASE ({w}) % 19 WHEN 2 THEN 'water' WHEN 3 THEN 'coastline' END",
        "({w}) % 19 IN (2, 3)"),
    ("waterway", "CASE ({w}) % 23 WHEN 4 THEN 'riverbank' WHEN 5 THEN 'stream' END",
        "({w}) % 23 IN (4, 5)"),
    ("man_made", "CASE ({w}) % 27 WHEN 6 THEN 'pier' WHEN 7 THEN 'cutline' END",
        "({w}) % 27 IN (6, 7)"),
    ("area", "CASE ({w}) % 31 WHEN 8 THEN 'yes' WHEN 9 THEN 'no' END",
        "({w}) % 31 IN (8, 9)"),
    ("service", "CASE ({w}) % 10 WHEN 7 THEN 'alley' WHEN 8 THEN 'driveway' END",
        "({w}) % 10 IN (7, 8)"),
    ("layer", "CAST(({w}) % 7 - 3 AS VARCHAR)", "({w}) % 5 = 1"),
    ("ref", "'A' || CAST(({w}) % 12 AS VARCHAR)", "({w}) % 3 = 0"),
    ("note", "'tmp'", "({w}) % 11 = 0"),
    ("source:date", "'2020'", "({w}) % 11 = 1"),
    ("name", "'way ' || CAST(({w}) % 50 AS VARCHAR)", "({w}) % 2 = 0"),
]

NODE_TAG_RULES = [
    ("crossing", "'zebra'", "({w}) % 17 = 0"),
    ("highway", "'bus_stop'", "({w}) % 23 = 0"),
    ("railway", "'halt'", "({w}) % 23 = 1"),
    ("name", "'n' || CAST(({w}) % 9 AS VARCHAR)", "({w}) % 13 = 0"),
]

REL_TAG_RULES = [
    ("type", "CASE ({w}) % 5 WHEN 0 THEN 'boundary' WHEN 1 THEN 'route' END",
        "({w}) % 5 IN (0, 1)"),
    ("boundary", "CASE ({w}) % 10 WHEN 0 THEN 'administrative' WHEN 5 THEN 'historic' END",
        "({w}) % 10 IN (0, 5)"),
    ("route", "CASE (({w}) // 5) % 3 WHEN 0 THEN 'bus' WHEN 1 THEN 'bicycle' ELSE 'train' END",
        "({w}) % 5 = 1"),
    ("admin_level", "CASE WHEN ({w}) % 3 = 2 THEN 'x' ELSE CAST(({w}) % 13 - 1 AS VARCHAR) END",
        "({w}) % 2 = 0"),
    ("ref", "'R' || CAST(({w}) % 8 AS VARCHAR)", "({w}) % 3 != 1"),
]


def _rules_to_tags(id_col, rules):
    """Build the ordered tags array column from the SQL rule table (Spark
    parses the same SQL snippets via F.expr, so both engines share one
    definition)."""
    entries = []
    for key, val_sql, cond_sql in rules:
        w = f"CAST({id_col} AS BIGINT)"
        # dialect shims: Spark's parser wants STRING (not bare VARCHAR) and
        # DIV (not //) for integer division
        val = F.expr(
            val_sql.replace("{w}", w).replace("//", " DIV ").replace("VARCHAR", "STRING")
        )
        cond = F.expr(cond_sql.replace("{w}", w).replace("//", " DIV "))
        entries.append((key, val, cond))
    return _tag_array(entries)


def fixture_way_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ways = fixture_ways(spark, sf_dir)
    return ways.select("way_id", _rules_to_tags("way_id", WAY_TAG_RULES).alias("tags"))


def fixture_node_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = fixture_nodes(spark, sf_dir)
    return nodes.select(
        "node_id", _rules_to_tags("node_id", NODE_TAG_RULES).alias("tags")
    )


def fixture_rel_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    rels = fixture_relations(spark, sf_dir)
    return rels.select("rel_id", _rules_to_tags("rel_id", REL_TAG_RULES).alias("tags"))


def rel_members_sql() -> str:
    """DuckDB: exploded (rel_id, pos, m_type, m_ref) member rows (same order
    as the Spark array construction)."""
    r = "CAST(c_custkey AS BIGINT)"
    return f"""
SELECT {r} AS rel_id, 0 AS pos, 0 AS m_type, {r} * 24 + 1 AS m_ref FROM customer
UNION ALL SELECT {r}, 1, 1, {r} * 3 FROM customer
UNION ALL SELECT {r}, 2, 1, {r} * 3 + 1 FROM customer
UNION ALL SELECT {r}, 3, 2, {r} - 1 FROM customer WHERE {r} % 4 = 1
UNION ALL SELECT {r}, 4, 2, {r} + 2 FROM customer WHERE {r} % 16 = 0
""".strip()
