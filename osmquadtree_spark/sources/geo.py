"""Deterministic georeferencing of tabular rows → spatial "elements".

The engine's input at scale is an Iceberg table of image+caption rows whose
footprint is a pure function of the row (FIXTURES.md §1: phash → fixed-point
lon/lat; point footprints follow the reference's *node* path, bbox footprints
the *way* path). For the driver's DuckDB cross-check we derive the same shape
of table from the provided `lineitem` parquet with **overflow-free integer
arithmetic only**, so the Spark plan (all JVM-side built-in expressions, no
UDF) and the ANSI-SQL oracle compute bit-identical coordinates.

Hash: two Lehmer LCG draws (modulus 2^31-1) combined into a 62-bit value —
every intermediate fits int64 without wraparound, which the two engines would
otherwise treat differently (Spark wraps silently, DuckDB raises).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

M31 = 2147483647  # 2^31 - 1
LON_SPAN = 3_600_000_000  # [-180°, 180°) at 1e-7 fixed point
LAT_SPAN = 1_700_000_000  # [-85°, 85°)  (mercator-safe band)
LON_MAX = 1_799_999_999
LAT_MAX = 849_999_999


def _inner_sql(intdiv: str) -> str:
    k = "(l_orderkey * 8 + l_linenumber)"
    x1 = f"(({k} * 48271) % {M31})"
    x2 = f"((({k} + 1234567) * 16807) % {M31})"
    v = f"({x1} * {M31} + {x2})"
    return f"""
  SELECT {k} AS elem_id,
         ({v} % {LON_SPAN}) - {LON_SPAN // 2} AS minx,
         (({v} {intdiv} {LON_SPAN}) % {LAT_SPAN}) - {LAT_SPAN // 2} AS miny,
         ({k} % 2 = 1) AS is_box,
         (({k} % 128) + 1) * 10000 AS dlon,
         (({k} % 96) + 1) * 10000 AS dlat
  FROM lineitem
""".rstrip()


def elements_sql(intdiv: str = "//") -> str:
    """SQL producing (elem_id, minx, miny, maxx, maxy, is_box) from lineitem.

    ``intdiv`` is ``//`` for DuckDB, ``DIV`` for Spark SQL — the only dialect
    difference; all arithmetic is exact int64.
    """
    return f"""
SELECT elem_id, minx, miny,
       CASE WHEN is_box THEN LEAST(minx + dlon, {LON_MAX}) ELSE minx END AS maxx,
       CASE WHEN is_box THEN LEAST(miny + dlat, {LAT_MAX}) ELSE miny END AS maxy,
       is_box
FROM (
{_inner_sql(intdiv)}
)
""".strip()


def geo_elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → spatial elements DataFrame (JVM-side expressions only).

    Even keys get a point footprint (node path), odd keys a bbox footprint
    (way path) with span scaled like image w/h (FIXTURES.md §1).
    """
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber"
    ).createOrReplaceTempView("lineitem")
    return spark.sql(elements_sql(intdiv="DIV"))
