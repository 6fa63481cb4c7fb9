"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (quadtree assignment +
reference-default tile grouping) on sf0.001; ``queries()`` /``oracle_sql()``
expose every implemented operator with its DuckDB twin — see
osmquadtree_spark/queries.py for the registry and the oracle-parity rules.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osmquadtree_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: assign quadtree cells to georeferenced elements, split tiles
    with the reference-default grouping, return per-tile counts."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    df = Q.q_group_assign_fine(spark, sf_dir)
    return df.groupBy("group_qt").agg(F.count(F.lit(1)).alias("n_rows"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.spark_queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
