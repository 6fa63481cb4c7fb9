"""Physical-plan hygiene tests — the engine's declarative-first claims
(SURVEY §4) must be visible in the plans Catalyst actually produces:
filters and projections reach the parquet scan, small dimension joins
broadcast, the tile layout is a range partition + in-partition sort, and
the assignment kernel stays a single projected Arrow eval (no join)."""

import numpy as np
from pyspark.sql import functions as F

from osmquadtree_spark import queries as Q


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df, spark) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_and_projection_pushdown(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey", "l_quantity")
    plan = _formatted(q, spark)
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached the scan
    # column pruning: the scan schema carries only the needed columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_extendedprice" not in read_schema
    assert "l_orderkey" in read_schema


def test_bbox_extract_scan_is_pruned(spark, sf_dir):
    plan = _formatted(Q.q_bbox_extract(spark, sf_dir), spark)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    # the derived-element query needs only the key/coordinate source columns
    assert "l_comment" not in read_schema


def test_top_customers_broadcasts_dimension(spark, sf_dir):
    plan = _plan(Q.q_top_customers(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # customer is the broadcast side


def test_knn_broadcasts_queries(spark, sf_dir):
    plan = _plan(Q.q_knn_points(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_tile_layout_is_range_partition_plus_sort(spark, sf_dir):
    from osmquadtree_spark.operators.sortblocks import tile_sorted

    df = Q._elements_qt(spark, sf_dir)
    gqt = np.asarray([0], dtype=np.int64)
    out = tile_sorted(df, gqt, "qt", sort_cols=["elem_id"], num_partitions=8)
    plan = _plan(out)
    assert "rangepartitioning(group_qt" in plan.lower()
    # in-partition sort only (Sort [...], false = local), above the exchange
    assert "Sort [group_qt" in plan and "], false, 0" in plan
    # qt kernel + group assignment fuse into ONE ArrowEvalPython stage
    assert plan.count("ArrowEvalPython") == 1


def test_qt_assign_is_single_arrow_projection(spark, sf_dir):
    plan = _plan(Q.q_qt_assign(spark, sf_dir))
    assert plan.count("ArrowEvalPython") == 1  # one vectorized kernel stage
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_whole_stage_codegen_covers_relational_query(spark, sf_dir):
    df = Q.q_tpch_q1(spark, sf_dir)
    df.collect()  # AQE only finalizes (and shows codegen stages) on execution
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    assert "*(" in plan  # the codegen-stage marker in compact plan strings
