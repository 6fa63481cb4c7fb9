"""Tile-sorted layout + resumable pipeline tests (north rule: lineage
metrics per (partition, tile); killed job resumes from the last committed
stage with identical output)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from osmquadtree_spark.pipeline import run_image_tiling
from osmquadtree_spark.sources.images import images_df

N_IMAGES = 600
TARGET, MINSIZE = 60, 30


def _run(spark, tmp, **kw):
    imgs = images_df(spark, N_IMAGES, partitions=8)
    return run_image_tiling(
        spark, imgs, tmp, target=TARGET, minsize=MINSIZE, rollup=True, **kw
    )


def _tiles(spark, tmp):
    return (
        spark.read.parquet(os.path.join(tmp, "tiles", "data"))
        .select("image_id", "qt", "group_qt")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )


def test_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "full")
    m = _run(spark, out)
    assert m["tiles"]["rows"] == N_IMAGES
    assert m["tiles"]["tiles"] >= 2  # actually split into multiple tiles
    df = _tiles(spark, out)
    # every row's cell is inside its group tile's subtree (find_tile contract)
    groups = pd.read_parquet(os.path.join(out, "groups", "groups.parquet"))
    gset = set(groups["group_qt"].astype(np.int64))
    assert set(df["group_qt"].astype(np.int64)) <= gset


def test_lineage_metrics_cover_all_rows(spark, tmp_path):
    out = str(tmp_path / "lineage")
    _run(spark, out)
    metrics = spark.read.parquet(os.path.join(out, "tiles", "_metrics")).toPandas()
    data = spark.read.parquet(os.path.join(out, "tiles", "data")).toPandas()
    assert metrics["row_count"].sum() == N_IMAGES
    # lineage rows agree with the data per (partition, tile)
    chk = (
        data.groupby(["_part_id", "group_qt"])["qt"]
        .agg(["count", "min", "max"])
        .reset_index()
    )
    merged = metrics.merge(chk, on=["_part_id", "group_qt"])
    assert len(merged) == len(metrics) == len(chk)
    assert (merged["row_count"] == merged["count"]).all()
    assert (merged["min_cell"] == merged["min"]).all()
    assert (merged["max_cell"] == merged["max"]).all()


def test_rows_sorted_within_partitions(spark, tmp_path):
    out = str(tmp_path / "sorted")
    _run(spark, out)
    data = spark.read.parquet(os.path.join(out, "tiles", "data")).toPandas()
    for _, part in data.groupby("_part_id"):
        keys = list(zip(part["group_qt"], part["image_id"]))
        assert keys == sorted(keys)


def test_resume(spark, tmp_path):
    out_kill = str(tmp_path / "killed")
    out_full = str(tmp_path / "fresh")

    # "killed" job: commits only stage qts, then dies
    m1 = _run(spark, out_kill, stop_after="qts")
    assert set(m1) == {"qts"}
    assert not os.path.exists(os.path.join(out_kill, "tiles", "_manifest.json"))
    qts_manifest = os.path.join(out_kill, "qts", "_manifest.json")
    mtime_before = os.path.getmtime(qts_manifest)

    # resume WITHOUT the input — must restart from the committed checkpoint
    m2 = run_image_tiling(
        spark, None, out_kill, target=TARGET, minsize=MINSIZE, rollup=True
    )
    assert os.path.getmtime(qts_manifest) == mtime_before  # stage not recomputed
    assert m2["tiles"]["rows"] == N_IMAGES

    # resumed output is identical to an uninterrupted run
    _run(spark, out_full)
    a, b = _tiles(spark, out_kill), _tiles(spark, out_full)
    pd.testing.assert_frame_equal(a, b)


def test_resume_without_checkpoint_fails(spark, tmp_path):
    with pytest.raises(ValueError):
        run_image_tiling(spark, None, str(tmp_path / "missing"))


def test_compute_groups_scalable_matches_dense(spark):
    """The output-bounded rollup grouping (Spark-side survivor aggregate)
    must produce the identical group table as the dense-histogram path with
    rollup=True — on skewed element cells at several split sizes."""
    from osmquadtree_spark.kernels import quadtree as qtk
    from osmquadtree_spark.operators.sortblocks import (
        compute_groups,
        compute_groups_scalable,
    )

    rng = np.random.default_rng(909)
    n = 50000
    lon = rng.integers(-1800000000, 1800000000, n)
    lat = rng.integers(-850000000, 850000000, n)
    k = n // 3
    lon[:k] = rng.integers(-1000000, 1000000, k)
    lat[:k] = rng.integers(514000000, 516000000, k)
    qts = qtk.calculate(lon, lat, lon, lat, 0.05, 17)
    df = spark.createDataFrame(pd.DataFrame({"qt": qts}))
    for target, minsize in ((1000, 500), (100, 50)):
        dense = compute_groups(df, "qt", target, minsize, 15, rollup=True)
        scal = compute_groups_scalable(df, "qt", target, minsize, 15)
        for a, b in zip(dense, scal):
            assert np.array_equal(a, b)
