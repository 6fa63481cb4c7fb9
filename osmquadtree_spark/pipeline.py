"""End-to-end resumable tiling pipeline over the image+caption table.

North-rule lifecycle (the Spark restatement of the reference's
calcqts → sortblocks chain, /root/reference/src/calcqts/calcqts.cpp:189-241 +
src/sorting/sortblocks.cpp:422-501, applied to image rows):

  stage "qts"    footprint + quadtree cell per row (Arrow-vectorized kernel)
  stage "groups" cell histogram → driver-side greedy tile split
  stage "tiles"  group assignment → repartitionByRange → sorted tile table
                 + per-(partition, tile) lineage metrics

Every stage writes to its own directory under ``out_dir`` and commits by
writing a manifest LAST (the sandbox stand-in for an Iceberg snapshot
commit — in production each stage is `writeTo(...).createOrReplace()` on an
Iceberg table and the manifest is the snapshot). A killed job re-run with
the same ``out_dir`` skips every committed stage and continues from the
first uncommitted one, which is the north rule's resume-from-checkpoint
semantics (tested in tests/test_sortblocks.py::test_resume).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.images import with_footprint
from .operators.sortblocks import is_committed, write_tile_sorted
import numpy as np


def _commit(path: str, manifest: dict) -> dict:
    """Atomic manifest commit: write to a temp file and rename into place.
    A kill mid-write must not leave a truncated _manifest.json that
    is_committed() (existence check) treats as a completed stage — the
    resume contract is 'manifest present ⇒ stage output complete'."""
    final = os.path.join(path, "_manifest.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, final)
    return manifest


def _read_manifest(path: str) -> dict:
    with open(os.path.join(path, "_manifest.json")) as f:
        return json.load(f)


def stage_qts(spark: SparkSession, images: DataFrame, path: str) -> dict:
    """Assign footprint + cell id to every image row; checkpoint the full
    row (payload columns ride along so the tile write is a single pass)."""
    if is_committed(path):
        return _read_manifest(path)
    t0 = time.time()
    df = with_footprint(images)
    df.write.mode("overwrite").parquet(os.path.join(path, "data"))
    rows = spark.read.parquet(os.path.join(path, "data")).count()
    return _commit(path, {"rows": int(rows), "elapsed_sec": time.time() - t0})


def stage_groups(
    spark: SparkSession,
    qts_path: str,
    path: str,
    target: int,
    minsize: int,
    tree_level: int = 15,
    rollup: bool = True,
) -> dict:
    """Histogram → driver greedy grouping; checkpoint the group table."""
    if is_committed(path):
        return _read_manifest(path)
    t0 = time.time()
    data = spark.read.parquet(os.path.join(qts_path, "data"))
    # the library grouping op IS the pipeline stage — one code path for
    # histogram → tree → rollup → greedy groups, pinned by the sortblocks
    # tests, instead of a drifting inline copy
    from .operators.sortblocks import compute_groups

    gqt, gidx, gweight = compute_groups(
        data, "qt", target=target, minsize=minsize,
        tree_level=tree_level, rollup=rollup,
    )
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    pd.DataFrame({"group_qt": gqt, "group_idx": gidx, "weight": gweight}).to_parquet(
        os.path.join(path, "groups.parquet")
    )
    return _commit(
        path,
        {
            "groups": int(len(gqt)),
            "target": target,
            "minsize": minsize,
            "tree_level": tree_level,
            "rollup": rollup,
            "elapsed_sec": time.time() - t0,
        },
    )


def stage_tiles(
    spark: SparkSession,
    qts_path: str,
    groups_path: str,
    path: str,
    sort_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> dict:
    """Group assignment + tile-sorted layout + per-(partition, tile) lineage."""
    if is_committed(path):
        return _read_manifest(path)
    import pandas as pd

    data = spark.read.parquet(os.path.join(qts_path, "data"))
    gqt = (
        pd.read_parquet(os.path.join(groups_path, "groups.parquet"))["group_qt"]
        .to_numpy("int64")
    )
    return write_tile_sorted(
        data,
        path,
        np.asarray(gqt),
        sort_cols=sort_cols or ["image_id"],
        num_partitions=num_partitions,
    )


def run_image_tiling(
    spark: SparkSession,
    images: DataFrame | None,
    out_dir: str,
    target: int = 40000,
    minsize: int = 20000,
    tree_level: int = 15,
    rollup: bool = True,
    num_partitions: int | None = None,
    stop_after: str | None = None,
) -> dict:
    """Run (or resume) the full pipeline. ``images`` may be None on resume —
    it is only read if stage "qts" is uncommitted. ``stop_after`` simulates a
    kill between stage commits (for resume tests)."""
    t0 = time.time()
    qts_p = os.path.join(out_dir, "qts")
    grp_p = os.path.join(out_dir, "groups")
    til_p = os.path.join(out_dir, "tiles")

    manifests: dict[str, dict] = {}
    if images is None and not is_committed(qts_p):
        raise ValueError("stage 'qts' not committed and no input provided")
    manifests["qts"] = stage_qts(spark, images, qts_p)
    if stop_after == "qts":
        return manifests
    manifests["groups"] = stage_groups(
        spark, qts_p, grp_p, target, minsize, tree_level, rollup
    )
    if stop_after == "groups":
        return manifests
    manifests["tiles"] = stage_tiles(
        spark, qts_p, grp_p, til_p, num_partitions=num_partitions
    )
    total = time.time() - t0
    manifests["total"] = {
        "rows": manifests["tiles"]["rows"],
        "tiles": manifests["tiles"]["tiles"],
        "elapsed_sec": total,
        "rows_per_sec": manifests["tiles"]["rows"] / total if total else None,
    }
    return manifests
