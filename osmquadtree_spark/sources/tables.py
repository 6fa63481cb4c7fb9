"""Parquet table loaders for the driver-provided testdata.

In production these reads are Iceberg catalog scans (the engine's tile-sorted
output is an Iceberg table partitioned by group cell id, with manifests
standing in for the reference's in-file (qt, pos, len) block index,
/root/reference/src/pbfformat/writepbffile.cpp:151-199). The sandbox has no
Iceberg runtime jars, so scans are plain parquet — the partition-pruning and
sorted-write shapes are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Guard against under-parallel scans feeding compute-heavy stages: a
    small table that arrives in fewer splits than the session's
    parallelism (one local parquet file = one partition) serializes every
    downstream Arrow-kernel stage onto a handful of tasks — at bench
    scale the MinHash signature pass ran 4× slower single-task. Round-robin
    repartition up ONLY in that case; at production scale a multi-TB scan
    already has thousands of splits and this is a no-op (no shuffle
    added). Catalyst still pushes filters below the exchange, so scan
    pruning is unaffected."""
    if df.isStreaming:
        # no stable partition count to inspect (.rdd throws on streaming
        # frames); micro-batch parallelism is the source's maxFilesPerTrigger
        # / partition config, not a scan-split accident
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
