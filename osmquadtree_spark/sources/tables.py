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
