"""Session cache registry + stage-checkpoint policy (r3 verdict #8/#9):
the reliable-checkpoint escape hatch engages when a checkpoint dir is
configured, and release_all actually unpersists everything the operators
registered during a sweep."""

import os

import pytest
from pyspark.sql import functions as F

from osmquadtree_spark import queries as Q
from osmquadtree_spark.cache import cached, release_all, stage_checkpoint


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_stage_checkpoint_reliable_when_dir_set(spark, monkeypatch):
    """With SPARK_GRAFT_CHECKPOINT_DIR set, stage checkpoints become
    RELIABLE checkpoints (files under the dir — survive executor loss on a
    cluster); without it, the default localCheckpoint path still works.
    setCheckpointDir is sticky on the session, so the dir must outlive
    this test (mkdtemp, not tmp_path — later tests' stage checkpoints
    legitimately keep using it)."""
    import tempfile

    ckdir = tempfile.mkdtemp(prefix="oqt_ck_")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    df = stage_checkpoint(spark.range(100).withColumn("x", F.col("id") * 2))
    assert df.count() == 100
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(ckdir)
        for f in fs
    ]
    assert files, "reliable checkpoint wrote no files"

    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR")
    # NOTE: setCheckpointDir is sticky on the session, so the fallback
    # branch still reliable-checkpoints here — matching the documented
    # "pre-configure setCheckpointDir" contract
    df2 = stage_checkpoint(spark.range(10))
    assert df2.count() == 10


@pytest.mark.usefixtures("spark")
def test_release_all_unpersists_operator_caches(spark, sf_dir):
    """After a sweep, clear_session_caches must leave NO operator-persisted
    blocks behind (r2's leak, fixed by the registry in r3; this pins it).
    Measured relative to the session baseline because localCheckpoint
    blocks from other tests legitimately persist."""
    release_all()
    base = _n_persistent(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from osmquadtree_spark.operators.dedup import minhash_lsh_pairs

    minhash_lsh_pairs(docs, n=3, min_matches=8).collect()
    assert _n_persistent(spark) > base  # sigs/bands/hot registered + materialized
    Q.clear_session_caches()
    assert _n_persistent(spark) <= base


def test_cached_registers_and_releases(spark):
    release_all()
    base = _n_persistent(spark)
    df = cached(spark.range(1000))
    df.count()
    assert _n_persistent(spark) == base + 1
    release_all()
    assert _n_persistent(spark) == base
