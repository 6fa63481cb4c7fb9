"""End-to-end resumable CURATION pipeline over the documents table —
the text-side twin of the tiling pipeline (pipeline.py): the same
manifest-last stage-commit shape (Iceberg-snapshot stand-in), the same
resume-from-first-uncommitted-stage semantics, chaining the curation
operators a training-data pipeline actually runs:

  stage "quality"  Gopher-style keep/drop with reason bitmask
                   (operators/docs.quality_gate)
  stage "dedup"    MinHash-LSH near-dup pairs → connected components →
                   canonical representative per cluster
                   (operators/dedup.minhash_lsh_pairs +
                    operators/components.connected_components)
  stage "decon"    Bloom-filter benchmark decontamination over the
                   surviving canonicals (operators/bloom — the
                   shuffle-free probe path)
  stage "weights"  DSIR importance weights vs the benchmark target
                   (operators/dsir, λ artifact committed inside)
  stage "shards"   fixed-token-budget shard packing + per-shard
                   manifest (operators/docs.token_shards /
                    shard_manifest — the resume/lineage table)

Every stage writes its own directory under ``out_dir`` and commits by
writing ``_manifest.json`` LAST; a killed run re-invoked with the same
``out_dir`` skips committed stages and reads each stage's INPUT from the
previous stage's committed parquet — no recomputation of upstream
lineage on resume. NULL-text documents are counted into a
``manual_queue`` bucket at the quality stage (quality_gate returns NULL
keep for them — they need inspection, not a silent drop) and excluded
from every downstream stage.

Scale shape: every stage is the library operator (each individually
plan-gated and value-gated in the sweep registry); the pipeline adds
only parquet checkpoints between them. The quality reason histogram and
shard manifest are the two driver-visible summaries, both bounded (≤ 16
reason combos; |shards| rows).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .pipeline import _commit, _read_manifest
from .operators.sortblocks import is_committed

BENCH_MOD_DEFAULT = 41  # every 41st doc is the synthetic benchmark set


def _write(df: DataFrame, path: str) -> int:
    data = os.path.join(path, "data")
    df.write.mode("overwrite").parquet(data)
    return int(df.sparkSession.read.parquet(data).count())


def _data(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "data"))


def stage_quality(
    spark, docs: DataFrame, path: str, quality_params: dict | None = None
) -> dict:
    """quality_gate over the full corpus; keeps the input columns beside
    (reasons, keep) so downstream stages read one table.
    ``quality_params`` forwards threshold kwargs to quality_gate — the
    drop-rate tuning surface the reason histogram in this stage's
    manifest exists to inform."""
    if is_committed(path):
        return _read_manifest(path)
    t0 = time.time()
    from .operators.docs import quality_gate

    qg = quality_gate(docs, **(quality_params or {})).select(
        "doc_id", "reasons", "keep"
    )
    joined = docs.join(qg, "doc_id")
    rows = _write(joined, path)
    out = _data(spark, path)
    hist = {
        str(r["reasons"]): int(r["c"])
        for r in out.groupBy("reasons").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    kept = int(out.filter(F.col("keep") == True).count())  # noqa: E712
    manual = int(out.filter(F.col("keep").isNull()).count())
    return _commit(
        path,
        {
            "rows": rows,
            "kept": kept,
            "dropped": rows - kept - manual,
            "manual_queue": manual,
            "reason_histogram": hist,
            "elapsed_sec": time.time() - t0,
        },
    )


def stage_dedup(
    spark, quality_path: str, path: str, metrics_path: str | None = None
) -> dict:
    """Near-dup clusters over the quality survivors; output = survivors
    with (component_id, is_canonical). Non-clustered docs are their own
    canonical. ``metrics_path`` commits the hot-bucket drop counts and
    component-convergence rounds alongside (the production observability
    surface — silent caps are how recall loss hides)."""
    if is_committed(path):
        return _read_manifest(path)
    t0 = time.time()
    from .operators.components import connected_components
    from .operators.dedup import minhash_lsh_pairs

    docs = _data(spark, quality_path).filter(F.col("keep") == True)  # noqa: E712
    pairs = minhash_lsh_pairs(
        docs.select("doc_id", "text"), metrics_path=metrics_path
    ).select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"))
    comp = connected_components(
        pairs, metrics_path=metrics_path, operator="curation_components"
    ).select(F.col("node").alias("doc_id"), "component_id")
    out = (
        docs.join(comp, "doc_id", "left")
        .withColumn(
            "component_id", F.coalesce(F.col("component_id"), F.col("doc_id"))
        )
        .withColumn("is_canonical", F.col("component_id") == F.col("doc_id"))
    )
    rows = _write(out, path)
    final = _data(spark, path)
    canon = int(final.filter("is_canonical").count())
    return _commit(
        path,
        {
            "rows": rows,
            "canonical": canon,
            "near_dup_dropped": rows - canon,
            "elapsed_sec": time.time() - t0,
        },
    )


def stage_decon(
    spark, dedup_path: str, path: str, bench: DataFrame, min_hits: int = 2,
    m_bits: int = 1 << 20, k: int = 4, n: int = 3,
) -> dict:
    """Bloom probe of the canonical survivors against the benchmark set;
    output keeps only clean docs, manifest records the flagged count and
    the filter's fill factor (the false-positive-rate driver)."""
    if is_committed(path):
        return _read_manifest(path)
    t0 = time.time()
    from .operators import bloom as bl

    bf = bl.collect_bloom(bl.bloom_build(bench, n=n, m_bits=m_bits, k=k))
    docs = _data(spark, dedup_path).filter("is_canonical")
    probed = bl.bloom_probe(
        docs.select("doc_id", "text"), bf, min_hits=min_hits
    )
    flagged = probed.filter("contaminated").select("doc_id")
    out = docs.join(flagged, "doc_id", "left_anti")
    rows = _write(out, path)
    import numpy as np

    set_bits = int(np.unpackbits(bf.bitmap).sum())
    probed_rows = int(probed.count())
    return _commit(
        path,
        {
            "rows": rows,
            "probed": probed_rows,
            "flagged": probed_rows - rows,
            "bloom_fill_x10000": set_bits * 10000 // bf.m_bits,
            "elapsed_sec": time.time() - t0,
        },
    )


def stage_weights(
    spark, decon_path: str, path: str, bench: DataFrame,
    n_buckets: int = 512,
) -> dict:
    """DSIR weights of the clean survivors vs the benchmark target; the
    λ artifact commits under this stage's directory (atomic tmp+swap)."""
    if is_committed(path):
        return _read_manifest(path)
    t0 = time.time()
    from .operators.dsir import dsir_weights

    docs = _data(spark, decon_path).select("doc_id", "text")
    both = docs.withColumn("is_target", F.lit(False)).unionByName(
        bench.select("doc_id", "text").withColumn("is_target", F.lit(True))
    )
    w = dsir_weights(
        both, n_buckets=n_buckets,
        lambda_path=os.path.join(path, "lambda"),
    )
    out = docs.join(w, "doc_id")
    rows = _write(out, path)
    return _commit(
        path,
        {"rows": rows, "n_buckets": n_buckets, "elapsed_sec": time.time() - t0},
    )


def stage_shards(spark, weights_path: str, path: str, shard_tokens: int) -> dict:
    """Token-budget shard packing of the final corpus + the per-shard
    lineage manifest a resuming shard writer restarts from."""
    if is_committed(path):
        return _read_manifest(path)
    t0 = time.time()
    from .operators.docs import shard_manifest, token_shards

    docs = _data(spark, weights_path).select("doc_id", "text")
    shards = token_shards(docs, shard_tokens)
    shards.write.mode("overwrite").parquet(os.path.join(path, "data"))
    man = shard_manifest(docs, shard_tokens)
    man.write.mode("overwrite").parquet(os.path.join(path, "manifest"))
    man_r = spark.read.parquet(os.path.join(path, "manifest"))
    n_shards = int(man_r.count())
    tok = man_r.agg(F.sum("n_tokens").alias("t"), F.sum("n_docs").alias("d")).collect()[0]
    return _commit(
        path,
        {
            "shards": n_shards,
            "docs": int(tok["d"] or 0),
            "tokens": int(tok["t"] or 0),
            "shard_tokens": shard_tokens,
            "elapsed_sec": time.time() - t0,
        },
    )


def run_curation(
    spark: SparkSession,
    docs: DataFrame | None,
    out_dir: str,
    bench: DataFrame | None = None,
    bench_mod: int = BENCH_MOD_DEFAULT,
    shard_tokens: int = 4096,
    quality_params: dict | None = None,
    stop_after: str | None = None,
) -> dict:
    """Run (or resume) the curation chain. ``docs`` may be None on resume
    when stage "quality" is already committed. ``bench`` defaults to the
    every-``bench_mod``-th synthetic benchmark slice of ``docs`` (the
    sweep-registry convention); pass a real eval-set DataFrame in
    production. ``stop_after`` simulates a kill between stage commits."""
    t0 = time.time()
    q_p = os.path.join(out_dir, "quality")
    d_p = os.path.join(out_dir, "dedup")
    c_p = os.path.join(out_dir, "decon")
    w_p = os.path.join(out_dir, "weights")
    s_p = os.path.join(out_dir, "shards")

    if docs is None and not is_committed(q_p):
        raise ValueError("stage 'quality' not committed and no input provided")
    if bench is None:
        src = docs if docs is not None else _data(spark, q_p)
        bench = src.filter(F.col("doc_id") % bench_mod == 0).select(
            "doc_id", "text"
        )

    manifests: dict[str, dict] = {}
    manifests["quality"] = stage_quality(spark, docs, q_p, quality_params)
    if stop_after == "quality":
        return manifests
    manifests["dedup"] = stage_dedup(
        spark, q_p, d_p, metrics_path=os.path.join(out_dir, "metrics")
    )
    if stop_after == "dedup":
        return manifests
    manifests["decon"] = stage_decon(spark, d_p, c_p, bench)
    if stop_after == "decon":
        return manifests
    manifests["weights"] = stage_weights(spark, c_p, w_p, bench)
    if stop_after == "weights":
        return manifests
    manifests["shards"] = stage_shards(spark, w_p, s_p, shard_tokens)
    total = time.time() - t0
    manifests["total"] = {
        "input_rows": manifests["quality"]["rows"],
        "final_docs": manifests["shards"]["docs"],
        "shards": manifests["shards"]["shards"],
        "elapsed_sec": total,
    }
    return manifests
