"""DSIR-style importance weights for targeted data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023 —
public paper) scores every raw-corpus document by how target-like its
hashed n-gram bag is: bucket word n-grams into B hashed buckets, fit two
unigram-over-buckets distributions (target corpus t, raw corpus r,
add-α smoothed), and weight each raw doc by

    log w(d) = Σ_b c_d[b] · λ_b,   λ_b = ln p_t(b) − ln q_r(b)

Docs are then resampled ∝ exp(log w) — the weights are the whole
distributed story, the resample is a driver-free ORDER BY on (weight,
jitter). This engine computes integer-exact weights:

- ONE Arrow pass over the corpus emits per-batch partial bucket-count
  vectors (B rows per batch, never an exploded token shuffle); a
  groupBy(bucket) sums them — shuffle volume is n_batches × B tiny rows.
- The B-row (t_b, r_b) table is a BOUNDED driver collect (B ≈ 512 by
  construction, the same bounded-artifact argument as the qttree group
  table); λ_b is computed once driver-side with glibc ``math.log`` and
  committed to a parquet artifact as a scaled int (λ·2^20, banker's
  rounding) together with the bucket counts it derives from.
- A second Arrow pass computes each raw doc's bucket counts and the
  int64 dot product Σ c_b·λ_int_b — order-free exact integer math, so
  the gate is full-value EQ (the export-soundness pattern: the DuckDB
  oracle re-derives every bucket count from raw text — cross-engine
  polyhash64 — verifies the committed t/r counts bucket-by-bucket, and
  recomputes the dot product from the committed λ_int; the only
  non-SQL step, the B-element glibc log table, is pytest-pinned against
  a scalar reference).

Bounds: |λ| ≤ ln((max_cnt+1)·(R+B)) ≈ 50 ⇒ λ_int ≤ 5e7; a 10^5-gram doc
sums < 5e12 ≪ 2^63 — exact.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels.strhash import polyhash64
from .bloom import _gram_strings

LAMBDA_SCALE = 1 << 20


def _bucket_counts(texts: pd.Series, n: int, n_buckets: int):
    """(row_idx, bucket, count) arrays for a batch; rows with < n words
    contribute nothing. Counts are raw gram counts (DSIR bags, not sets)."""
    row, g = _gram_strings(texts, n)
    if not len(row):
        z = np.zeros(0, np.int64)
        return z, z, z
    b = (polyhash64(list(g)) % np.uint64(n_buckets)).astype(np.int64)
    key = row * n_buckets + b
    uk, cnt = np.unique(key, return_counts=True)
    return uk // n_buckets, uk % n_buckets, cnt.astype(np.int64)


def dsir_bucket_stats(
    docs: DataFrame,
    target_col: str = "is_target",
    n: int = 2,
    n_buckets: int = 512,
    text_col: str = "text",
) -> DataFrame:
    """Per-bucket (t_cnt, r_cnt) gram totals: one mapInPandas pass emitting
    per-batch partial count vectors, then groupBy(bucket) sums. NULL text
    contributes nothing (matches the SQL twin's WHERE text IS NOT NULL)."""

    def partials(batches):
        t_acc = np.zeros(n_buckets, dtype=np.int64)
        r_acc = np.zeros(n_buckets, dtype=np.int64)
        for pdf in batches:
            tgt = pdf[target_col].fillna(False).to_numpy(bool)
            texts = pdf[text_col]
            row, b, c = _bucket_counts(texts.fillna(""), n, n_buckets)
            valid = ~texts.isna().to_numpy()[row] if len(row) else row
            row, b, c = row[valid], b[valid], c[valid]
            is_t = tgt[row]
            np.add.at(t_acc, b[is_t], c[is_t])
            np.add.at(r_acc, b[~is_t], c[~is_t])
        yield pd.DataFrame(
            {
                "bucket": np.arange(n_buckets, dtype=np.int64),
                "t_cnt": t_acc,
                "r_cnt": r_acc,
            }
        )

    return (
        docs.select(text_col, target_col)
        .mapInPandas(partials, "bucket bigint, t_cnt bigint, r_cnt bigint")
        .groupBy("bucket")
        .agg(
            F.sum("t_cnt").alias("t_cnt"),
            F.sum("r_cnt").alias("r_cnt"),
        )
    )


def lambda_table(stats: list, n_buckets: int, alpha: int = 1) -> np.ndarray:
    """λ_int per bucket from collected (bucket, t_cnt, r_cnt) rows — pure
    driver-side function of B integers: glibc math.log, banker's rounding
    to λ·2^20 (pinned against a scalar reference in tests/test_dsir.py)."""
    t = np.zeros(n_buckets, dtype=np.int64)
    r = np.zeros(n_buckets, dtype=np.int64)
    for row in stats:
        t[int(row["bucket"])] = int(row["t_cnt"])
        r[int(row["bucket"])] = int(row["r_cnt"])
    T, R = int(t.sum()), int(r.sum())
    out = np.empty(n_buckets, dtype=np.int64)
    for b in range(n_buckets):
        lam = (
            math.log(int(t[b]) + alpha)
            - math.log(T + alpha * n_buckets)
            - math.log(int(r[b]) + alpha)
            + math.log(R + alpha * n_buckets)
        )
        out[b] = round(lam * LAMBDA_SCALE)
    return out


def dsir_weights(
    docs: DataFrame,
    target_col: str = "is_target",
    n: int = 2,
    n_buckets: int = 512,
    alpha: int = 1,
    lambda_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> DataFrame:
    """Importance weight per RAW (non-target) document:
    (doc_id, n_feats, weight_x) with weight_x = Σ_b c_b·λ_int_b (int64,
    λ_int = λ·2^20). NULL text → NULL columns; < n words → (0, 0).

    Eager at plan construction: the bucket-stats aggregation runs (one
    bounded B-row collect) and, when ``lambda_path`` is set, the λ
    artifact commits there — the export-soundness surface the oracle
    reads. The probe pass itself is shuffle-free over the corpus scan."""
    spark = docs.sparkSession
    stats = dsir_bucket_stats(
        docs, target_col=target_col, n=n, n_buckets=n_buckets, text_col=text_col
    ).collect()
    lam = lambda_table(stats, n_buckets, alpha)
    if lambda_path is not None:
        t = {int(r["bucket"]): int(r["t_cnt"]) for r in stats}
        r_ = {int(r["bucket"]): int(r["r_cnt"]) for r in stats}
        from .. import metrics

        # same tmp+swap discipline as the LSH candidate exports, but the
        # write is DRIVER-side pyarrow: the B rows were just collect()ed
        # to compute λ, so a Spark job here only round-trips them through
        # a Python-RDD scan (measured ~5-8 s of pure overhead per export;
        # the artifact is bounded at B≈512 rows by construction)
        art = pd.DataFrame(
            {
                "bucket": np.arange(n_buckets, dtype=np.int64),
                "t_cnt": np.array([t.get(b, 0) for b in range(n_buckets)], np.int64),
                "r_cnt": np.array([r_.get(b, 0) for b in range(n_buckets)], np.int64),
                "lambda_x": np.asarray(lam[:n_buckets], np.int64),
            }
        )
        metrics.atomic_export_local(art, lambda_path)

    def probe(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            texts = pdf[text_col]
            isnull = texts.isna().to_numpy()
            row, b, c = _bucket_counts(texts.fillna(""), n, n_buckets)
            n_feats = np.zeros(len(ids), dtype=np.int64)
            weight = np.zeros(len(ids), dtype=np.int64)
            if len(row):
                np.add.at(n_feats, row, c)
                np.add.at(weight, row, c * lam[b])
            out = pd.DataFrame(
                {id_col: ids, "n_feats": n_feats, "weight_x": weight}
            )
            if keep_text:
                out.insert(1, text_col, texts)
            if isnull.any():
                for col in ("n_feats", "weight_x"):
                    out[col] = out[col].astype("Int64")
                    out.loc[isnull, col] = pd.NA
            yield out

    raw = docs.filter(~F.coalesce(F.col(target_col), F.lit(False)))
    id_field = docs.schema[id_col].dataType.simpleString()
    # keep_text threads the text column THROUGH the probe so a caller
    # that wants (id, text, weight) — the curation weights stage — pays
    # zero extra scans and NO corpus-sized join-back; the probe already
    # holds the text batch in hand
    text_part = f", {text_col} string" if keep_text else ""
    schema = f"{id_col} {id_field}{text_part}, n_feats bigint, weight_x bigint"
    return raw.select(id_col, text_col).mapInPandas(probe, schema)
