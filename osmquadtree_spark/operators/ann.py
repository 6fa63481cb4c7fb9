"""Similarity search over embedding columns.

Brute-force cosine top-k is the exactness baseline (and the DuckDB-checkable
query); the LSH-bucketed variant is the 10^12-scale path: random-hyperplane
signatures bucket the vectors, candidates come from an equi-join on bucket
id, and exact re-scoring keeps only true neighbors. All vector math is
JVM-side higher-order functions over array<double> — no Python in the path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    # products and left-to-right accumulation all in float64 → deterministic
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("_v", v).withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries, JVM dot products, window top-k.
    Returns (query_id, vec_id, rank); ties broken by vec_id ascending."""
    v = with_norm(vectors, vec_col).select(id_col, "_v", "_norm")
    q = with_norm(queries, vec_col).select(
        F.col(qid_col), F.col("_v").alias("_q"), F.col("_norm").alias("_qnorm")
    )
    joined = v.crossJoin(F.broadcast(q)).withColumn(
        "sim", _dot(F.col("_v"), F.col("_q")) / (F.col("_norm") * F.col("_qnorm"))
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "rank")
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH candidate generation + exact re-score.

    Scale shape: signatures are computed once per side (a projection against
    a broadcast plane matrix), candidates come from an equi-join on
    (table, bucket) — at 10^12 vectors this is the only viable join; recall
    is tunable via n_planes/n_tables and verified against cosine_topk in
    tests. Results are exact *within the candidate set*.
    """
    rng = np.random.default_rng(seed)
    first = vectors.select(vec_col).first()
    d = dim or len(first[0])
    planes = rng.standard_normal((n_tables, n_planes, d))

    def bucket_cols(df):
        v = _as_double(F.col(vec_col))
        out = df.withColumn("_v", v)
        rows = []
        for t in range(n_tables):
            bits = []
            for p in range(n_planes):
                coeff = F.array(*[F.lit(float(c)) for c in planes[t, p]])
                bits.append(
                    F.when(_dot(F.col("_v"), coeff) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
                )
            rows.append(
                F.struct(F.lit(t).alias("tbl"), sum(bits[1:], bits[0]).cast("bigint").alias("bucket"))
            )
        return out.withColumn("_b", F.explode(F.array(*rows))).select(
            "*", F.col("_b.tbl").alias("tbl"), F.col("_b.bucket").alias("bucket")
        ).drop("_b")

    v = bucket_cols(with_norm(vectors, vec_col).select(id_col, vec_col, "_norm"))
    q = bucket_cols(with_norm(queries, vec_col).select(qid_col, vec_col, "_norm")).select(
        qid_col,
        F.col("_v").alias("_q"),
        F.col("_norm").alias("_qnorm"),
        "tbl",
        "bucket",
    )
    cand = (
        v.join(F.broadcast(q), ["tbl", "bucket"])
        .select(id_col, qid_col, "_v", "_norm", "_q", "_qnorm")
        .dropDuplicates([id_col, qid_col])
    )
    scored = cand.withColumn(
        "sim", _dot(F.col("_v"), F.col("_q")) / (F.col("_norm") * F.col("_qnorm"))
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "rank")
    )
