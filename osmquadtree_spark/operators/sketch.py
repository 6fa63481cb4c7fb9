"""Mergeable sketches: Misra-Gries heavy hitters, KMV distinct count,
and a deterministic MRL-style quantile summary.

The 100-TB problem this solves: "top tokens / domains / n-grams by count"
over a corpus whose DISTINCT key set is itself too large to shuffle
comfortably. An exact groupBy ships every distinct key through one hash
exchange; Misra-Gries instead keeps at most ``cap`` counters per input
partition (a map-side-only pass), then merges the ≤ partitions×cap
survivor rows — shuffle volume is bounded by the sketch size, independent
of both corpus size and vocabulary size.

Guarantees (classic MG, and the mergeable-summaries merge rule of
Agarwal et al., PODS'12 — public literature):

- underestimate only: ``est ≤ true`` for every reported token;
- bounded error: ``true − est ≤ err_bound`` where ``err_bound`` is the
  total decrement mass (every trim subtracts the (cap+1)-th largest
  counter value from all counters and drops the non-positive ones);
- no false negatives above the bound: any token with
  ``true > err_bound`` survives to the merged sketch.

When ``cap`` ≥ the number of distinct tokens no trim ever fires,
``err_bound`` is 0 and the sketch IS the exact count table — that regime
is what the DuckDB value-parity oracle pins (the synthetic corpus has a
31-word vocabulary); the lossy regime's bounds are property-tested in
tests/test_sketch.py.

Both stages are vectorized: per-batch pandas ``value_counts`` + aligned
``Series.add`` (no per-row Python), trims are ``nlargest`` + one vector
subtract. The final cross-partition merge is a Spark groupBy over the
survivor rows; the closing top-k window runs over ≤ partitions×cap rows
(sketch-bounded, NOT data-bounded — the single-partition window is safe
by construction and documented at the call site).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    from .docs import balanced

    return balanced(docs).filter(F.col(text_col).isNotNull()).select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    )


def mg_sketch(docs: DataFrame, cap: int, text_col: str = "text") -> DataFrame:
    """Merged Misra-Gries sketch: (token, est_count, err_bound) — one row
    per surviving token, ``err_bound`` identical on every row (the global
    decrement mass, including the final cross-partition trim).

    Plan shape: explode → mapInPandas (one Arrow stage, at most cap+1
    output rows per partition) → groupBy(token) over sketch-bounded rows →
    one trim over the merged table. No full-vocabulary shuffle anywhere.
    """
    if cap < 1:
        raise ValueError(f"mg_sketch cap must be >= 1, got {cap}")

    def gen(batches):
        acc = None  # pandas Series: token -> counter
        dec = 0
        for pdf in batches:
            vc = pdf["token"].value_counts()
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > cap:
                # batched MG trim: subtract the (cap+1)-th largest counter
                # from everything, drop the non-positives. Equivalent to
                # `t` rounds of the textbook decrement-all step.
                t = int(acc.nlargest(cap + 1).iloc[-1])
                acc = acc[acc > t] - t
                dec += t
        if acc is not None and len(acc):
            yield pd.DataFrame(
                {
                    "token": acc.index.astype(str),
                    "cnt": acc.to_numpy("int64"),
                    "dec": 0,
                }
            )
        # decrement carrier row (token NULL): summed across partitions in
        # the merge; emitted even when 0 so an empty partition still
        # contributes a well-formed sketch
        yield pd.DataFrame({"token": [None], "cnt": [0], "dec": [dec]})

    partials = _tokens(docs, text_col).mapInPandas(
        gen, "token string, cnt bigint, dec bigint"
    )
    # mergeable-summaries union: sum counters per token, sum decrements.
    # Input is ≤ partitions×(cap+1) rows — sketch-bounded.
    merged = partials.groupBy("token").agg(
        F.sum("cnt").alias("cnt"), F.sum("dec").alias("dec")
    )
    dec_total = F.sum("dec").over(Window.partitionBy())
    over = merged.select(
        "token", "cnt", dec_total.alias("dec_total")
    ).filter(F.col("token").isNotNull())
    # final trim to cap (the union of per-partition sketches can hold up to
    # partitions×cap tokens): subtract the (cap+1)-th largest merged
    # counter. Window over ≤ partitions×cap rows — sketch-bounded, so the
    # unpartitioned windows here are safe at any corpus size.
    rank = F.row_number().over(
        Window.partitionBy().orderBy(F.col("cnt").desc(), F.col("token").asc())
    )
    ranked = over.select("token", "cnt", "dec_total", rank.alias("rk"))
    trim_t = F.max(
        F.when(F.col("rk") == cap + 1, F.col("cnt")).otherwise(F.lit(0))
    ).over(Window.partitionBy())
    return (
        ranked.select("token", "cnt", "dec_total", trim_t.alias("trim_t"))
        .filter(F.col("cnt") > F.col("trim_t"))
        .select(
            "token",
            (F.col("cnt") - F.col("trim_t")).alias("est_count"),
            (F.col("dec_total") + F.col("trim_t")).alias("err_bound"),
        )
    )


def mg_token_topk(
    docs: DataFrame, cap: int, topk: int, text_col: str = "text"
) -> DataFrame:
    """Top-k tokens from the merged MG sketch: (token, est_count,
    err_bound, rank), rank by (est_count desc, token asc) — the
    deterministic tiebreak every ranked operator in this repo uses."""
    sk = mg_sketch(docs, cap, text_col=text_col)
    rank = F.row_number().over(
        Window.partitionBy().orderBy(F.col("est_count").desc(), F.col("token").asc())
    )
    return (
        sk.select("token", "est_count", "err_bound", rank.cast("bigint").alias("rank"))
        .filter(F.col("rank") <= topk)
    )


KMV_DOMAIN_MAX = (1 << 63) - 1  # h = splitmix64(fp) >> 1 lives in [0, 2^63)


def kmv_distinct(docs: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch over document content
    fingerprints: ONE row (n_sketch, kth_min, est_distinct).

    The 100-TB shape: estimating "how many distinct documents" for dedup
    planning without a global distinct. Each partition keeps only its k
    smallest DISTINCT hash values (numpy unique inside one Arrow stage —
    the hash is splitmix64 over the row-local content fingerprint, so the
    whole sketch input is a pure map over the scan); the merge shuffles
    ≤ partitions×k int64 rows. Estimator (Bar-Yossef et al. / Beyer et
    al., public): with R = kth_min / DOMAIN, D̂ = (k−1)/R — computed as
    the EXACT integer ((k−1)·DOMAIN_MAX) // kth_min (arbitrary-precision
    Python on the one merged row; DuckDB HUGEINT in the oracle — both
    sides bit-identical, which is what makes a sketch value-gateable).
    When fewer than k distinct hashes exist the sketch IS the exact
    distinct count (n_sketch < k ⇒ est_distinct = n_sketch exactly).

    Distinctness is BY FINGERPRINT (docs.fingerprint's rolling hash):
    fp collisions merge documents, the operator's stated spec.
    """
    import numpy as np

    from ..sources.images import splitmix64
    from .docs import balanced, fingerprint

    if k < 2:
        raise ValueError(f"kmv_distinct k must be >= 2, got {k}")
    fps = fingerprint(
        balanced(docs).filter(F.col(text_col).isNotNull())
    ).select("fp")

    def gen(batches):
        cur = np.empty(0, np.int64)
        for pdf in batches:
            u = pdf["fp"].to_numpy("int64").astype(np.uint64)
            h = (splitmix64(u) >> np.uint64(1)).astype(np.int64)
            cur = np.unique(np.concatenate([cur, h]))[:k]
        yield pd.DataFrame({"h": cur})

    mins = fps.mapInPandas(gen, "h bigint")
    # cross-partition dedup + global k smallest: ≤ partitions×k input rows
    sk = mins.dropDuplicates(["h"]).orderBy("h").limit(k)
    agg = sk.agg(
        F.count(F.lit(1)).alias("m"), F.max("h").alias("kth")
    )

    @F.pandas_udf("long")
    def est_udf(kth: pd.Series) -> pd.Series:
        out = []
        for v in kth:
            if pd.isna(v) or int(v) <= 0:
                out.append(0)
            else:
                out.append(((k - 1) * KMV_DOMAIN_MAX) // int(v))
        return pd.Series(out, dtype="int64")

    return agg.select(
        F.col("m").cast("bigint").alias("n_sketch"),
        F.col("kth").alias("kth_min"),
        F.when(F.col("m") < k, F.col("m").cast("bigint"))
        .otherwise(est_udf(F.col("kth")))
        .alias("est_distinct"),
    )


# --------------------------------------------------------------------------
# Quantile summary (deterministic MRL-style weighted sample)
# --------------------------------------------------------------------------
#
# The 100-TB shape: "give me the p1/p50/p99 document length" for
# length-filter cutoffs without a global sort. Each partition sorts its
# OWN values once (the same memory envelope as sortWithinPartitions: one
# int64 column) and collapses them to at most ``k`` weighted rows by rank
# striding — segment j of the rank space [j·m/k, (j+1)·m/k) is represented
# by its midpoint element carrying the segment's weight (the
# Manku–Rajagopalan–Lindsay collapse step, SIGMOD'98 — public literature).
# The merge is a plain union of weighted rows (mergeable summary), so the
# query phase sees ≤ partitions×k rows — sketch-bounded, never data-bounded.
#
# Guarantees (deterministic, no randomness anywhere):
# - a value reported for target rank r has true rank within
#   Σ_p ceil(m_p/k) of r (one collapse per partition, each displacing a
#   rank by at most its segment width ceil(m_p/k));
# - when EVERY partition holds ≤ k values no collapse fires, every sample
#   has weight 1 and the reported quantiles are EXACT rank statistics —
#   the regime the DuckDB value-parity oracle pins at driver scale;
# - `compact_summary` (for recursive merges) adds ≤ ceil(W/k) more
#   displacement per application, W = total weight at that compaction.


def _stride_collapse(vals, wts, k: int):
    """Collapse sorted weighted samples (vals ascending, wts ≥ 1 aligned)
    to ≤ k rows by rank striding. Weights are conserved exactly
    (Σ out = Σ in); each output row is the element covering its segment's
    midpoint rank."""
    import numpy as np

    total = int(wts.sum())
    if len(vals) <= k:
        return vals, wts
    bounds = (np.arange(k + 1, dtype=np.int64) * total) // k
    seg_w = np.diff(bounds)
    mid_rank = (bounds[:-1] + bounds[1:] + 1) // 2  # 1-indexed midpoint
    cum = np.cumsum(wts)
    idx = np.searchsorted(cum, mid_rank, side="left")
    keep = seg_w > 0
    return vals[idx[keep]], seg_w[keep]


def quantile_summary(values: DataFrame, k: int, value_col: str = "val") -> DataFrame:
    """Per-partition quantile summaries: (value bigint, weight bigint),
    ≤ k rows per input partition. One Arrow stage, no shuffle — the
    summary is a pure map over the scan."""
    import numpy as np

    if k < 2:
        raise ValueError(f"quantile_summary k must be >= 2, got {k}")

    def gen(batches):
        chunks = []
        for pdf in batches:
            chunks.append(pdf[value_col].to_numpy("int64"))
        if not chunks:
            return
        vals = np.sort(np.concatenate(chunks))
        out_v, out_w = _stride_collapse(vals, np.ones(len(vals), np.int64), k)
        yield pd.DataFrame({"value": out_v, "weight": out_w})

    return values.select(F.col(value_col).alias(value_col)).mapInPandas(
        gen, "value bigint, weight bigint"
    )


def compact_summary(summary: DataFrame, k: int) -> DataFrame:
    """Re-collapse a (possibly merged) weighted summary to ≤ k rows — the
    recursive-merge step. Input is sketch-bounded by construction, so the
    single-partition pass is safe at any corpus size."""
    import numpy as np

    def gen(batches):
        vs, ws = [], []
        for pdf in batches:
            vs.append(pdf["value"].to_numpy("int64"))
            ws.append(pdf["weight"].to_numpy("int64"))
        if not vs:
            return
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        order = np.argsort(v, kind="stable")
        out_v, out_w = _stride_collapse(v[order], w[order], k)
        yield pd.DataFrame({"value": out_v, "weight": out_w})

    return summary.repartition(1).mapInPandas(gen, "value bigint, weight bigint")


def quantile_values(summary: DataFrame, phis_x1000) -> DataFrame:
    """Query a weighted summary for the given quantiles: (phi_x1000 int,
    q_value bigint), q_value = the summary element covering target rank
    r = max(1, ceil(phi·W/1000)), W = total weight. The unpartitioned
    windows and the broadcast cross join run over ≤ partitions×k summary
    rows — sketch-bounded, documented safe like the MG trim above."""
    spark = summary.sparkSession
    cum_w = Window.orderBy("value", "weight").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = summary.select(
        "value",
        F.sum("weight").over(cum_w).alias("cum"),
        F.sum("weight").over(Window.partitionBy()).alias("w_total"),
    )
    phis = spark.createDataFrame(
        [(int(p),) for p in phis_x1000], "phi_x1000 int"
    )
    target = F.greatest(
        F.expr("(cast(phi_x1000 as bigint) * w_total + 999) div 1000"),
        F.lit(1).cast("bigint"),
    )
    return (
        cum.join(F.broadcast(phis))
        .filter(F.col("cum") >= target)
        .groupBy("phi_x1000")
        .agg(F.min("value").alias("q_value"))
    )


def grouped_quantile_summary(
    values: DataFrame, k: int, key_col: str = "key", value_col: str = "val"
) -> DataFrame:
    """Per-key quantile summaries: (key string, value bigint,
    weight bigint), ≤ k rows per key per input partition. Still ONE
    shuffle-free Arrow stage — each partition sorts its rows by
    (key, value) and stride-collapses every key's run independently;
    the merge stays a plain union. NULL keys are excluded (no group).
    Exact when every (partition, key) run holds ≤ k values."""
    import numpy as np

    if k < 2:
        raise ValueError(f"grouped_quantile_summary k must be >= 2, got {k}")

    def gen(batches):
        kc, vc = [], []
        for pdf in batches:
            kc.append(pdf[key_col].to_numpy(dtype="str"))
            vc.append(pdf[value_col].to_numpy("int64"))
        if not kc:
            return
        keys = np.concatenate(kc)
        vals = np.concatenate(vc)
        order = np.lexsort((vals, keys))
        keys, vals = keys[order], vals[order]
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        out_k, out_v, out_w = [], [], []
        for s, e in zip(starts, ends):
            v, w = _stride_collapse(
                vals[s:e], np.ones(e - s, np.int64), k
            )
            out_k.append(np.full(len(v), keys[s]))
            out_v.append(v)
            out_w.append(w)
        if out_k:
            yield pd.DataFrame(
                {
                    "key": np.concatenate(out_k),
                    "value": np.concatenate(out_v),
                    "weight": np.concatenate(out_w),
                }
            )

    return (
        values.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias(key_col), F.col(value_col).alias(value_col))
        .mapInPandas(gen, "key string, value bigint, weight bigint")
    )


def grouped_quantile_values(summary: DataFrame, phis_x1000) -> DataFrame:
    """Query a grouped summary: (key, phi_x1000, q_value) — the windows
    partition by key, so the rank query parallelizes across keys and each
    key's window spans ≤ partitions×k summary rows."""
    spark = summary.sparkSession
    cum_w = (
        Window.partitionBy("key")
        .orderBy("value", "weight")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = summary.select(
        "key",
        "value",
        F.sum("weight").over(cum_w).alias("cum"),
        F.sum("weight").over(Window.partitionBy("key")).alias("w_total"),
    )
    phis = spark.createDataFrame(
        [(int(p),) for p in phis_x1000], "phi_x1000 int"
    )
    target = F.greatest(
        F.expr("(cast(phi_x1000 as bigint) * w_total + 999) div 1000"),
        F.lit(1).cast("bigint"),
    )
    return (
        cum.join(F.broadcast(phis))
        .filter(F.col("cum") >= target)
        .groupBy("key", "phi_x1000")
        .agg(F.min("value").alias("q_value"))
    )


def doc_length_quantiles(
    docs: DataFrame, phis_x1000, k: int, text_col: str = "text"
) -> DataFrame:
    """Document-length quantiles via the mergeable summary: the
    length-cutoff planning query a training pipeline runs before setting
    min/max length filters. NULL text is excluded (it has no length)."""
    from .docs import balanced

    values = (
        balanced(docs)
        .filter(F.col(text_col).isNotNull())
        .select(F.length(text_col).cast("bigint").alias("val"))
    )
    return quantile_values(quantile_summary(values, k), phis_x1000)
