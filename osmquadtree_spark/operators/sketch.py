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
# length-filter cutoffs without a global sort. Each partition buffers at
# most ``chunk`` raw values (8·chunk transient bytes in the Python worker
# — bounded state like the MG/KMV gens above, NOT the whole partition),
# sorts each full buffer once and collapses it to at most ``k`` weighted
# rows by rank striding — segment j of the rank space
# [j·m/k, (j+1)·m/k) is represented by its midpoint element carrying the
# segment's weight (the Manku–Rajagopalan–Lindsay collapse step,
# SIGMOD'98 — public literature). Chunks are emitted independently, so
# the merge stays a plain union of weighted rows (mergeable summary) and
# the query phase sees ≤ Σ_p k·ceil(m_p/chunk) rows — bounded by
# N·k/chunk, never by N itself (compact_summary shrinks it further when
# a recursive merge wants a fixed-size summary).
#
# Guarantees (deterministic, no randomness anywhere):
# - a value reported for target rank r has true rank within
#   Σ_c ceil(m_c/k) ≤ N/k + #chunks of r — stride displacement is
#   additive across DISJOINT chunks exactly as across partitions, so
#   chunking changes the memory envelope, not the bound;
# - when EVERY partition holds ≤ k values no collapse fires, every sample
#   has weight 1 and the reported quantiles are EXACT rank statistics —
#   the regime the DuckDB value-parity oracle pins at driver scale;
# - `compact_summary` (for recursive merges) adds ≤ ceil(W/k) more
#   displacement per application, W = total weight at that compaction;
# - NULL values carry no rank and are excluded (filtered before the
#   Arrow stage, like every sketch input in this module).


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


QUANTILE_CHUNK = 1 << 22  # 4M values ≈ 32 MB buffered per worker


def quantile_summary(
    values: DataFrame, k: int, value_col: str = "val", chunk: int = QUANTILE_CHUNK
) -> DataFrame:
    """Per-partition quantile summaries: (value bigint, weight bigint),
    ≤ k·ceil(m_p/chunk) rows per input partition. One Arrow stage, no
    shuffle — the summary is a pure map over the scan with O(chunk)
    worker memory. NULL values are excluded (no rank)."""
    import numpy as np

    if k < 2:
        raise ValueError(f"quantile_summary k must be >= 2, got {k}")
    if chunk < k:
        raise ValueError(f"chunk ({chunk}) must be >= k ({k})")

    def gen(batches):
        buf, size = [], 0

        def flush():
            nonlocal buf, size
            vals = np.sort(np.concatenate(buf) if len(buf) > 1 else buf[0])
            buf, size = [], 0
            out_v, out_w = _stride_collapse(
                vals, np.ones(len(vals), np.int64), k
            )
            return pd.DataFrame({"value": out_v, "weight": out_w})

        for pdf in batches:
            a = pdf[value_col].to_numpy("int64")
            if len(a):
                buf.append(a)
                size += len(a)
            if size >= chunk:
                yield flush()
        if size:
            yield flush()

    return (
        values.filter(F.col(value_col).isNotNull())
        .select(value_col)
        .mapInPandas(gen, "value bigint, weight bigint")
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


def _rank_query(summary: DataFrame, phis_x1000, key_cols=()) -> DataFrame:
    """THE rank-query definition, shared by the grouped and ungrouped
    variants so the ceil-rank convention r = max(1, ceil(phi·W/1000))
    exists exactly once: cumulative-weight windows (partitioned by
    ``key_cols``, summary-bounded), broadcast phi probe, min value with
    cum ≥ r."""
    spark = summary.sparkSession
    keys = list(key_cols)
    cum_w = (
        Window.partitionBy(*keys)
        .orderBy("value", "weight")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = summary.select(
        *keys,
        "value",
        F.sum("weight").over(cum_w).alias("cum"),
        F.sum("weight").over(Window.partitionBy(*keys)).alias("w_total"),
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
        .groupBy(*keys, "phi_x1000")
        .agg(F.min("value").alias("q_value"))
    )


def quantile_values(summary: DataFrame, phis_x1000) -> DataFrame:
    """Query a weighted summary for the given quantiles: (phi_x1000 int,
    q_value bigint), q_value = the summary element covering target rank
    r = max(1, ceil(phi·W/1000)), W = total weight. The unpartitioned
    windows and the broadcast cross join run over summary rows only —
    sketch-bounded, documented safe like the MG trim above."""
    return _rank_query(summary, phis_x1000)


def grouped_quantile_summary(
    values: DataFrame,
    k: int,
    key_col: str = "key",
    value_col: str = "val",
    chunk: int = QUANTILE_CHUNK,
) -> DataFrame:
    """Per-key quantile summaries: (key string, value bigint,
    weight bigint). Still ONE shuffle-free Arrow stage with O(chunk)
    worker memory — each full buffer sorts by (key, value) and
    stride-collapses every key's run independently; runs of one key split
    across chunks add displacement additively, same as across partitions,
    so the per-key bound stays Σ ceil(m_c/k). NULL keys and NULL values
    are excluded. Exact when every (partition, key) run holds ≤ k
    values."""
    import numpy as np

    if k < 2:
        raise ValueError(f"grouped_quantile_summary k must be >= 2, got {k}")
    if chunk < k:
        raise ValueError(f"chunk ({chunk}) must be >= k ({k})")

    def gen(batches):
        kc, vc, size = [], [], 0

        def flush():
            nonlocal kc, vc, size
            keys = np.concatenate(kc) if len(kc) > 1 else kc[0]
            vals = np.concatenate(vc) if len(vc) > 1 else vc[0]
            kc, vc, size = [], [], 0
            order = np.lexsort((vals, keys))
            keys, vals = keys[order], vals[order]
            starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
            ends = np.r_[starts[1:], len(keys)]
            out_k, out_v, out_w = [], [], []
            for s, e in zip(starts, ends):
                v, w = _stride_collapse(vals[s:e], np.ones(e - s, np.int64), k)
                out_k.append(np.full(len(v), keys[s]))
                out_v.append(v)
                out_w.append(w)
            return pd.DataFrame(
                {
                    "key": np.concatenate(out_k),
                    "value": np.concatenate(out_v),
                    "weight": np.concatenate(out_w),
                }
            )

        for pdf in batches:
            if not len(pdf):
                continue
            kc.append(pdf[key_col].to_numpy(dtype="str"))
            vc.append(pdf[value_col].to_numpy("int64"))
            size += len(pdf)
            if size >= chunk:
                yield flush()
        if size:
            yield flush()

    return (
        values.filter(F.col(key_col).isNotNull() & F.col(value_col).isNotNull())
        .select(F.col(key_col).alias(key_col), F.col(value_col).alias(value_col))
        .mapInPandas(gen, "key string, value bigint, weight bigint")
    )


def grouped_quantile_values(summary: DataFrame, phis_x1000) -> DataFrame:
    """Query a grouped summary: (key, phi_x1000, q_value) — the shared
    rank query with windows partitioned by key, so it parallelizes across
    keys and each key's window spans only that key's summary rows."""
    return _rank_query(summary, phis_x1000, key_cols=("key",))


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
