"""Misra-Gries heavy hitters (operators/sketch.py) and PII redaction
(docs.pii_scrub): the lossy-regime MG guarantees the driver oracle cannot
see (it pins the exact cap ≥ vocab regime), plan hygiene for both new
operators, and regex-dialect agreement for the scrub."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtree_spark import queries as Q
from osmquadtree_spark.operators.docs import PII_PATTERNS, pii_scrub
from osmquadtree_spark.operators.sketch import mg_sketch, mg_token_topk


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


ZIPFY = [
    (i, " ".join(["alpha"] * 40 + ["beta"] * 20 + [f"tail{i % 97}"] * 3))
    for i in range(300)
]


def _true_counts(spark, docs):
    return {
        r["token"]: r["c"]
        for r in docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("c")).collect()
    }


def test_exact_regime_matches_groupby(spark):
    """cap ≥ distinct tokens ⇒ no trim ever fires: est == true count for
    every token and err_bound == 0 (the regime the driver oracle pins)."""
    docs = _docs(spark, ZIPFY)
    true = _true_counts(spark, docs)
    got = mg_sketch(docs, cap=200).collect()
    assert len(got) == len(true)
    for r in got:
        assert r["err_bound"] == 0
        assert r["est_count"] == true[r["token"]]


def test_lossy_regime_mg_guarantees(spark):
    """cap ≪ distinct (99 distinct tail tokens + 2 heavy, cap=8): every
    reported token underestimates by at most err_bound, and every token
    with true count > err_bound survives (no false negatives above the
    bound) — the classic MG contract under the mergeable-summaries union."""
    docs = _docs(spark, ZIPFY).repartition(5)
    true = _true_counts(spark, docs)
    rows = mg_sketch(docs, cap=8).collect()
    assert rows, "sketch must not be empty"
    bound = rows[0]["err_bound"]
    assert all(r["err_bound"] == bound for r in rows)
    assert bound > 0  # trims genuinely fired in this configuration
    survivors = {r["token"]: r["est_count"] for r in rows}
    assert len(survivors) <= 8
    for tok, est in survivors.items():
        assert est <= true[tok]
        assert true[tok] - est <= bound
    for tok, cnt in true.items():
        if cnt > bound:
            assert tok in survivors, f"heavy token {tok} lost (cnt={cnt} > D={bound})"
    # the two genuinely heavy tokens must be the top-2
    top = mg_token_topk(docs, cap=8, topk=2).collect()
    assert [t["token"] for t in sorted(top, key=lambda r: r["rank"])] == ["alpha", "beta"]


def test_partition_invariant_in_exact_regime(spark):
    """With cap ≥ vocab the merged sketch is the exact count table, so it
    cannot depend on how the input was split."""
    docs = _docs(spark, ZIPFY)
    a = sorted(map(tuple, mg_sketch(docs.repartition(2), cap=200).collect()))
    b = sorted(map(tuple, mg_sketch(docs.repartition(7), cap=200).collect()))
    assert a == b


def test_empty_and_null_inputs(spark):
    empty = _docs(spark, [(1, "x")]).filter("doc_id < 0")
    assert mg_sketch(empty, cap=4).collect() == []
    nulls = spark.createDataFrame(
        [(1, None), (2, "a a b")], "doc_id bigint, text string"
    )
    got = {r["token"]: r["est_count"] for r in mg_sketch(nulls, cap=8).collect()}
    assert got == {"a": 2, "b": 1}
    with pytest.raises(ValueError):
        mg_sketch(nulls, cap=0)


def test_mg_plan_is_sketch_bounded(spark, sf_dir):
    """Plan shape: ONE Arrow/pandas stage (the per-partition sketch) and
    no exchange before it — the only shuffles move sketch-bounded rows."""
    df = Q.q_token_topk(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("MapInPandas") == 1
    # nothing below MapInPandas may shuffle on DATA keys: the sketch
    # consumes the scan's own splits. The one allowed exchange is
    # balanced()'s RoundRobin fan-out (fires only when a tiny local scan
    # arrives in fewer splits than cores — a no-op at production scale).
    below = plan[plan.index("MapInPandas") + 1:]
    for line in below.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, line
    df.limit(1).collect()  # executes


def test_pii_scrub_counts_and_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call +1-555-0123 or +44-201-9999 host 10.0.0.7 end"),
            (3, "no pii here"),
            (4, None),
            (5, "edge 999.999.999.999 and a@b.io"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert got[1]["n_emails"] == 1 and got[1]["clean_text"] == "mail <EMAIL> now"
    assert got[2]["n_phones"] == 2 and got[2]["n_ips"] == 1
    assert got[2]["clean_text"] == "call <PHONE> or <PHONE> host <IP> end"
    assert got[3]["clean_text"] == "no pii here"
    assert got[4]["clean_text"] is None and got[4]["n_emails"] is None
    # the simple IP pattern documents its 0-255 naivety: 999.x still redacts
    assert got[5]["n_ips"] == 1 and got[5]["n_emails"] == 1


def test_pii_scrub_regex_dialect_parity():
    """Every PII pattern must compile and agree on a probe corpus in BOTH
    dialects the gate pairs: Python re (a superset of java.util.regex for
    this subset) and DuckDB's RE2 — guarding pattern edits that drift into
    one engine's extensions (lookaround, possessives)."""
    import re

    import duckdb

    probes = [
        "a@b.io x", "no match", "+1-555-0000", "1.2.3.4", "a.b@c.d.ee",
        "10.1.2.3x", "x+9-123-4567", "v1.2.3.4.5",
    ]
    con = duckdb.connect()
    for _, pat, _ in PII_PATTERNS:
        for s in probes:
            py = len(re.findall(pat, s))
            dk = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [s, pat]
            ).fetchone()[0]
            assert py == dk, (pat, s, py, dk)


def test_bpe_regex_dialect_parity():
    """BPE_SPLIT_PATTERN must count identically in Python re (superset of
    java.util.regex here) and DuckDB's RE2 on probes covering every
    alternation branch, including the leftmost-first tie cases
    (contraction vs punctuation at an apostrophe, double spaces)."""
    import re

    import duckdb

    from osmquadtree_spark.operators.docs import BPE_SPLIT_PATTERN

    probes = [
        "it's done", "don't-stop", "a  b", "v1.2; x", "hello world",
        "42", " leading", "trailing ", "a'x", "''", "a,b.c!d", "",
        "mixed42text", "tabs\tand\nnewlines",
    ]
    con = duckdb.connect()
    for s in probes:
        py = len(re.findall(BPE_SPLIT_PATTERN, s))
        dk = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [s, BPE_SPLIT_PATTERN]
        ).fetchone()[0]
        assert py == dk, (s, py, dk)


def test_bpe_token_stats_values_and_nulls(spark):
    """Hand-checked counts on a tiny corpus + NULL propagation (NULL text
    ⇒ every derived column NULL; empty text ⇒ zero counts, NULL ratio)."""
    from osmquadtree_spark.operators.docs import bpe_token_stats

    docs = spark.createDataFrame(
        [(1, "it's a test"), (2, None), (3, ""), (4, "abc12!")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in bpe_token_stats(docs).collect()}
    # "it's a test": [it]["'s"][ a][ test] = 4 BPE tokens, 3 ws tokens
    assert got[1]["n_tokens_ws"] == 3 and got[1]["n_tokens_bpe"] == 4
    assert got[1]["chars_per_tok_x100"] == 11 * 100 // 4
    assert all(got[2][c] is None for c in
               ("n_tokens_ws", "n_tokens_bpe", "chars_per_tok_x100"))
    # split("") yields one empty token in both engines; zero BPE matches
    assert got[3]["n_tokens_ws"] == 1 and got[3]["n_tokens_bpe"] == 0
    assert got[3]["chars_per_tok_x100"] is None
    # "abc12!": [abc][12][!] = 3 BPE tokens
    assert got[4]["n_tokens_bpe"] == 3


def test_bpe_plan_is_pure_projection(spark, sf_dir):
    """One codegen'd projection over the scan: no Exchange, no Python."""
    plan = _plan(Q.q_bpe_token_stats(spark, sf_dir))
    assert "Exchange" not in plan
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "*(1) Project" in plan


def test_pii_plan_is_pure_projection(spark, sf_dir):
    """The scrub (fixture injection included) must stay one codegen'd
    projection over the scan: no Exchange, no Python stage of any kind."""
    plan = _plan(Q.q_pii_scrub(spark, sf_dir))
    assert "Exchange" not in plan
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan
    # executedPlan().toString() marks whole-stage-codegen spans with "*(n)"
    assert "*(1) Project" in plan


# ---------------- KMV distinct sketch ----------------


def test_kmv_exact_when_under_k(spark):
    """Fewer distinct fingerprints than k ⇒ the sketch IS the exact
    distinct count (n_sketch = est_distinct = true, kth_min = max h)."""
    from osmquadtree_spark.operators.sketch import kmv_distinct

    docs = _docs(spark, [(i, f"unique doc number {i}") for i in range(10)]
                 + [(100 + i, "a duplicate body") for i in range(5)])
    row = kmv_distinct(docs, k=64).collect()[0]
    assert row["n_sketch"] == 11  # 10 unique + 1 shared body
    assert row["est_distinct"] == 11


def test_kmv_estimator_regime_reasonable_and_partition_invariant(spark):
    """More distinct than k: est is the deterministic KMV estimate —
    identical under repartitioning (the k-minima are a pure function of
    the value set) and within the standard ~1/sqrt(k) error band for this
    fixed hash (deterministic, so the assertion is stable)."""
    from osmquadtree_spark.operators.sketch import kmv_distinct

    from osmquadtree_spark.operators.docs import fingerprint

    docs = _docs(spark, [(i, f"doc {i} body word{i % 997} tail") for i in range(800)])
    a = kmv_distinct(docs.repartition(3), k=32).collect()[0]
    b = kmv_distinct(docs.repartition(8), k=32).collect()[0]
    assert tuple(a) == tuple(b)
    assert a["n_sketch"] == 32
    # truth is distinct BY FINGERPRINT (the operator's stated spec): the
    # word code (len/first/last char) collapses word123-style variants,
    # so this corpus has far fewer distinct fps than distinct texts
    true = fingerprint(docs).select("fp").distinct().count()
    assert true > 32  # genuinely in the estimator regime
    assert abs(a["est_distinct"] - true) / true < 0.5  # ~3 sigma at k=32
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kmv_distinct(docs, k=1)


def test_kmv_empty_corpus(spark):
    from osmquadtree_spark.operators.sketch import kmv_distinct

    empty = _docs(spark, [(1, "x")]).filter("doc_id < 0")
    row = kmv_distinct(empty, k=8).collect()[0]
    assert row["n_sketch"] == 0 and row["est_distinct"] == 0
    assert row["kth_min"] is None


# ---------------------------------------------------------------------------
# quantile summary
# ---------------------------------------------------------------------------

PHIS = (10, 50, 250, 500, 750, 950, 990)


def _vals_df(spark, vals, partitions):
    return spark.createDataFrame(
        pd.DataFrame({"val": vals}), "val bigint"
    ).repartition(partitions)


def _exact_rank_values(vals_sorted, phis):
    n = len(vals_sorted)
    return {p: int(vals_sorted[max(1, -(-p * n // 1000)) - 1]) for p in phis}


def test_quantile_exact_regime(spark):
    """Every partition ≤ k ⇒ no collapse, weight-1 samples, EXACT rank
    statistics — the regime the driver oracle pins."""
    import numpy as np

    from osmquadtree_spark.operators.sketch import (
        quantile_summary,
        quantile_values,
    )

    vals = [(i * 2654435761) % 997 for i in range(500)]
    df = _vals_df(spark, vals, 4)
    got = {
        r["phi_x1000"]: r["q_value"]
        for r in quantile_values(quantile_summary(df, k=1024), PHIS).collect()
    }
    assert got == _exact_rank_values(np.sort(np.array(vals)), PHIS)


def test_quantile_exact_regime_partition_invariant(spark):
    from osmquadtree_spark.operators.sketch import (
        quantile_summary,
        quantile_values,
    )

    vals = [(i * 48271) % 1201 for i in range(800)]
    outs = []
    for parts in (1, 3, 16):
        df = _vals_df(spark, vals, parts)
        outs.append(
            sorted(
                tuple(r)
                for r in quantile_values(
                    quantile_summary(df, k=2048), PHIS
                ).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_quantile_lossy_regime_displacement_bound(spark):
    """k ≪ partition sizes: the reported value's true rank range must lie
    within Σ_p ceil(m_p/k) of the target rank (one collapse per partition,
    ≤ one segment width of displacement each). Bound used: P + n//k ≥
    Σ ceil(m_p/k)."""
    import numpy as np

    from osmquadtree_spark.operators.sketch import (
        quantile_summary,
        quantile_values,
    )

    n, parts, k = 60_000, 12, 64
    vals = np.array([(i * 2654435761) % 1_000_003 for i in range(n)], np.int64)
    df = _vals_df(spark, vals.tolist(), parts)
    rows = quantile_values(quantile_summary(df, k=k), PHIS).collect()
    assert len(rows) == len(PHIS)
    s = np.sort(vals)
    bound = parts + n // k
    for r in rows:
        target = max(1, -(-r["phi_x1000"] * n // 1000))
        lo = int(np.searchsorted(s, r["q_value"], side="left")) + 1
        hi = int(np.searchsorted(s, r["q_value"], side="right"))
        assert lo - bound <= target <= hi + bound, (r, target, lo, hi, bound)


def test_quantile_merge_and_compact(spark):
    """Mergeability: union of two halves' summaries answers exactly in the
    exact regime; compact_summary conserves total weight and adds at most
    ceil(W/k) displacement."""
    import numpy as np

    from osmquadtree_spark.operators.sketch import (
        compact_summary,
        quantile_summary,
        quantile_values,
    )

    vals = [(i * 69621) % 4099 for i in range(2000)]
    a = quantile_summary(_vals_df(spark, vals[:1000], 2), k=4096)
    b = quantile_summary(_vals_df(spark, vals[1000:], 2), k=4096)
    merged = a.unionByName(b)
    got = {
        r["phi_x1000"]: r["q_value"]
        for r in quantile_values(merged, PHIS).collect()
    }
    s = np.sort(np.array(vals))
    assert got == _exact_rank_values(s, PHIS)

    k2 = 128
    compacted = compact_summary(merged, k2)
    crows = compacted.collect()
    assert len(crows) <= k2
    assert sum(r["weight"] for r in crows) == len(vals)  # weight conserved
    bound = -(-len(vals) // k2)
    for r in quantile_values(compacted, PHIS).collect():
        target = max(1, -(-r["phi_x1000"] * len(vals) // 1000))
        lo = int(np.searchsorted(s, r["q_value"], side="left")) + 1
        hi = int(np.searchsorted(s, r["q_value"], side="right"))
        assert lo - bound <= target <= hi + bound


def test_quantile_chunked_collapse_bound_and_null_values(spark):
    """A small ``chunk`` forces multiple flushes per partition: total
    weight must still equal the non-NULL count (NULL values are excluded,
    not cast — the INT64_MIN NaN-cast trap), and the displacement bound
    gains only #chunks (stride error is additive across disjoint
    chunks)."""
    import numpy as np

    from osmquadtree_spark.operators.sketch import (
        quantile_summary,
        quantile_values,
    )

    n, parts, k, chunk = 30_000, 4, 64, 2048
    vals = [(i * 48271) % 999_983 for i in range(n)]
    rows = [(v,) for v in vals] + [(None,)] * 7
    df = spark.createDataFrame(rows, "val bigint").repartition(parts)
    summary = quantile_summary(df, k=k, chunk=chunk)
    srows = summary.collect()
    assert sum(r["weight"] for r in srows) == n  # NULLs carried no weight
    # every flush emits ≤ k rows; #flushes ≤ parts * ceil(per-part/chunk)+parts
    max_flushes = parts * (-(-(n // parts + 1) // chunk) + 1)
    assert len(srows) <= max_flushes * k
    s = np.sort(np.array(vals))
    bound = n // k + max_flushes  # Σ ceil(m_c/k) ≤ n/k + #chunks
    for r in quantile_values(summary, PHIS).collect():
        target = max(1, -(-r["phi_x1000"] * n // 1000))
        lo = int(np.searchsorted(s, r["q_value"], side="left")) + 1
        hi = int(np.searchsorted(s, r["q_value"], side="right"))
        assert lo - bound <= target <= hi + bound, (r, target, lo, hi, bound)
    with pytest.raises(ValueError):
        quantile_summary(df, k=64, chunk=32)  # chunk < k


def test_grouped_quantile_exact_regime_and_null_keys(spark):
    """Per-key exact-regime parity vs the ungrouped sketch run key by key;
    NULL keys are excluded entirely."""
    import numpy as np

    from osmquadtree_spark.operators.sketch import (
        grouped_quantile_summary,
        grouped_quantile_values,
    )

    rows = [("k%d" % (i % 3), (i * 2654435761) % 1009) for i in range(600)]
    rows += [(None, 10**9)] * 5  # must not appear in any group
    df = spark.createDataFrame(rows, "key string, val bigint").repartition(4)
    got = {
        (r["key"], r["phi_x1000"]): r["q_value"]
        for r in grouped_quantile_values(
            grouped_quantile_summary(df, k=1024), PHIS
        ).collect()
    }
    assert set(k for k, _ in got) == {"k0", "k1", "k2"}
    for key in ("k0", "k1", "k2"):
        vals = np.sort(np.array([v for k, v in rows[:600] if k == key]))
        exact = _exact_rank_values(vals, PHIS)
        for p in PHIS:
            assert got[(key, p)] == exact[p], (key, p)


def test_grouped_quantile_lossy_bound_per_key(spark):
    import numpy as np

    from osmquadtree_spark.operators.sketch import (
        grouped_quantile_summary,
        grouped_quantile_values,
    )

    n, parts, k = 40_000, 8, 32
    rows = [("g%d" % (i % 2), (i * 48271) % 999_983) for i in range(n)]
    df = spark.createDataFrame(rows, "key string, val bigint").repartition(parts)
    out = grouped_quantile_values(
        grouped_quantile_summary(df, k=k), PHIS
    ).collect()
    assert len(out) == 2 * len(PHIS)
    per_key = {
        key: np.sort(np.array([v for kk, v in rows if kk == key]))
        for key in ("g0", "g1")
    }
    for r in out:
        s = per_key[r["key"]]
        m = len(s)
        bound = parts + m // k
        target = max(1, -(-r["phi_x1000"] * m // 1000))
        lo = int(np.searchsorted(s, r["q_value"], side="left")) + 1
        hi = int(np.searchsorted(s, r["q_value"], side="right"))
        assert lo - bound <= target <= hi + bound, (r, target, lo, hi, bound)


def test_quantile_empty_and_null_text(spark):
    from osmquadtree_spark.operators.sketch import (
        doc_length_quantiles,
        quantile_summary,
    )

    all_null = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id bigint, text string"
    )
    assert doc_length_quantiles(all_null, PHIS, k=64).count() == 0
    empty = spark.createDataFrame([], "val bigint")
    assert quantile_summary(empty, k=64).count() == 0
    with pytest.raises(ValueError):
        quantile_summary(empty, k=1)
