"""BM25 top-k tests: brute-force python twin (same integer-scaled
formula), rank sanity, tie-break rule, df_cap drops with committed
metrics, repartition invariance, empty inputs. Cross-engine bit-exactness
runs through the driver gate (`bm25_topk` SQL oracle)."""

import math

import pandas as pd
import pytest

from osmquadtree_spark.operators import search as srch


def _corpus(spark):
    rows = [
        (0, "spark shuffles data across the cluster nodes"),
        (1, "the quadtree index prunes whole subtrees"),
        (2, "spark cluster nodes spill sorted runs to disk"),
        (3, "a b c d"),
        (4, "spark spark spark cluster"),
        (5, "unrelated words entirely here now"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _brute(docs, queries, k=10, k1=1.2, b=0.75, S=srch.SCALE):
    tf, dl = {}, {}
    for d, t in docs:
        words = [w for w in t.split(" ") if w]
        dl[d] = len(words)
        for w in words:
            tf[(d, w)] = tf.get((d, w), 0) + 1
    n = len(docs)
    avgdl = sum(dl.values()) / n
    df = {}
    for (d, w) in tf:
        df[w] = df.get(w, 0) + 1
    out = {}
    for qid, qt in queries:
        scores = {}
        for w in set(x for x in qt.split(" ") if x):
            if w not in df:
                continue
            idf_i = min(
                math.floor(S * (((n - df[w]) + 0.5) / (df[w] + 0.5))),
                srch.IDF_INT_MAX,
            )
            for d in dl:
                if (d, w) in tf:
                    t = tf[(d, w)]
                    den = t + k1 * (1 - b + (b * dl[d]) / avgdl)
                    scores[d] = scores.get(d, 0) + idf_i * math.floor(S * t / den)
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        out[qid] = [(d, s, i + 1) for i, (d, s) in enumerate(ranked)]
    return out


def test_bm25_matches_brute_force(spark):
    docs = _corpus(spark)
    queries = spark.createDataFrame(
        pd.DataFrame(
            [(100, "spark cluster"), (101, "quadtree index"), (102, "zzz")],
            columns=["query_id", "text"],
        )
    )
    got = {}
    for r in srch.bm25_topk(docs, queries, k=4).collect():
        got.setdefault(r.query_id, []).append((r.doc_id, r.score, r.rank))
    for qid in got:
        got[qid].sort(key=lambda x: x[2])
    want = _brute(
        [(r.doc_id, r.text) for r in docs.collect()],
        [(100, "spark cluster"), (101, "quadtree index"), (102, "zzz")],
        k=4,
    )
    assert got == {k: v for k, v in want.items() if v}
    # term-free query yields no rows at all
    assert 102 not in got
    # doc 4 (spark x3 + cluster) outranks single-mention docs for q100
    assert got[100][0][0] == 4


def test_bm25_repartition_invariant(spark):
    docs = _corpus(spark)
    queries = spark.createDataFrame(
        pd.DataFrame([(1, "spark cluster nodes")], columns=["query_id", "text"])
    )
    a = sorted(tuple(r) for r in srch.bm25_topk(docs, queries).collect())
    b = sorted(
        tuple(r)
        for r in srch.bm25_topk(docs.repartition(7), queries).collect()
    )
    assert a == b


def test_bm25_df_cap_drops_hot_terms(spark, tmp_path):
    from osmquadtree_spark import metrics

    docs = _corpus(spark)
    queries = spark.createDataFrame(
        pd.DataFrame([(1, "spark quadtree")], columns=["query_id", "text"])
    )
    mp = str(tmp_path / "metrics")
    # 'spark' appears in 3 docs, 'quadtree' in 1 — cap at 2 drops 'spark'
    capped = srch.bm25_topk(docs, queries, k=10, df_cap=2, metrics_path=mp)
    hit_docs = {r.doc_id for r in capped.collect()}
    assert hit_docs == {1}  # only the quadtree doc survives
    metrics.commit_pending()
    rows = metrics.read_metrics(spark, mp).collect()
    dropped = {
        r.bucket_key: r.value
        for r in rows
        if r.metric == "query_term_df_dropped"
    }
    assert dropped == {"spark": 3}


def test_bm25_empty_inputs(spark):
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    queries = spark.createDataFrame([], "query_id bigint, text string")
    out = srch.bm25_topk(docs, queries)
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "score", "rank"]


def test_bm25_idf_winsorization_binds(spark):
    """2001 docs, one containing a unique term: the raw scaled idf ratio
    exceeds IDF_INT_MAX (2000.5/1.5 > 1000) and must saturate identically
    to the python twin — the int64-overflow guard for giant corpora."""
    rows = [(i, "filler words only") for i in range(2000)]
    rows.append((2000, "rareterm appears once"))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    queries = spark.createDataFrame(
        pd.DataFrame([(1, "rareterm")], columns=["query_id", "text"])
    )
    got = [(r.doc_id, r.score) for r in srch.bm25_topk(docs, queries).collect()]
    want = _brute([(d, t) for d, t in rows], [(1, "rareterm")])[1]
    assert got == [(d, s) for d, s, _ in want]
    # the cap actually bound: raw ratio floor(S*(1200.5-... )) > IDF_INT_MAX
    import math as m
    raw = m.floor(srch.SCALE * (((2001 - 1) + 0.5) / 1.5))
    assert raw > srch.IDF_INT_MAX
