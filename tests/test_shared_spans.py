"""shared_span_pairs pins: independent O(n·m) dynamic-programming longest
common substring (token-level) reference, constructed overlap cases, hash
on/off invariance, guard rails. Value parity vs DuckDB over the fixture
corpus is gated by tools/driver_sweep.py (`shared_spans`)."""

import pytest

from osmquadtree_spark.operators.docs import positional_grams, shared_span_pairs


def _lcs_tokens(a, b):
    """Classic DP longest common token substring — written independently
    of the diagonal-run formulation."""
    aw, bw = a.split(" "), b.split(" ")
    best = 0
    prev = [0] * (len(bw) + 1)
    for i in range(1, len(aw) + 1):
        cur = [0] * (len(bw) + 1)
        for j in range(1, len(bw) + 1):
            if aw[i - 1] == bw[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


DOCS = [
    (0, "q w e r t y u i o p a s d f g"),
    (1, "z x q w e r t y u i c v b n m"),   # shares 'q w e r t y u i' (8)
    (2, "a a a q w e r a a a"),              # shares 'q w e r' (4) with 0/1
    (3, "totally different words here okay"),
    (4, "q w e r t y u i o p a s d f g"),   # exact dup of 0 (span 15)
]


def _run(spark, k, min_span, **kw):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    return {
        (r["doc_a"], r["doc_b"]): (r["max_span_tokens"], r["n_runs"])
        for r in shared_span_pairs(df, k=k, min_span=min_span, gram_cap=None, **kw).collect()
    }


def test_spans_match_dp_reference(spark):
    k, min_span = 3, 3
    got = _run(spark, k, min_span)
    for i, (ida, ta) in enumerate(DOCS):
        for idb, tb in DOCS[i + 1 :]:
            lcs = _lcs_tokens(ta, tb)
            if lcs >= min_span:
                assert got[(ida, idb)][0] == lcs, (ida, idb)
            else:
                assert (ida, idb) not in got


def test_spans_hand_values(spark):
    got = _run(spark, 3, 5)
    assert got[(0, 1)][0] == 8
    assert got[(0, 4)][0] == 15
    assert got[(1, 4)][0] == 8
    assert (0, 2) not in got          # span 4 < min_span 5
    assert (0, 3) not in got


def test_spans_hash_invariance(spark):
    assert _run(spark, 3, 4) == _run(spark, 3, 4, hash_grams=False)


def test_spans_detection_floor(spark):
    # spans shorter than k are invisible: k=5 cannot see doc 2's 4-token
    # overlap even with min_span=k
    got = _run(spark, 5, 5)
    assert (0, 2) not in got and (1, 2) not in got
    assert got[(0, 1)][0] == 8


def test_spans_min_span_validation(spark):
    df = spark.createDataFrame([], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        shared_span_pairs(df, k=5, min_span=3)


def test_positional_grams_positions(spark):
    df = spark.createDataFrame([(7, "a b c d")], "doc_id bigint, text string")
    rows = sorted(
        (r["pos"], r["gram"])
        for r in positional_grams(df, 2, hash_grams=False).collect()
    )
    assert rows == [(0, "a b"), (1, "b c"), (2, "c d")]


def test_spans_empty_and_short(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, None)], "doc_id bigint, text string"
    )
    assert shared_span_pairs(df, k=3, min_span=3, gram_cap=None).collect() == []
