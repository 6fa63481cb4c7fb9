"""DSIR importance weights (operators/dsir.py): scalar brute-force parity,
λ-table pin, exclusion/NULL semantics, artifact commit."""

import math

import pytest

from osmquadtree_spark.kernels.strhash import polyhash64_one
from osmquadtree_spark.operators import dsir as ds

B = 64


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark tile quad tree merge sort", True),
        (2, "tile quad tree image caption spark", True),
        (3, "spark tile quad tree merge sort", False),  # identical to target 1
        (4, "completely different words about nothing useful", False),
        (5, None, False),
        (6, "one", False),  # < 2 words
        (7, "tile quad tree image", False),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, is_target boolean")


def _brute(rows, n_buckets=B, alpha=1, n=2):
    """Pure-python reference: bigram bucket bags, λ, weights."""
    t = [0] * n_buckets
    r = [0] * n_buckets
    bags = {}
    for doc_id, text, is_target in rows:
        if text is None:
            continue
        words = text.split(" ")
        bag = {}
        for i in range(len(words) - n + 1):
            b = polyhash64_one(" ".join(words[i : i + n])) % n_buckets
            bag[b] = bag.get(b, 0) + 1
        bags[doc_id] = bag
        for b, c in bag.items():
            (t if is_target else r)[b] += c
    T, R = sum(t), sum(r)
    lam = [
        round(
            (
                math.log(t[b] + alpha)
                - math.log(T + alpha * n_buckets)
                - math.log(r[b] + alpha)
                + math.log(R + alpha * n_buckets)
            )
            * ds.LAMBDA_SCALE
        )
        for b in range(n_buckets)
    ]
    out = {}
    for doc_id, text, is_target in rows:
        if is_target:
            continue
        if text is None:
            out[doc_id] = (None, None)
            continue
        bag = bags.get(doc_id, {})
        out[doc_id] = (
            sum(bag.values()),
            sum(c * lam[b] for b, c in bag.items()),
        )
    return lam, out


def test_weights_match_brute_force(spark, corpus, tmp_path):
    rows = [(r["doc_id"], r["text"], r["is_target"]) for r in corpus.collect()]
    lam_ref, ref = _brute(rows)
    got = {
        r["doc_id"]: (r["n_feats"], r["weight_x"])
        for r in ds.dsir_weights(
            corpus, n_buckets=B, lambda_path=str(tmp_path / "lam")
        ).collect()
    }
    assert got == ref
    # identical raw doc of a target doc must score strictly above the
    # unrelated doc (the whole point of the weight)
    assert got[3][1] > got[4][1]


def test_lambda_table_pins_reference(spark, corpus, tmp_path):
    rows = [(r["doc_id"], r["text"], r["is_target"]) for r in corpus.collect()]
    lam_ref, _ = _brute(rows)
    stats = ds.dsir_bucket_stats(corpus, n_buckets=B).collect()
    lam = ds.lambda_table(stats, B)
    assert [int(x) for x in lam] == lam_ref


def test_artifact_commit(spark, corpus, tmp_path):
    path = str(tmp_path / "lam2")
    ds.dsir_weights(corpus, n_buckets=B, lambda_path=path).collect()
    art = spark.read.parquet(path)
    assert art.count() == B
    assert set(art.columns) == {"bucket", "t_cnt", "r_cnt", "lambda_x"}
    stats = {int(r["bucket"]): (r["t_cnt"], r["r_cnt"]) for r in art.collect()}
    # committed counts equal the distributed aggregation (the oracle's
    # admission condition)
    recomputed = {
        int(r["bucket"]): (r["t_cnt"], r["r_cnt"])
        for r in ds.dsir_bucket_stats(corpus, n_buckets=B).collect()
    }
    for b, (tc, rc) in stats.items():
        rt, rr = recomputed.get(b, (0, 0))
        assert (tc, rc) == (rt, rr)


def test_partitioning_invariance(spark, corpus):
    a = ds.dsir_weights(corpus, n_buckets=B).collect()
    b = ds.dsir_weights(corpus.repartition(7), n_buckets=B).collect()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_empty_corpus(spark):
    empty = spark.createDataFrame(
        [], "doc_id bigint, text string, is_target boolean"
    )
    assert ds.dsir_weights(empty, n_buckets=B).collect() == []


def test_probe_pass_shuffle_free(spark, corpus):
    plan = (
        ds.dsir_weights(corpus, n_buckets=B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
