"""Gates for bench_scaling's dedup job: the scaling evidence is only
meaningful if the synthesized input is identical at every parallelism and
the job's self-check (planted near-dup recovery) measures what it claims.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import DOC_DUP_STRIDE, doc_table  # noqa: E402


def test_doc_table_partition_invariant(spark):
    """Text is a pure function of the row index: generating the table at 2
    and at 7 partitions yields the identical (doc_id -> text) mapping —
    the precondition for comparing throughput across parallelism levels."""
    a = {r.doc_id: r.text for r in doc_table(spark, 1500, 2).collect()}
    b = {r.doc_id: r.text for r in doc_table(spark, 1500, 7).collect()}
    assert a == b
    assert len(a) == 1500
    # near-dups share everything but the tail word
    for i in range(3, 1500, DOC_DUP_STRIDE):
        src, dup = a[i - 3], a[i]
        assert dup.rsplit(" ", 1)[0] == src
        assert dup != src


def test_dedup_job_recovers_planted_pairs(spark):
    """Every planted (i-3, i) near-dup pair shares 14 of 15 word-3-grams
    (jaccard ~0.93); MinHash 4x4 banding must recover ~99.6% of them, and
    random 400-word-vocab docs must contribute (almost) no false pairs —
    the bound run_dedup_job asserts per worker, pinned here at test scale."""
    from osmquadtree_spark.operators.dedup import minhash_lsh_pairs

    n = 7000
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(doc_table(spark, n, 4), metrics_path=None).collect()
    }
    planted = {(i - 3, i) for i in range(3, n, DOC_DUP_STRIDE)}
    recovered = len(pairs & planted)
    assert recovered >= 0.98 * len(planted)
    # false pairs (non-planted survivors) stay a sliver of the result
    assert len(pairs - planted) <= 0.02 * len(planted)


def test_docs_cache_path_tracks_generator_params(monkeypatch):
    """The dedup input table's cache path embeds a fingerprint of the
    generator (source + constants + vocab), so editing the generator
    invalidates the cached parquet instead of silently benchmarking a
    corpus produced by older code."""
    import bench_scaling as bs

    p1 = bs.docs_parquet_path(1000)
    assert bs.docs_parquet_path(1000) == p1  # deterministic
    monkeypatch.setattr(bs, "DOC_WORDS", bs.DOC_WORDS + 1)
    assert bs.docs_parquet_path(1000) != p1


def test_edge_table_partition_invariant(spark):
    """The graph job's edge list is a pure function of the row index —
    identical at any parallelism — and the chain construction is right:
    node i links to i-1 except at chain starts."""
    from bench_scaling import GRAPH_CHAIN, edge_table

    a = {tuple(sorted((r.id_a, r.id_b))) for r in edge_table(spark, 256, 2).collect()}
    b = {tuple(sorted((r.id_a, r.id_b))) for r in edge_table(spark, 256, 7).collect()}
    assert a == b
    want = {(i - 1, i) for i in range(256) if i % GRAPH_CHAIN != 0}
    assert a == want


def test_graph_job_self_check(spark, tmp_path):
    """run_graph_job's closed-form verification passes at test scale AND
    fails loudly when the input does not match the claimed row count (the
    guard that stops a stale/mismatched cached edge table from producing a
    plausible-looking throughput number)."""
    import pytest

    from bench_scaling import GRAPH_CHAIN, edge_table, run_graph_job

    out = run_graph_job(spark, 4 * GRAPH_CHAIN * GRAPH_CHAIN, partitions=4)
    assert out["components"] == 4 * GRAPH_CHAIN
    # edges for 128 nodes, claimed as 256 → component count/sum mismatch
    p = str(tmp_path / "edges.parquet")
    edge_table(spark, 4 * GRAPH_CHAIN, 2).write.parquet(p)
    with pytest.raises(AssertionError, match="self-check"):
        run_graph_job(spark, 8 * GRAPH_CHAIN, partitions=2, edges_path=p)
