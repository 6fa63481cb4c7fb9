"""Empty-input robustness: at 10^12-row scale, empty diffs, empty extract
regions and all-filtered partitions are routine — every library operator
must return a schema-stable empty result (or raise an EXPLICIT error, as
train_centroids does for an unseedable codebook), never crash in a kernel
(np.concatenate([]), None[0] from a .first() sniff, reduceat on zero
rows)."""

import pytest


@pytest.fixture(scope="module")
def empties(spark):
    return {
        "docs": spark.createDataFrame([], "doc_id bigint, text string"),
        "emb": spark.createDataFrame([], "vec_id bigint, embedding array<double>"),
        "q": spark.createDataFrame([], "query_id bigint, embedding array<double>"),
        "nodes": spark.createDataFrame([], "node_id bigint, lon bigint, lat bigint"),
        "ways": spark.createDataFrame([], "way_id bigint, refs array<bigint>"),
    }


def test_dedup_operators_on_empty(spark, empties):
    from osmquadtree_spark.operators import dedup as dd
    from osmquadtree_spark.operators import docs as do

    e = empties["docs"]
    assert dd.minhash_signature(e).count() == 0
    assert dd.simhash_signature(e).count() == 0
    assert dd.simhash_pairs(e).count() == 0
    assert dd.minhash_lsh_pairs(e).count() == 0
    assert do.text_analysis_vectorized(e).count() == 0
    assert do.ngram_pairs(e).count() == 0


def test_embedding_operators_on_empty(spark, empties):
    from osmquadtree_spark.operators import ann
    from osmquadtree_spark.operators import dedup as dd

    emb, q = empties["emb"], empties["q"]
    assert ann.cosine_topk(emb, q, 5).count() == 0
    # LSH paths must short-circuit the dim sniff (first() is None) into a
    # schema-stable empty result, not None[0]
    topk = ann.lsh_topk(emb, q, 5)
    assert topk.count() == 0
    assert set(topk.columns) == {"query_id", "vec_id", "rank"}
    pairs = dd.embedding_dup_pairs_lsh(emb, min_cos=0.9)
    assert pairs.count() == 0
    assert set(pairs.columns) == {"id_a", "id_b", "cos"}
    # an unseedable codebook is an explicit, actionable error — not a crash
    with pytest.raises(ValueError, match="cannot seed"):
        ann.train_centroids(emb, 4)
    # ... unless the caller opts into shrink-to-sample (semantic dedup's
    # empty-diff contract): empty sample → None, empty typed pair frame
    assert ann.train_centroids(emb, 4, shrink_to_sample=True) is None
    sem = dd.semantic_dup_pairs(emb, min_cos=0.9, n_centroids=4)
    assert sem.count() == 0
    assert set(sem.columns) == {"id_a", "id_b", "cos"}


def test_components_and_decontaminate_on_empty(spark, empties):
    from osmquadtree_spark.operators import components as cc
    from osmquadtree_spark.operators import docs as do

    docs = empties["docs"]
    edges = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    out = cc.dup_clusters(docs, edges)
    assert out.count() == 0
    assert set(out.columns) == {
        "doc_id", "component_id", "component_size", "is_representative"
    }
    bench = docs.selectExpr("doc_id AS bench_id", "text")
    assert do.benchmark_overlap(docs, bench).count() == 0
    # tiny non-empty corpus, shrink-to-sample: 2 points, 4 requested
    import pandas as pd

    two = spark.createDataFrame(
        pd.DataFrame({
            "vec_id": [1, 2],
            "embedding": [[1.0, 0.0], [1.0, 0.001]],
        })
    )
    from osmquadtree_spark.operators import dedup as dd

    got = dd.semantic_dup_pairs(two, min_cos=0.99, n_centroids=4, nprobe=2)
    assert {(r.id_a, r.id_b) for r in got.collect()} == {(1, 2)}


def test_calcqts_on_empty(spark, empties):
    from osmquadtree_spark.operators import calcqts as cq

    wq = cq.way_quadtrees(empties["ways"], empties["nodes"])
    assert wq.count() == 0


def test_changes_and_update_on_empty(spark, empties):
    """An empty diff (no changes since the last snapshot) is the most
    common production input of all — the update pipeline must pass it
    through without a kernel crash."""
    import numpy as np

    from osmquadtree_spark.operators.changes import apply_changes
    from osmquadtree_spark.operators.update import find_change_tiles

    snap = spark.createDataFrame(
        [(1, 5, 0), (2, 9, 0)], "id bigint, qt bigint, changetype int"
    )
    empty_ch = spark.createDataFrame([], "id bigint, qt bigint, changetype int")
    merged = apply_changes(snap, [empty_ch], ["id"])
    assert merged.count() == 2

    resolved = spark.createDataFrame(
        [], "element_type int, id bigint, qt bigint, changetype int"
    )
    allocs = spark.createDataFrame([], "element_type int, id bigint, alloc bigint")
    gqt = np.asarray([3], dtype=np.int64)
    assert find_change_tiles(resolved, allocs, gqt).count() == 0


def test_ngram_pairs_short_docs(spark):
    """Documents with fewer than n words have no n-grams — the engine must
    skip them like the SQL twin's len >= n filter, not crash in
    sequence(0, negative) / slice(words, 0, n)."""
    from osmquadtree_spark.operators.docs import ngram_pairs

    docs = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "a b c d e"), (4, "a b c d e")],
        "doc_id bigint, text string",
    )
    pairs = ngram_pairs(docs, n=3, min_jaccard=0.5).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(3, 4)}


def test_calc_change_qts_inmem_empty(spark):
    """An empty change set (quiet day) through the driver-side resolution:
    schema-stable empty outputs, no numpy edge-case crashes."""
    import pandas as pd

    from osmquadtree_spark.operators.update import calc_change_qts_inmem

    empty_n = pd.DataFrame(
        {"node_id": [], "lon": [], "lat": [], "changetype": [], "old_qt": []}
    )
    empty_w = pd.DataFrame(
        {"way_id": [], "refs": [], "changetype": [], "old_qt": []}
    )
    empty_r = pd.DataFrame(
        {"rel_id": [], "members": [], "changetype": [], "old_qt": []}
    )
    res = calc_change_qts_inmem(spark, empty_n, empty_w, empty_r)
    for kind in ("nodes", "ways", "relations"):
        assert res[kind].count() == 0
        assert set(res[kind].columns) == {
            "node_id" if kind == "nodes" else ("way_id" if kind == "ways" else "rel_id"),
            "qt",
            "changetype",
        }


def test_temporal_and_phash_operators_on_empty(spark, empties):
    """Round-4 additions: empty probes / refs / catalogs / corpora all
    return schema-stable empty (or all-NULL-ref) results."""
    from osmquadtree_spark.operators import docs as do
    from osmquadtree_spark.operators.asof import asof_join
    from osmquadtree_spark.operators.images import phash_near_dup
    from osmquadtree_spark.operators.interval import interval_join, sessionize

    probes = spark.createDataFrame([], "event_id bigint, k bigint, ts timestamp_ntz")
    refs = spark.createDataFrame([], "k bigint, ts timestamp_ntz, event_id bigint")
    ivals = spark.createDataFrame([], "k bigint, start timestamp_ntz, end timestamp_ntz")
    cat = spark.createDataFrame([], "img_idx bigint, phash bigint")

    assert asof_join(probes, refs, on=["k"]).count() == 0
    assert interval_join(
        probes, ivals, on=["k"], ts_col="ts", start_col="start", end_col="end"
    ).count() == 0
    assert sessionize(refs.select("k", "ts"), on=["k"]).count() == 0
    assert phash_near_dup(cat).count() == 0
    assert do.doc_chunks(empties["docs"]).count() == 0
    assert do.sample_by_hash(
        spark.createDataFrame([], "doc_id bigint, lang string"), rates={"en": 5000}
    ).count() == 0
    # non-empty probes against EMPTY refs: left semantics — all rows kept,
    # all ref columns NULL
    import pandas as pd
    one = spark.createDataFrame(
        pd.DataFrame([(1, 10, pd.Timestamp("2024-01-01"))],
                     columns=["event_id", "k", "ts"]),
        "event_id bigint, k bigint, ts timestamp_ntz",
    )
    [row] = asof_join(one, refs, on=["k"]).collect()
    assert (row.ref_event_id, row.ref_ts) == (None, None)


def test_sketch_and_split_operators_on_empty(spark, empties):
    """Round-4 close additions: BPE token stats, quantile summaries (flat,
    grouped, compacted) and the cluster split all return schema-stable
    empty results on empty inputs (the quantile gens must not hit
    np.concatenate([]) or lexsort on zero rows)."""
    from osmquadtree_spark.operators import docs as do
    from osmquadtree_spark.operators.components import cluster_split
    from osmquadtree_spark.operators.sketch import (
        compact_summary,
        doc_length_quantiles,
        grouped_quantile_summary,
        grouped_quantile_values,
        quantile_values,
    )

    assert do.bpe_token_stats(empties["docs"]).count() == 0
    assert doc_length_quantiles(empties["docs"], (500,), k=16).count() == 0
    gsum = grouped_quantile_summary(
        spark.createDataFrame([], "key string, val bigint"), k=16
    )
    assert gsum.count() == 0
    assert grouped_quantile_values(gsum, (500,)).count() == 0
    empty_summary = spark.createDataFrame([], "value bigint, weight bigint")
    assert compact_summary(empty_summary, k=16).count() == 0
    assert quantile_values(empty_summary, (500,)).count() == 0
    clusters = spark.createDataFrame(
        [], "doc_id bigint, component_id bigint, component_size bigint, "
        "is_representative boolean"
    )
    assert cluster_split(clusters).count() == 0
