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


def test_final_batch_operators_on_empty_and_all_null(spark, empties):
    """Final round-4 batch: every new curation operator returns a
    schema-stable result on an EMPTY corpus and on an ALL-NULL corpus
    (NULL text / NULL ids / NULL labels everywhere a NULL is typable) —
    the two degenerate shapes a partitioned 100-TB scan actually hands a
    task (empty split; split of rows that failed upstream parsing)."""
    from osmquadtree_spark.operators import docs as do
    from osmquadtree_spark.operators.ann import label_outlier_stats

    docs0 = empties["docs"]
    mix0 = spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string"
    )
    vec0 = spark.createDataFrame([], "vec_id bigint, label int, embedding array<float>")
    assert do.token_rarity(docs0).count() == 0
    assert do.source_quota_cap(mix0.select("doc_id", "source"), 5).count() == 0
    assert do.corpus_mix(mix0).count() == 0
    assert do.shared_span_pairs(docs0, k=3, min_span=3).count() == 0
    assert do.dedup_span_mask(docs0, k=3, min_span=3).count() == 0
    assert do.token_shards(docs0, 100).count() == 0
    assert do.shard_manifest(docs0, 100).count() == 0
    assert do.quality_gate(docs0).count() == 0
    assert label_outlier_stats(vec0, dim=4).count() == 0

    null_docs = spark.createDataFrame(
        [(1, None, None, None), (2, None, None, None)],
        "doc_id bigint, text string, lang string, source string",
    )
    null_vecs = spark.createDataFrame(
        [(1, None, None)], "vec_id bigint, label int, embedding array<float>"
    )
    # NULL text: stat ops keep the rows with NULL stats, pair/shard ops
    # treat them as token-free
    rar = do.token_rarity(null_docs.select("doc_id", "text")).collect()
    assert {r["doc_id"] for r in rar} == {1, 2}
    assert all(r["n_tokens"] is None for r in rar)
    qg = do.quality_gate(null_docs.select("doc_id", "text")).collect()
    assert all(r["keep"] is None and r["reasons"] is None for r in qg)
    assert do.shared_span_pairs(null_docs.select("doc_id", "text"), k=3, min_span=3).count() == 0
    mask = do.dedup_span_mask(null_docs.select("doc_id", "text"), k=3, min_span=3).collect()
    assert all(r["dup_tokens"] is None for r in mask)
    shards = do.token_shards(null_docs.select("doc_id", "text"), 100).collect()
    assert sorted((r["doc_id"], r["n_tokens"]) for r in shards) == [(1, 0), (2, 0)]
    mix = do.corpus_mix(null_docs).collect()
    assert len(mix) == 1 and mix[0]["n_docs"] == 2 and mix[0]["n_tokens"] == 0
    quota = do.source_quota_cap(null_docs.select("doc_id", "source"), 5).collect()
    assert {(r["doc_id"], r["source"]) for r in quota} == {(1, None), (2, None)}
    assert label_outlier_stats(null_vecs, dim=4).count() == 0  # NULL vec excluded
