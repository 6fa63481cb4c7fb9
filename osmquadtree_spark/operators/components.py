"""Connected components over near-dup pair sets — pair lists → canonical
cluster representatives.

A dedup pipeline ends with "keep one document per duplicate CLUSTER", but
every pair operator (minhash/simhash/ngram/embedding LSH) emits EDGES.
Transitivity is real at corpus scale: A≈B and B≈C chains mean the keep/drop
decision needs the connected component, not the pair. The reference's quadtree
relation closure (calcqts.py rel→rel passes) is the same fixpoint problem over
a bounded graph; here the graph is unbounded, so the engine uses the
alternating large-star / small-star algorithm (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and Beyond",
ACM SoCC 2014): each round is two groupBy-min shuffles over the edge list,
convergence in O(log² n) rounds (2-5 in practice), every step a plain
DataFrame op (no UDFs, no driver-side graph).

Scale shape: state is only the current edge list (≤ input edges, shrinking
toward one star edge per non-root node); each round shuffles on the node id —
the natural key, skew-limited because large-star points high-degree
neighborhoods at their min and the edge list contracts geometrically. Lineage
is truncated per round via cache.stage_checkpoint (reliable checkpoint dir on
clusters, localCheckpoint in bounded local runs); convergence is ONE tiny
aggregate action per round (count + xxhash64 checksum of the edge set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..cache import cached, release_stage_checkpoint, stage_checkpoint


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u}).

    Input/output edges are (u, v) with u > v (large→small orientation);
    the symmetrized neighborhood is grouped on each endpoint, so one
    groupBy-min + one re-join per round."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    m = F.least(F.col("_mn"), F.col("u")).alias("v")
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m)
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every smaller neighbor of u (and u itself) to
    min(Γ⁻(u) ∪ {u}) over the large→small-oriented edge list."""
    ori = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = ori.groupBy("u").agg(F.min("v").alias("_mn"))
    to_min = ori.join(mins, "u").select(F.col("v").alias("u"), F.col("_mn").alias("v"))
    self_edge = mins.select("u", F.col("_mn").alias("v"))
    return (
        to_min.unionByName(self_edge)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _converged_star(
    edges: DataFrame,
    id_a: str,
    id_b: str,
    max_rounds: int,
    metrics_path: str | None = None,
    operator: str = "connected_components",
) -> DataFrame:
    """Run the alternation to its fixpoint and return the star forest as
    checkpointed (u=non-root node, v=component root) edges — exactly one
    row per non-root node; roots carry no row (they label themselves).

    Convergence is detected by a (count, xxhash64-sum) checksum of the
    oriented edge set: one tiny aggregate per round, the only driver-side
    state. ``max_rounds`` is a runaway backstop far above the O(log² n)
    bound (n = 2^30 nodes needs ~10 rounds); hitting it raises instead of
    returning a wrong answer."""
    e = (
        edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )
    e = stage_checkpoint(e, eager=True)
    prev = None
    rounds = 0
    edge_counts: list[int] = []
    for _ in range(max_rounds):
        old = e
        # eager=False: the convergence aggregate right below is the
        # materializing action, so each round pays ONE pass over the new
        # edge set instead of two (eager checkpoint job + agg job) — the
        # round-loop's fixed cost is the serial term of the whole
        # operator's Amdahl profile (measured: ~9 s/round eager vs ~5 s
        # non-eager at 8M edges), and the checkpoint still truncates
        # lineage before the next round reads it
        e = stage_checkpoint(_small_star(_large_star(e)), eager=False)
        # decimal(38,0) accumulator: an int64 sum of xxhash64 terms overflows
        # (ANSI mode raises); decimal holds ~10^38, beyond any edge count
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).first()
        # the agg above fully materialized THIS round's checkpoint blocks
        # (lineage is truncated — nothing downstream can reach the old
        # round), so the previous round's blocks are dead weight: drop
        # them NOW instead of leaving them to the async reference-tracking
        # cleaner. Without this the loop accumulates O(rounds × edges) of
        # MEMORY_AND_DISK blocks, which at the 2 GiB/core scaling-bench
        # sizing forces spill-to-disk churn mid-loop — the graph job was
        # the scaling trilogy's only IO-sensitive workload, and this was
        # the IO. Storage is now bounded by the live round (+ its parent
        # during the one pass that derives it).
        release_stage_checkpoint(old)
        rounds += 1
        edge_counts.append(row["n"])
        sig = (row["n"], row["h"])
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(theoretical bound is O(log^2 n) ≈ 10 for 2^30 nodes) — the "
            "edge set is oscillating, which the alternating algorithm "
            "excludes; treat as a bug, not a data property"
        )
    if metrics_path is not None:
        # convergence observability (the "no silent caps" discipline):
        # rounds-to-fixpoint and the per-round edge counts go to the
        # metrics table — a production run whose round count creeps toward
        # max_rounds is visible before it ever raises
        from .. import metrics

        spark = e.sparkSession
        rows = [("rounds", rounds)] + [
            (f"edges_round_{i}", c) for i, c in enumerate(edge_counts)
        ]
        frame = spark.createDataFrame(rows, "k string, v bigint").select(
            *metrics.metric_frame(operator, "convergence", F.col("k"), F.col("v"))
        )
        metrics.register(metrics_path, frame, key=(operator, "convergence"))
    return e


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 30,
    metrics_path: str | None = None,
    operator: str = "connected_components",
) -> DataFrame:
    """(node, component_id) for every node appearing in ``edges``;
    component_id = the smallest node id in the component (the canonical
    "keep" representative of a duplicate cluster).

    Alternates large-star / small-star until the edge set is a fixpoint —
    at that point the edge list IS the star forest (each non-root node has
    exactly the edge (node, root)); see _converged_star for the loop and
    convergence machinery."""
    star = _converged_star(edges, id_a, id_b, max_rounds, metrics_path, operator)
    # node set off the CHECKPOINTED star input is not enough — roots of
    # singleton-free components appear only on the v side, isolated
    # self-loop-only inputs were filtered; rebuild from the original edges
    nodes = cached(
        edges.select(F.col(id_a).alias("node"))
        .unionByName(edges.select(F.col(id_b).alias("node")))
        .distinct()
    )
    labels = star.select(F.col("u").alias("node"), F.col("v").alias("component_id"))
    return (
        nodes.join(labels, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component_id"), F.col("node")).alias("component_id"),
        )
    )


def dup_clusters(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    metrics_path: str | None = None,
    operator: str = "connected_components",
) -> DataFrame:
    """Full-corpus cluster table: (doc_id, component_id, component_size,
    is_representative) — singletons (docs in no pair) map to themselves
    with size 1. The pipeline's keep/drop surface: keep
    ``is_representative``, drop the rest; component_size feeds dedup-rate
    reporting.

    Joins docs straight to the star forest (no separate node table — docs
    IS the node universe here) and re-canonicalizes the representative to
    the smallest doc PRESENT in docs inside the one size aggregate: if a
    stale/superset pair table names ids absent from the corpus (including
    a component's min), every cluster still keeps exactly one
    is_representative row — "keep representatives, drop the rest" can
    never silently delete a whole cluster. One left join + one
    groupBy(min, count) + one re-join."""
    star = _converged_star(edges, id_a, id_b, max_rounds=30,
                           metrics_path=metrics_path, operator=operator)
    labels = star.select(F.col("u").alias("node"), F.col("v").alias("_root"))
    base = (
        docs.select(F.col(id_col).alias("node"))
        .join(labels, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("_root"), F.col("node")).alias("_root"),
        )
    )
    sizes = base.groupBy("_root").agg(
        F.count(F.lit(1)).alias("component_size"),
        F.min(id_col).alias("component_id"),
    )
    return base.join(sizes, "_root").select(
        id_col,
        "component_id",
        "component_size",
        (F.col(id_col) == F.col("component_id")).alias("is_representative"),
    )


def cluster_split(
    clusters: DataFrame, train_per_mille: int = 800, val_per_mille: int = 100
) -> DataFrame:
    """(doc_id, component_id, split): leakage-safe train/val/test
    assignment — the bucket is a pure function of ``component_id``, so
    every member of a near-dup cluster lands in the SAME split and a
    near-duplicate of a test document can never leak into train (the
    standard contamination failure of per-document hash splits).

    bucket = splitmix64(component_id) mod 1000 (the shared
    make_splitmix64_mod kernel, bit-identical in numpy and the DuckDB
    HUGEINT oracle); split = train if bucket < train_per_mille, val if
    < train_per_mille + val_per_mille, else test. One Arrow projection
    over the cluster table — no shuffle beyond what produced it. NULL
    component ids are excluded up front (no meaningful hash — the
    sample_by_hash convention; dup_clusters never emits one)."""
    from ..functions.udfs import make_splitmix64_mod

    if not (isinstance(train_per_mille, int) and isinstance(val_per_mille, int)):
        raise ValueError(
            "per-mille weights must be ints (fractions like 0.8 would "
            f"silently select ~nothing): {train_per_mille!r}, {val_per_mille!r}"
        )
    if not (0 < train_per_mille and 0 <= val_per_mille
            and train_per_mille + val_per_mille < 1000):
        raise ValueError(
            f"per-mille weights out of range: {train_per_mille}, {val_per_mille}"
        )

    bucket_udf = make_splitmix64_mod(1000)
    b = F.col("_bucket")
    return (
        clusters.filter(F.col("component_id").isNotNull())
        .select(
            "doc_id", "component_id", bucket_udf("component_id").alias("_bucket")
        )
        .select(
            "doc_id",
            "component_id",
            F.when(b < train_per_mille, F.lit("train"))
            .when(b < train_per_mille + val_per_mille, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )
