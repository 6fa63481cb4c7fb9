"""Structured-Streaming tests: file-source micro-batches with availableNow
triggers. Checks (1) the stateful latest-wins change stream converges to the
batch apply_changes result, (2) state carries across separate runs via the
checkpoint, (3) streaming ingest output rows equal the batch kernel's."""

import os

import numpy as np
import pandas as pd

from osmquadtree_spark.operators.changes import apply_changes
from osmquadtree_spark.streaming.changes import apply_changes_stream
from osmquadtree_spark.streaming.ingest import tile_counts_stream, with_cells_stream

CH_SCHEMA = "key bigint, seq bigint, payload double, changetype int"


def _write_batch(spark, path, rows, i):
    pdf = pd.DataFrame(rows, columns=["key", "seq", "payload", "changetype"])
    spark.createDataFrame(pdf, CH_SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, f"b{i}")
    )


def _run_stream(spark, src, chk, sink_name):
    stream = spark.readStream.schema(CH_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    q = (
        apply_changes_stream(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {sink_name}")


def test_stream_matches_batch_apply_changes(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    b0 = [(k, 0, float(k), 0) for k in range(20)]
    b1 = [(k, 1, k * 2.0, 4) for k in range(0, 20, 3)] + [(5, 1, 0.0, 1)]
    b2 = [(k, 2, k * 3.0, 5) for k in range(0, 20, 4)] + [(7, 2, 0.0, 2)]
    _write_batch(spark, src, b0, 0)
    _write_batch(spark, src, b1, 1)
    _write_batch(spark, src, b2, 2)

    out = _run_stream(spark, src, chk, "chsink").toPandas()
    # memory sink in update mode appends every update — last row per key wins
    final = out.sort_values("seq").groupby("key").last().reset_index()
    live = final[~final["is_deleted"]][["key", "payload", "changetype"]]

    main = spark.createDataFrame(pd.DataFrame(b0, columns=["key", "seq", "payload", "changetype"])).drop("seq")
    ch1 = spark.createDataFrame(pd.DataFrame(b1, columns=["key", "seq", "payload", "changetype"])).drop("seq")
    ch2 = spark.createDataFrame(pd.DataFrame(b2, columns=["key", "seq", "payload", "changetype"])).drop("seq")
    want = apply_changes(main, [ch1, ch2], ["key"]).toPandas()

    got = live.sort_values("key").reset_index(drop=True)
    want = want[["key", "payload", "changetype"]].sort_values("key").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"key": "int64"}), want.astype({"key": "int64"}), check_dtype=False)
    # tombstoned keys are flagged, not silently dropped
    assert set(final[final["is_deleted"]]["key"]) == {5, 7}


def test_stream_state_survives_restart(spark, tmp_path):
    src, chk, out = str(tmp_path / "src"), str(tmp_path / "chk"), str(tmp_path / "out")

    def run():
        stream = spark.readStream.schema(CH_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src + "/*")

        def sink(bdf, bid):
            if bdf.count():
                bdf.write.mode("append").parquet(out)

        q = (
            apply_changes_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(spark, src, [(1, 0, 10.0, 0), (2, 0, 20.0, 0)], 0)
    run()
    r1 = spark.read.parquet(out).toPandas()
    assert len(r1) == 2

    # second run from the SAME checkpoint: only new files are processed and
    # the keyed state still remembers seq 0
    _write_batch(spark, src, [(1, 1, 11.0, 4)], 1)
    _write_batch(spark, src, [(1, 0, 99.0, 4)], 2)  # stale seq → ignored by state
    run()
    r2 = spark.read.parquet(out).toPandas()
    upd = r2.sort_values("seq").groupby("key").last()
    assert upd.loc[1, "payload"] == 11.0  # stale seq-0 row did not win
    assert upd.loc[2, "payload"] == 20.0


def test_stream_ingest_matches_batch_kernel(spark, tmp_path):
    from osmquadtree_spark.functions.udfs import make_qt_calculate

    src = str(tmp_path / "elems")
    rng = np.random.default_rng(11)
    n = 2000
    lon = rng.integers(-1700000000, 1700000000, n)
    lat = rng.integers(-800000000, 800000000, n)
    pdf = pd.DataFrame({"elem_id": np.arange(n), "minx": lon, "miny": lat, "maxx": lon, "maxy": lat})
    schema = "elem_id bigint, minx bigint, miny bigint, maxx bigint, maxy bigint"
    spark.createDataFrame(pdf, schema).coalesce(2).write.parquet(src + "/b0")

    stream = spark.readStream.schema(schema).parquet(src + "/*")
    from osmquadtree_spark.kernels import quadtree as qtk

    # group table: root + the four depth-1 tiles (A B C D)
    gqt = np.sort(np.array(
        [0] + [qtk.from_string_scalar(s) for s in "ABCD"], dtype=np.int64
    ))
    enriched = with_cells_stream(stream, gqt)
    q = (
        tile_counts_stream(enriched)
        .writeStream.format("memory").queryName("tilecounts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.group_qt: r.row_count for r in spark.sql("SELECT * FROM tilecounts").collect()}

    batch = spark.read.parquet(src + "/b0")
    bdf = with_cells_stream(batch, gqt).groupBy("group_qt").count()
    want = {r.group_qt: r["count"] for r in bdf.collect()}
    assert got == want
    assert sum(got.values()) == n


def test_stream_tiebreak_chunk_invariant(spark, tmp_path):
    """Equal-seq rows split ACROSS micro-batches must elect the same
    winner as when they share one (r4 review: a strict seq comparison
    handed ties to whichever chunk arrived first). Winner at equal seq =
    max (changetype, payload), matching the batch window's desc order."""
    src, chk = str(tmp_path / "s1"), str(tmp_path / "c1")
    src2, chk2 = str(tmp_path / "s2"), str(tmp_path / "c2")
    # same-chunk: both seq-5 rows in one file
    _write_batch(spark, src, [(1, 5, 2.0, 1), (1, 5, 1.0, 0)], 0)
    same = _run_stream(spark, src, chk, "tb_same").toPandas()
    # split: the LOWER-ranked row arrives in a LATER micro-batch
    _write_batch(spark, src2, [(1, 5, 2.0, 1)], 0)
    _write_batch(spark, src2, [(1, 5, 1.0, 0)], 1)
    split = _run_stream(spark, src2, chk2, "tb_split").toPandas()
    w_same = same.sort_values("seq").groupby("key").last()
    w_split = split.sort_values("seq").groupby("key").last()
    assert bool(w_same.loc[1, "is_deleted"]) == bool(w_split.loc[1, "is_deleted"]) == True  # noqa: E712
    assert w_same.loc[1, "payload"] == w_split.loc[1, "payload"] == 2.0


def test_stream_null_payload_stays_null_and_loses_ties(spark, tmp_path):
    """NULL payloads must survive as NULL (not NaN — the batch path
    keeps NULL and a sink MERGE must too) and must LOSE an equal-
    (seq, changetype) tie to any numeric payload (the batch window's
    descending order is NULLS LAST)."""
    src, chk = str(tmp_path / "sn"), str(tmp_path / "cn")
    # key 1: lone NULL payload row → emitted payload must be NULL
    # key 2: NULL and 7.0 at equal (seq, ct) → 7.0 wins
    pdf = pd.DataFrame(
        {"key": [1, 2, 2], "seq": [3, 4, 4],
         "payload": [None, None, 7.0], "changetype": [0, 4, 4]}
    )
    spark.createDataFrame(pdf, CH_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "b0"))
    out = _run_stream(spark, src, chk, "nullsink").toPandas()
    last = out.sort_values("seq").groupby("key").last()
    assert pd.isna(last.loc[1, "payload"])
    # Spark distinguishes NULL from NaN: assert the sink column is NULL
    spark_rows = {
        r["key"]: r for r in
        spark.sql("SELECT key, payload, isnan(payload) AS nan FROM nullsink").collect()
        if r is not None
    }
    # payload is NULL (None), not NaN (isnan(NULL) is false in Spark SQL;
    # a NaN payload would make it true)
    assert spark_rows[1]["payload"] is None and spark_rows[1]["nan"] is False
    assert last.loc[2, "payload"] == 7.0


def test_stream_neg_inf_beats_null_across_chunks(spark, tmp_path):
    """A genuine -inf payload must beat NULL at an equal (seq, changetype)
    tie even when the rows arrive in SEPARATE micro-batches (r4 review: a
    -inf sentinel for NULL in the state comparison tied with real -inf,
    so the winner depended on chunk placement; the (is_numeric, value)
    key ranks NULL strictly below -inf, matching the in-chunk sort)."""
    ninf = float("-inf")
    results = []
    for tag, batches in (
        ("same", [[(1, 5, None, 0), (1, 5, ninf, 0)]]),
        ("null_then_inf", [[(1, 5, None, 0)], [(1, 5, ninf, 0)]]),
        ("inf_then_null", [[(1, 5, ninf, 0)], [(1, 5, None, 0)]]),
    ):
        src, chk = str(tmp_path / f"s_{tag}"), str(tmp_path / f"c_{tag}")
        for i, rows in enumerate(batches):
            _write_batch(spark, src, rows, i)
        out = _run_stream(spark, src, chk, f"ninf_{tag}").toPandas()
        last = out.sort_values("seq").groupby("key").last()
        results.append(last.loc[1, "payload"])
    assert all(r == ninf for r in results), results
