"""Unit tests for the incremental-update operators (update.cpp semantics):
tombstones on tile moves, context-row erasure, delete routing, and the
null-batch guard. Full-value oracle parity runs through the driver gate
(update_change_qts / update_change_tiles)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtree_spark.kernels import quadtree as qtk
from osmquadtree_spark.operators.update import calc_change_qts, find_change_tiles, missing_ref_count

NODE_SCHEMA = "node_id bigint, lon bigint, lat bigint, changetype int, old_qt bigint"
WAY_SCHEMA = "way_id bigint, refs array<bigint>, changetype int, old_qt bigint"
REL_SCHEMA = (
    "rel_id bigint, members array<struct<m_type:int,m_ref:bigint>>, changetype int, old_qt bigint"
)
ELEM_SCHEMA = "element_type int, id bigint, qt bigint, changetype int"
ALLOC_SCHEMA = "element_type int, id bigint, alloc bigint"


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_calc_change_qts_statuses(spark):
    a = qtk.from_string_scalar("A")
    nodes = _df(spark, [
        (1, 100, 100, 4, 7),          # Modify → point qt
        (2, -100000000, 50000000, 0, 99),  # Normal context, qt will change → Unchanged
        (3, 200, 200, 0, None),       # Normal, not referenced → dropped (no new qt)
        (4, 300, 300, 1, 42),         # Delete → keeps old qt
    ], NODE_SCHEMA)
    ways = _df(spark, [(10, [1, 2], 4, 5)], WAY_SCHEMA)
    rels = _df(spark, [(20, [{"m_type": 1, "m_ref": 10}], 4, 6)], REL_SCHEMA)
    res = calc_change_qts(nodes, ways, rels)

    n = {r.node_id: r for r in res["nodes"].collect()}
    assert 3 not in n                      # erased "extra node"
    assert n[4].qt == 42 and n[4].changetype == 1
    assert n[2].changetype == 3            # Normal → Unchanged with new cell
    w = res["ways"].collect()[0]
    assert w.changetype == 4 and w.qt >= 0
    # node qts under the way fold are ancestors-or-equal of the way's cell
    assert qtk.common_scalar(n[1].qt, w.qt) == n[1].qt
    r = res["relations"].collect()[0]
    assert r.qt == w.qt                    # single way member → same cell


def test_unresolvable_way_dropped_and_counted(spark):
    nodes = _df(spark, [(1, 0, 0, 4, None)], NODE_SCHEMA)
    ways = _df(spark, [(10, [777, 778], 4, 5)], WAY_SCHEMA)
    rels = _df(spark, [], REL_SCHEMA)
    assert missing_ref_count(nodes, ways) == 2
    res = calc_change_qts(nodes, ways, rels)
    assert res["ways"].count() == 0        # no derivable cell → skipped


def test_find_change_tiles_tombstones(spark):
    a = qtk.from_string_scalar("A")
    b = qtk.from_string_scalar("B")
    gqt = np.sort(np.asarray([a, b], dtype=np.int64))
    aa = qtk.from_string_scalar("AA")
    bb = qtk.from_string_scalar("BB")
    elements = _df(spark, [
        (0, 1, aa, 4),   # moved: was in tile B, now tile A → tombstone in B
        (0, 2, bb, 4),   # stayed in tile B
        (0, 3, aa, 5),   # created: no orig alloc → no tombstone
        (0, 4, None, 1), # deleted: routed to orig tile with qt 0
    ], ELEM_SCHEMA)
    allocs = _df(spark, [(0, 1, b), (0, 2, b), (0, 4, a)], ALLOC_SCHEMA)
    out = find_change_tiles(elements, allocs, gqt)
    rows = {(r.element_type, r.id, r.changetype): (r.tile_qt, r.qt) for r in out.collect()}
    assert rows[(0, 1, 4)] == (a, aa)          # survivor in new tile
    assert rows[(0, 1, 2)] == (b, 0)           # tombstone in vacated tile
    assert rows[(0, 2, 4)] == (b, bb)          # no move → no tombstone
    assert (0, 2, 2) not in rows
    assert rows[(0, 3, 5)] == (a, aa)
    assert rows[(0, 4, 1)] == (a, 0)           # delete → orig tile, qt 0
    assert len(rows) == 5


def test_assign_group_rejects_nulls(spark):
    """A NULL in the batch coerces Arrow→pandas to float64, silently
    corrupting depth bits of every qt > 2^53 — must fail loudly."""
    from osmquadtree_spark.operators.sortblocks import make_assign_group_udf
    from py4j.protocol import Py4JJavaError

    gqt = np.asarray([0], dtype=np.int64)
    df = spark.createDataFrame(pd.DataFrame({"qt": [1.0, None]})).select(
        F.col("qt").cast("bigint").alias("qt")
    )
    assign = make_assign_group_udf(spark, gqt)
    with pytest.raises(Exception, match="NULL cell id|PythonException|assign_group"):
        df.select(assign(F.col("qt"))).collect()


def test_element_diff_reasons(spark):
    """compare_element precedence (count_python.cpp:114-186): first failing
    check wins; tags compare sorted; missing sides are NoLeft/NoRight."""
    from osmquadtree_spark.operators.stats import element_diff

    schema = (
        "element_type int, id bigint, version int, lon bigint, lat bigint, "
        "tags array<struct<key:string,val:string>>, qt bigint, changetype int"
    )
    left = spark.createDataFrame(
        [
            (0, 1, 1, 10, 10, [("a", "1"), ("b", "2")], 100, 0),   # same (tags order differs right)
            (0, 2, 1, 10, 10, [("a", "1")], 100, 0),               # info diff beats tag diff
            (0, 3, 1, 10, 10, [("a", "1")], 100, 0),               # tags diff
            (0, 4, 1, 10, 10, [("a", "1")], 100, 0),               # lonlat diff
            (0, 5, 1, 10, 10, [("a", "1")], 100, 0),               # qt diff
            (0, 6, 1, 10, 10, [("a", "1")], 100, 0),               # changetype diff
            (0, 7, 1, 10, 10, [("a", "1")], 100, 0),               # right missing
        ],
        schema,
    )
    right = spark.createDataFrame(
        [
            (0, 1, 1, 10, 10, [("b", "2"), ("a", "1")], 100, 0),
            (0, 2, 2, 10, 10, [("a", "2")], 100, 0),
            (0, 3, 1, 10, 10, [("a", "2")], 100, 0),
            (0, 4, 1, 11, 10, [("a", "1")], 100, 0),
            (0, 5, 1, 10, 10, [("a", "1")], 101, 0),
            (0, 6, 1, 10, 10, [("a", "1")], 100, 4),
            (0, 8, 1, 10, 10, [("a", "1")], 100, 0),               # left missing
        ],
        schema,
    )
    got = {r.id: r.reason for r in element_diff(left, right).collect()}
    assert got == {
        2: "Info", 3: "Tags", 4: "LonLat", 5: "Quadtree",
        6: "ChangeType", 7: "NoRight", 8: "NoLeft",
    }
    full = {r.id: r.reason for r in element_diff(left, right, include_same=True).collect()}
    assert full[1] == "Same"


def test_same_file_modify_then_delete_deletes(spark):
    """r3 advice: the reference applies change rows in FILE ORDER with
    last-wins, so a <modify> followed by a <delete> for the same key in
    ONE change file must delete — the old changetype-desc fallback
    preferred Modify(4) over Delete(1) and resurrected the element.
    file_pos (captured by sources/osc.py) is the default tiebreak."""
    from osmquadtree_spark.operators.changes import apply_changes
    from osmquadtree_spark.sources.osc import osc_dataframes

    osc = """<osmChange>
      <modify><node id="7" lon="1.0" lat="2.0" version="3"/></modify>
      <delete><node id="7" lon="1.0" lat="2.0" version="4"/></delete>
      <modify><node id="8" lon="5.0" lat="6.0" version="2"/></modify>
    </osmChange>"""
    ch = osc_dataframes(spark, osc)["nodes"]
    main = spark.createDataFrame(
        [(7, 0, 0, 1, 0, 0, [], -1), (8, 0, 0, 1, 0, 0, [], -1), (9, 0, 0, 1, 0, 0, [], -1)],
        ch.schema,
    )
    out = apply_changes(main, [ch], ["node_id"])
    got = {r.node_id for r in out.collect()}
    assert got == {8, 9}  # 7 deleted (delete is later in file order)
    # and the surviving 8 carries the modified coordinates
    row8 = out.filter(F.col("node_id") == 8).first()
    assert row8.lon == 50000000 and row8.version == 2


def test_inmem_resolution_matches_distributed(spark, sf_dir):
    """The driver-side diff resolution (calc_change_qts_inmem — the
    reference's in-process update shape) must be BIT-IDENTICAL to the
    distributed operator on the same change set: same kernels, same
    resolution CASEs, same 5-pass closure order."""
    from osmquadtree_spark.operators.update import calc_change_qts_inmem
    from osmquadtree_spark.sources.qts_store import read_change_store

    ch = read_change_store(spark, sf_dir)
    dist = calc_change_qts(ch["ch_nodes"], ch["ch_ways"], ch["ch_rels"])
    # toArrow/integer_object_nulls, NOT toPandas: the nullable old_qt
    # column holds cell ids above 2^53, which plain toPandas would round
    # through float64 — the twin refuses that dtype (TypeError) by design
    inmem = calc_change_qts_inmem(
        spark,
        *(ch[k].toArrow().to_pandas(integer_object_nulls=True)
          for k in ("ch_nodes", "ch_ways", "ch_rels")),
    )
    for kind, idc in (("nodes", "node_id"), ("ways", "way_id"), ("relations", "rel_id")):
        a = {(r[idc], r.qt, r.changetype) for r in dist[kind].collect()}
        b = {(r[idc], r.qt, r.changetype) for r in inmem[kind].collect()}
        assert a == b, (kind, len(a), len(b), list(a ^ b)[:5])


def test_inmem_partial_change_sets(spark):
    """Review regression (r4): a change set whose intermediate id→qt
    tables are EMPTY while the inputs are not — nodes-only diffs, diffs
    whose ways are all deletes, ways with no resolvable refs — must
    resolve, not crash on empty-array indexing; and a duplicate-id table
    (raw non-deduplicated .osc shape) must raise the documented ValueError
    so callers route it to the distributed operator."""
    import pandas as pd

    from osmquadtree_spark.operators.update import calc_change_qts_inmem

    # nodes-only diff: no ways at all
    n = pd.DataFrame(
        {"node_id": [1, 2], "lon": [100, 200], "lat": [100, 200],
         "changetype": [4, 1], "old_qt": [7, 42]}
    )
    empty_w = pd.DataFrame({"way_id": [], "refs": [], "changetype": [], "old_qt": []})
    empty_r = pd.DataFrame({"rel_id": [], "members": [], "changetype": [], "old_qt": []})
    res = calc_change_qts_inmem(spark, n, empty_w, empty_r)
    got = {r.node_id: (r.qt, r.changetype) for r in res["nodes"].collect()}
    assert got[2] == (42, 1) and got[1][0] >= 0 and got[1][1] == 4

    # active way with no resolvable refs: way skipped, nodes still resolve
    w = pd.DataFrame(
        {"way_id": [10], "refs": [[777, 778]], "changetype": [4], "old_qt": [5]}
    )
    res = calc_change_qts_inmem(spark, n, w, empty_r)
    assert res["ways"].count() == 0
    assert res["nodes"].count() == 2

    # ways all deletes: wq empty but ways table non-empty
    wdel = pd.DataFrame(
        {"way_id": [10], "refs": [[1, 2]], "changetype": [1], "old_qt": [5]}
    )
    res = calc_change_qts_inmem(spark, n, wdel, empty_r)
    assert {r.way_id: (r.qt, r.changetype) for r in res["ways"].collect()} == {10: (5, 1)}

    # duplicate ids → documented ValueError (distributed path handles them)
    dup = pd.DataFrame(
        {"node_id": [1, 1], "lon": [0, 0], "lat": [0, 0],
         "changetype": [5, 4], "old_qt": [None, None]}
    )
    with pytest.raises(ValueError, match="duplicate node_id"):
        calc_change_qts_inmem(spark, dup, empty_w, empty_r)


def test_null_old_normal_row_dropped_on_both_paths(spark):
    """Review regression (r4): a Normal (changetype 0) row ABSENT from the
    stored qts (old_qt NULL) with a derivable new cell. The distributed
    resolve dropped it via SQL three-valued `new == old`; the in-mem twin's
    Python equality kept it — so the _UPDATE_INMEM_MAX_ROWS gate flipped
    the result. Both paths (and the DuckDB oracle, whose WHERE NOT shares
    the SQL semantics) must drop it."""
    from osmquadtree_spark.operators.update import calc_change_qts_inmem

    nodes = _df(spark, [
        (1, 100, 100, 0, None),   # Normal, no stored cell, derivable point qt
        (2, 200, 200, 4, None),   # Modify survivor: kept regardless of old
    ], NODE_SCHEMA)
    empty_w = _df(spark, [], WAY_SCHEMA)
    empty_r = _df(spark, [], REL_SCHEMA)

    dist = calc_change_qts(nodes, empty_w, empty_r)
    assert {r.node_id for r in dist["nodes"].collect()} == {2}

    inmem = calc_change_qts_inmem(
        spark, nodes.toPandas(), empty_w.toPandas(), empty_r.toPandas()
    )
    assert {r.node_id for r in inmem["nodes"].collect()} == {2}


def test_inmem_refuses_inexact_float_qt_columns(spark):
    """Review regression (r4): a nullable bigint collected via plain
    toPandas arrives as float64; qt path digits live above bit 53, so
    values round silently. The twin must refuse, not diverge from the
    distributed path (queries._resolved_elements collects exactly via
    toArrow/integer_object_nulls)."""
    from osmquadtree_spark.operators.update import calc_change_qts_inmem

    big = float((3 << 61) | 5)  # rounds in float64
    n = pd.DataFrame(
        {"node_id": [1, 2], "lon": [100, 200], "lat": [100, 200],
         "changetype": [4, 1], "old_qt": [big, np.nan]}
    )
    empty_w = pd.DataFrame({"way_id": [], "refs": [], "changetype": [], "old_qt": []})
    empty_r = pd.DataFrame({"rel_id": [], "members": [], "changetype": [], "old_qt": []})
    with pytest.raises(TypeError, match="float64"):
        calc_change_qts_inmem(spark, n, empty_w, empty_r)
    # small float values are exact — accepted (pd.isna/int() handles them)
    n_ok = n.assign(old_qt=[7.0, np.nan])
    res = calc_change_qts_inmem(spark, n_ok, empty_w, empty_r)
    assert res["nodes"].count() == 2


def test_inmem_missing_ref_policy(spark):
    """The reference hard-fails a change set whose ways reference more
    than 10 nodes absent from the change map (update.cpp:548-556) — the
    twin restates that as the opt-in ``max_missing_refs``; the default
    skip-and-count path surfaces the count through ``missing_out`` (which
    queries._resolved_elements commits as a run metric)."""
    from osmquadtree_spark.operators.update import calc_change_qts_inmem

    n = pd.DataFrame(
        {"node_id": [1], "lon": [100], "lat": [100],
         "changetype": [4], "old_qt": [7]}
    )
    w = pd.DataFrame(
        {"way_id": [10], "refs": [[1] + list(range(900, 911))],
         "changetype": [4], "old_qt": [5]}
    )
    empty_r = pd.DataFrame({"rel_id": [], "members": [], "changetype": [], "old_qt": []})
    with pytest.raises(ValueError, match="missing from the change map"):
        calc_change_qts_inmem(spark, n, w, empty_r, max_missing_refs=10)
    out: dict = {}
    res = calc_change_qts_inmem(spark, n, w, empty_r, missing_out=out)
    assert out["missing_way_refs"] == 11
    assert res["ways"].count() == 1  # bbox from the one resolvable ref


def test_inmem_refuses_nan_coords(spark):
    """Review regression (r4): float64 NaN lon/lat (a NULL-coord delete
    row via plain toPandas) would cast to INT64_MIN through
    to_numpy(int64) and poison every way bbox folding that node — the
    twin must refuse NaN in id/coord columns (old_qt stays NaN-tolerant:
    it flows through pd.isna-aware resolution)."""
    from osmquadtree_spark.operators.update import calc_change_qts_inmem

    n = pd.DataFrame(
        {"node_id": [1, 2], "lon": [100.0, np.nan], "lat": [100, 200],
         "changetype": [4, 1], "old_qt": [7, 9]}
    )
    empty_w = pd.DataFrame({"way_id": [], "refs": [], "changetype": [], "old_qt": []})
    empty_r = pd.DataFrame({"rel_id": [], "members": [], "changetype": [], "old_qt": []})
    with pytest.raises(TypeError, match="NaN"):
        calc_change_qts_inmem(spark, n, empty_w, empty_r)


def test_dedupe_last_wins_uses_file_pos():
    """Last-occurrence-wins must follow the .osc DOCUMENT order
    (file_pos), not the collect order a multi-part parquet scan happens
    to produce; duplicates without file_pos are refused."""
    from osmquadtree_spark.operators.update import dedupe_last_wins

    # collect order REVERSED vs document order: row with file_pos=5
    # (delete) is the later document row and must win over the modify
    pdf = pd.DataFrame(
        {"node_id": [1, 1, 2], "changetype": [1, 4, 4],
         "file_pos": [5, 2, 3]}
    )
    out = dedupe_last_wins(pdf, "node_id")
    assert out.set_index("node_id").loc[1, "changetype"] == 1
    assert len(out) == 2
    # no duplicates: passthrough, file_pos not required
    solo = pd.DataFrame({"node_id": [1, 2], "changetype": [4, 4]})
    assert dedupe_last_wins(solo, "node_id") is solo
    with pytest.raises(ValueError, match="file_pos"):
        dedupe_last_wins(pdf.drop(columns=["file_pos"]), "node_id")


def test_swap_dir_never_half_deleted(tmp_path):
    """fsutil.swap_dir: the destination is either the old tree, absent
    for the instant between renames, or the new tree — never a
    partially-deleted directory; a pre-moved stale dir (concurrent
    swapper) is tolerated."""
    from osmquadtree_spark.fsutil import swap_dir

    dst = tmp_path / "store"
    dst.mkdir()
    (dst / "old.txt").write_text("old")
    src = tmp_path / "store.tmp"
    src.mkdir()
    (src / "new.txt").write_text("new")
    swap_dir(str(src), str(dst))
    assert (dst / "new.txt").read_text() == "new"
    assert not (dst / "old.txt").exists()
    assert not src.exists()
    # an unrenameable destination surfaces OSError to the caller (the
    # qts store resolves it via the fingerprint; exports check content)
    src2 = tmp_path / "again.tmp"
    src2.mkdir()
    with pytest.raises(OSError):
        swap_dir(str(src2), str(tmp_path / "no-such-parent" / "store"))
    assert src2.exists()  # failed swap leaves the tmp tree for the caller


def test_atomic_export_swallows_only_race_errno(spark, tmp_path, monkeypatch):
    """atomic_export tolerates ONLY the concurrent-winner rename signature
    (EEXIST/ENOTEMPTY with the destination present — identical content by
    determinism); any other OSError must surface, because the destination
    may hold a STALE export that the DuckDB soundness oracle would then
    silently re-score (r4 review finding)."""
    import errno

    from osmquadtree_spark import fsutil, metrics

    df = spark.range(3).selectExpr("id AS id_a", "id + 1 AS id_b")
    dest = tmp_path / "cands"

    def raising(code):
        def _swap(tmp, path):
            ex = OSError(code, "boom")
            ex.errno = code
            raise ex
        return _swap

    # benign race: dest exists + ENOTEMPTY → swallowed, old content served
    dest.mkdir()
    (dest / "marker").write_text("x")
    monkeypatch.setattr(fsutil, "swap_dir", raising(errno.ENOTEMPTY))
    metrics.atomic_export(df, str(dest))
    assert (dest / "marker").exists()

    # anything else (EACCES) → surfaces even though dest exists
    monkeypatch.setattr(fsutil, "swap_dir", raising(errno.EACCES))
    with pytest.raises(OSError):
        metrics.atomic_export(df, str(dest))

    # sanity: the real swap still works end-to-end
    monkeypatch.undo()
    metrics.atomic_export(df, str(dest))
    assert not (dest / "marker").exists()
    assert spark.read.parquet(str(dest)).count() == 3
