"""operators/asof.py — as-of join semantics on controlled frames, plus a
brute-force equivalence sweep against a numpy oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtree_spark.operators.asof import asof_join


def _probes(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts"]),
        "event_id bigint, user_id bigint, ts timestamp_ntz",
    )


def _refs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_id"]),
        "user_id bigint, ts timestamp_ntz, event_id bigint",
    )


def _t(s):
    return pd.Timestamp(f"2024-01-01 {s}")


def test_asof_core_semantics(spark):
    """One controlled frame exercises every rule: most-recent-prior wins,
    a ref at exactly probe.ts matches (>= convention), equal-ts refs
    resolve to the greatest ref id, no-prior-ref probes keep NULLs, and
    every probe emits exactly once (left completeness)."""
    probes = _probes(
        spark,
        [
            (1, 10, _t("01:00")),  # after refs 100 (00:30) -> 100
            (2, 10, _t("00:30")),  # exactly at ref 100 -> 100 (>=)
            (3, 10, _t("00:10")),  # before every ref -> NULL
            (4, 20, _t("02:00")),  # two refs at 01:00 -> greatest id 202
            (5, 30, _t("05:00")),  # user with no refs at all -> NULL
        ],
    )
    refs = _refs(
        spark,
        [
            (10, _t("00:30"), 100),
            (10, _t("02:00"), 101),  # later than probe 1 -> invisible to it
            (20, _t("01:00"), 201),
            (20, _t("01:00"), 202),
        ],
    )
    got = {
        r.event_id: (r.ref_event_id, r.ref_ts)
        for r in asof_join(probes, refs, on=["user_id"]).collect()
    }
    assert got == {
        1: (100, _t("00:30")),
        2: (100, _t("00:30")),
        3: (None, None),
        4: (202, _t("01:00")),
        5: (None, None),
    }


def test_asof_tolerance_nulls_not_replaces(spark):
    """A match older than the tolerance is nulled, NOT replaced by an even
    older in-tolerance ref (there is none by construction): pandas
    merge_asof(tolerance=...) semantics."""
    probes = _probes(spark, [(1, 10, _t("03:00")), (2, 10, _t("01:30"))])
    refs = _refs(spark, [(10, _t("01:00"), 100)])
    got = {
        r.event_id: r.ref_event_id
        for r in asof_join(
            probes, refs, on=["user_id"], tolerance="1 hour"
        ).collect()
    }
    assert got == {1: None, 2: 100}  # 2h gap nulled, 30m gap kept


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized equivalence vs pandas.merge_asof on a 600-probe corpus
    (unique ref timestamps per user, so the tie rule cannot diverge)."""
    rng = np.random.RandomState(7)
    users = rng.randint(0, 9, 600)
    p = pd.DataFrame(
        {
            "event_id": np.arange(600, dtype=np.int64),
            "user_id": users.astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, 600), unit="s"),
        }
    )
    r = (
        pd.DataFrame(
            {
                "user_id": rng.randint(0, 9, 200).astype(np.int64),
                "ts": pd.Timestamp("2024-01-01")
                + pd.to_timedelta(rng.randint(0, 10**6, 200), unit="s"),
                "event_id": np.arange(1000, 1200, dtype=np.int64),
            }
        )
        .drop_duplicates(["user_id", "ts"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        p.sort_values("ts"),
        r.sort_values("ts").rename(columns={"event_id": "ref_event_id"}),
        on="ts",
        by="user_id",
        tolerance=pd.Timedelta("6 hours"),
    )
    want_map = dict(
        zip(want["event_id"], [None if pd.isna(v) else int(v) for v in want["ref_event_id"]])
    )
    got = {
        row.event_id: row.ref_event_id
        for row in asof_join(
            _probes(spark, list(p.itertuples(index=False, name=None))),
            _refs(
                spark,
                list(r[["user_id", "ts", "event_id"]].itertuples(index=False, name=None)),
            ),
            on=["user_id"],
            tolerance="6 hours",
        ).collect()
    }
    assert got == want_map


def test_asof_one_shuffle_plan(spark):
    """Scale-shape gate: the plan contains exactly ONE exchange below the
    window (the union is shuffled once on the key; neither input is
    re-shuffled separately) and no join operator at all."""
    probes = _probes(spark, [(1, 10, _t("01:00"))])
    refs = _refs(spark, [(10, _t("00:30"), 100)])
    plan = asof_join(probes, refs, on=["user_id"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_null_ref_payload_stays_atomic(spark):
    """A NULL in a ref payload column must NOT be backfilled from an older
    ref row: the carried ref is one atomic struct, so the latest ref wins
    wholesale (regression: per-column last(ignorenulls) once emitted a
    mixed match of two different ref rows)."""
    probes = _probes(spark, [(1, 10, _t("03:00"))])
    refs = _refs(spark, [(10, _t("01:00"), 5), (10, _t("02:00"), None)])
    [row] = asof_join(probes, refs, on=["user_id"]).collect()
    assert (row.ref_event_id, row.ref_ts) == (None, _t("02:00"))
