"""Quadtree kernel contract tests (reference: quadtree.cpp:33-262).

The scalar functions are straight ports used as the oracle; the vectorized
numpy kernels and the DuckDB SQL restatements must agree bit-for-bit.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from osmquadtree_spark.functions import sql_oracle as so
from osmquadtree_spark.kernels import quadtree as qtk


def _random_boxes(rng, n=5000):
    lon = rng.integers(-1800000000, 1800000000, n)
    lat = rng.integers(-850000000, 850000000, n)
    dl = (rng.integers(0, 2000000, n) * (rng.random(n) < 0.5)).astype(np.int64)
    dm = (rng.integers(0, 2000000, n) * (rng.random(n) < 0.5)).astype(np.int64)
    maxx = np.minimum(lon + dl, 1799999999)
    maxy = np.minimum(lat + dm, 849999999)
    # midline straddlers: boxes crossing x=0 / y=0 exercise the buffer rules
    k = n // 10
    lon[:k] = rng.integers(-100000, 100000, k)
    maxx[:k] = lon[:k] + rng.integers(0, 300000, k)
    lat[k : 2 * k] = rng.integers(-100000, 100000, k)
    maxy[k : 2 * k] = lat[k : 2 * k] + rng.integers(0, 300000, k)
    return lon, lat, maxx, maxy


# -- golden vectors from the documented encoding (quadtree.cpp:105-257) -------


def test_encoding_golden():
    # depth in low 5 bits, digits 2-bit from bit 61; A=0,B=1,C=2,D=3
    assert qtk.from_string_scalar("") == 0
    assert qtk.string_scalar(0) == ""
    assert qtk.from_string_scalar("A") == 1
    assert qtk.from_string_scalar("B") == (1 << 61) + 1
    assert qtk.from_string_scalar("D") == (3 << 61) + 1
    assert qtk.from_string_scalar("BCD") == (1 << 61) + (2 << 59) + (3 << 57) + 3
    assert qtk.string_scalar((1 << 61) + (2 << 59) + (3 << 57) + 3) == "BCD"
    assert qtk.string_scalar(-1) == "NULL"
    # numeric order == DFS preorder: parent < its children < next sibling
    a = qtk.from_string_scalar("B")
    assert a < qtk.from_string_scalar("BA") < qtk.from_string_scalar("BD") < qtk.from_string_scalar("C")


def test_quadrant_golden():
    # whole-planet box → root
    assert qtk.calculate_scalar(-1800000000, -900000000, 1800000000, 900000000) == 0
    # clean quadrant points at depth 17: NW=A, NE=B, SW=C, SE=D
    for lon, lat, digit in [(-900000000, 450000000, "A"), (900000000, 450000000, "B"),
                            (-900000000, -450000000, "C"), (900000000, -450000000, "D")]:
        q = qtk.calculate_scalar(lon, lat, lon, lat, 0.05, 17)
        assert qtk.string_scalar(q)[0] == digit
        assert q & 31 == 17
    # invalid box
    assert qtk.calculate_scalar(10, 10, 5, 5) == -1
    # out of range
    assert qtk.calculate_scalar(-2000000000, 0, -1950000000, 10) == 0  # findQuad -1 at root → qt 0


def test_round_and_common_scalar():
    q = qtk.from_string_scalar("BCDA")
    assert qtk.round_scalar(q, 2) == qtk.from_string_scalar("BC")
    assert qtk.round_scalar(q, 9) == q
    assert qtk.common_scalar(-1, q) == q
    assert qtk.common_scalar(q, -1) == q
    assert qtk.common_scalar(q, q) == q
    a = qtk.from_string_scalar("BCA")
    b = qtk.from_string_scalar("BCDD")
    assert qtk.common_scalar(a, b) == qtk.from_string_scalar("BC")
    assert qtk.common_scalar(qtk.from_string_scalar("A"), qtk.from_string_scalar("D")) == 0


def test_lca_min_max_theorem():
    rng = np.random.default_rng(1915205356)
    """common(min(S), max(S)) == fold(common, S) — the property that turns the
    reference's pairwise fold (qtstore.cpp:43-55) into a min/max aggregate."""
    lon, lat, maxx, maxy = _random_boxes(rng, 3000)
    qts = qtk.calculate(lon, lat, maxx, maxy)
    qts = qts[qts >= 0]
    for size in (2, 3, 7, 20):
        for i in range(0, len(qts) - size, max(1, len(qts) // 50)):
            s = qts[i : i + size]
            fold = -1
            for v in s:
                fold = qtk.common_scalar(fold, int(v))
            mm = qtk.common_scalar(int(s.min()), int(s.max()))
            assert fold == mm


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(547732359)
    lon, lat, maxx, maxy = _random_boxes(rng)
    for depth in (17, 18):
        vec = qtk.calculate(lon, lat, maxx, maxy, 0.05, depth)
        scal = np.array(
            [qtk.calculate_scalar(int(a), int(b), int(c), int(d), 0.05, depth)
             for a, b, c, d in zip(lon, lat, maxx, maxy)]
        )
        assert np.array_equal(vec, scal)


def test_duckdb_cte_matches_scalar():
    rng = np.random.default_rng(484275823)
    lon, lat, maxx, maxy = _random_boxes(rng, 3000)
    scal = np.array(
        [qtk.calculate_scalar(int(a), int(b), int(c), int(d), 0.05, 17)
         for a, b, c, d in zip(lon, lat, maxx, maxy)]
    )
    con = duckdb.connect()
    con.register("pts", pd.DataFrame(
        {"elem_id": np.arange(len(lon)), "minx": lon, "miny": lat, "maxx": maxx, "maxy": maxy}))
    sql = so.calculate_cte("SELECT * FROM pts", "elem_id", 0.05, 17)
    got = con.sql(sql + " ORDER BY elem_id").fetchnumpy()["qt"]
    assert np.array_equal(got, scal)


def test_common_vectorized_and_sql():
    rng = np.random.default_rng(1241702676)
    lon, lat, maxx, maxy = _random_boxes(rng, 4000)
    qts = qtk.calculate(lon, lat, maxx, maxy)
    a = qts.copy()
    b = np.roll(qts, 1)
    a[::17] = -1
    scal = np.array([qtk.common_scalar(int(x), int(y)) for x, y in zip(a, b)])
    assert np.array_equal(qtk.common(a, b), scal)
    con = duckdb.connect()
    con.register("prs", pd.DataFrame({"a": a, "b": b}))
    got = con.sql(f"SELECT {so.common_sql('a', 'b')} AS c FROM prs").fetchnumpy()["c"]
    assert np.array_equal(got, scal)


def test_round_vectorized():
    rng = np.random.default_rng(1652905717)
    lon, lat, maxx, maxy = _random_boxes(rng, 2000)
    qts = qtk.calculate(lon, lat, maxx, maxy)
    for level in (0, 1, 5, 15, 17):
        vec = qtk.round_qt(qts, level)
        scal = np.array([qtk.round_scalar(int(q), level) for q in qts])
        assert np.array_equal(vec, scal)


def test_tuple_string_roundtrips():
    rng = np.random.default_rng(1365379075)
    lon, lat, maxx, maxy = _random_boxes(rng, 2000)
    qts = qtk.calculate(lon, lat, maxx, maxy)
    qts = qts[qts >= 0]
    x, y, z = qtk.tuple_arr(qts)
    assert np.array_equal(qtk.from_tuple_arr(x, y, z), qts)
    for q in qts[:200]:
        assert qtk.from_string_scalar(qtk.string_scalar(int(q))) == int(q)
        xs, ys, zs = qtk.tuple_scalar(int(q))
        assert qtk.from_tuple_scalar(xs, ys, zs) == int(q)


def test_mercator_containment_invariant():
    rng = np.random.default_rng(442305722)
    """The *sound* pruning invariant: every box lies within its assigned
    cell's normalized-mercator bounds expanded by buffer·2^(1-depth) per side
    (this is the space findQuad descends in). The reference's degree-space
    bbox(qt, 0.05) is only a heuristic — it can clip at extreme latitudes —
    so the engine prunes in mercator space (cell_mercator_box)."""
    lon, lat, maxx, maxy = _random_boxes(rng, 2000)
    qts = qtk.calculate(lon, lat, maxx, maxy)
    ok = qts >= 0
    x0, y0, x1, y1 = qtk.cell_mercator_box(qts[ok])
    slop = 0.05 * np.power(2.0, 1.0 - (qts[ok] & 31).astype(np.float64)) + 1e-12
    bx0 = lon[ok] * 1e-7 / 180.0
    bx1 = maxx[ok] * 1e-7 / 180.0
    merc = lambda v: np.log(np.tan(np.pi * (1.0 + v * 1e-7 / 90.0) / 4.0)) / np.pi
    by0 = merc(lat[ok])
    by1 = merc(maxy[ok])
    assert (bx0 >= x0 - slop).all()
    assert (bx1 <= x1 + slop).all()
    assert (by0 >= y0 - slop).all()
    assert (by1 <= y1 + slop).all()
    # and tiles_overlapping_box never prunes a tile containing a hit
    mask = qtk.tiles_overlapping_box(qts[ok], int(lon[ok][0]), int(lat[ok][0]),
                                     int(maxx[ok][0]), int(maxy[ok][0]))
    assert mask[0]  # the box's own tile always survives its own query


def test_degree_bbox_is_heuristic():
    rng = np.random.default_rng(1366238532)
    """Document the reference behavior: degree-space bbox(qt, 0.05) contains
    the assigned box in the overwhelming majority of cases but not all."""
    lon, lat, maxx, maxy = _random_boxes(rng, 2000)
    qts = qtk.calculate(lon, lat, maxx, maxy)
    ok = qts >= 0
    bminx, bminy, bmaxx, bmaxy = qtk.bbox_arr(qts[ok], 0.05)
    contained = (
        (bminx <= lon[ok] + 1)
        & (bmaxx >= maxx[ok] - 1)
        & (bminy <= lat[ok] + 1)
        & (bmaxy >= maxy[ok] - 1)
    )
    assert contained.mean() > 0.995


def test_bbox_vec_matches_scalar():
    rng = np.random.default_rng(1284626363)
    lon, lat, maxx, maxy = _random_boxes(rng, 500)
    qts = qtk.calculate(lon, lat, maxx, maxy)
    qts = qts[qts >= 0]
    for buf in (0.0, 0.05):
        arr = qtk.bbox_arr(qts, buf)
        for i in range(0, len(qts), 37):
            assert qtk.bbox_scalar(int(qts[i]), buf) == tuple(int(v[i]) for v in arr)


def test_is_ancestor():
    rng = np.random.default_rng(1100195841)
    a = qtk.from_string_scalar("BC")
    assert qtk.is_ancestor(a, qtk.from_string_scalar("BCDA"))
    assert qtk.is_ancestor(a, a)
    assert not qtk.is_ancestor(a, qtk.from_string_scalar("BD"))
    assert not qtk.is_ancestor(qtk.from_string_scalar("BCDA"), a)
    assert qtk.is_ancestor(0, a)


def test_qt_common_col_matches_kernel(spark):
    """The pure-JVM qt_common expression (functions/udfs.py) is bit-exact
    vs the numpy kernel over random valid cells, sentinels, nulls, equal
    pairs and ancestor pairs — it replaces the pandas UDF in the calcqts
    and update hot paths (quadtree.cpp:189-213 semantics)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from osmquadtree_spark.functions.udfs import qt_common_col

    rng = np.random.default_rng(424242)
    N = 20000

    def rand_qts():
        lon = rng.integers(-1800000000, 1800000000, N)
        lat = rng.integers(-900000000, 900000000, N)
        base = qtk.calculate(lon, lat, lon, lat, buffer=0.05, max_depth=18)
        out = np.empty(N, np.int64)
        levs = rng.integers(0, 19, N)
        for lev in range(19):
            m = levs == lev
            out[m] = qtk.round_qt(base[m], lev)
        return out

    a, b = rand_qts(), rand_qts()
    a[:500] = -1
    b[250:750] = -1
    b[1000:2000] = a[1000:2000]  # equal pairs
    b[2000:3000] = qtk.round_qt(a[2000:3000], 3)  # ancestor pairs
    an, bn = a.copy(), b.copy()
    an[3000:3500] = -1  # null slots (null ≡ -1 fold identity)
    expected = qtk.common(an, bn)

    rows = [
        (None if 3000 <= i < 3500 else int(a[i]), int(b[i])) for i in range(N)
    ]
    schema = StructType(
        [StructField("a", LongType(), True), StructField("b", LongType(), True)]
    )
    df = spark.createDataFrame(rows, schema)
    got = np.array(
        [r[0] for r in df.select(qt_common_col("a", "b")).collect()], np.int64
    )
    assert (got == expected).all()
