"""Geometry-enrichment operator tests: style-table lookups, parent/relation
tag joins on constructed cases, and the 3857 fold math vs a scalar numpy
re-implementation of the reference formulas (utils.cpp:51-105). Full-value
oracle parity runs through the driver gate (geom_* queries)."""

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osmquadtree_spark.functions import geostyle as gs
from osmquadtree_spark.operators import geometry as geo

TAGS_SCHEMA = "id bigint, tags array<struct<key:string,val:string>>"


def _tags_df(spark, rows, id_name="id"):
    df = spark.createDataFrame(
        [(i, [{"key": k, "val": v} for k, v in tags]) for i, tags in rows], TAGS_SCHEMA
    )
    return df.withColumnRenamed("id", id_name)


def test_z_order_and_polygon(spark):
    df = _tags_df(spark, [
        (1, [("highway", "motorway")]),                      # 380
        (2, [("highway", "footway"), ("railway", "rail")]),  # max(100, 440)
        (3, [("building", "yes")]),                          # no z entry → NULL
        (4, [("natural", "coastline")]),                     # polygon-excluded
        (5, [("natural", "water")]),                         # polygon
        (6, [("highway", "services")]),                      # polygon-include
        (7, [("area", "no")]),                               # 'all' → polygon even for "no"
    ])
    out = {r.id: (r.z, r.poly) for r in df.select(
        "id", geo.z_order_col("tags").alias("z"), geo.is_polygon_col("tags").alias("poly")
    ).collect()}
    assert out[1] == (380, False)
    assert out[2] == (440, False)
    assert out[3] == (None, True)   # building → polygon
    assert out[4][1] is False
    assert out[5][1] is True
    assert out[6] == (None, True)
    assert out[7][1] is True        # reference check_polygon_tags: All matches any value


def test_filter_tags_drop_and_layer(spark):
    df = _tags_df(spark, [
        (1, [("highway", "track"), ("note", "x"), ("source:date", "y"), ("name", "n")]),
        (2, [("layer", "-2"), ("building", "yes")]),
        (3, [("layer", "abc")]),
    ])
    out = {r.id: r for r in geo.filter_tags_summary(df).collect()}
    assert out[1].n_kept == 2           # note dropped (exact), source:date dropped (prefix)
    assert out[1].has_feature is True
    assert out[2].layer == -2 and out[2].n_kept == 2
    assert out[3].layer is None and out[3].has_feature is False


def test_parent_tags_priority(spark):
    nodes = _tags_df(spark, [
        (1, [("highway", "bus_stop")]),
        (2, [("railway", "halt")]),
        (3, [("name", "x")]),           # not qualifying
    ], "node_id")
    ways = _tags_df(spark, [
        (10, [("highway", "footway"), ("service", "alley")]),
        (11, [("highway", "motorway")]),
        (12, [("highway", "services")]),  # not in priority table → ignored
    ], "way_id")
    refs = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 1), (10, 2), (10, 3)], "way_id bigint, node_id bigint"
    )
    out = {r.node_id: r for r in geo.parent_tags(nodes, ways, refs).collect()}
    assert out[1].parent_highway == "motorway"   # prio 21 beats footway 0
    assert out[1].parent_service == "alley"
    assert out[2].parent_highway == "footway"
    assert 3 not in out


def test_relation_tags_aggregation(spark):
    rels = _tags_df(spark, [
        (1, [("type", "boundary"), ("boundary", "administrative"), ("admin_level", "4")]),
        (2, [("type", "boundary"), ("boundary", "administrative"), ("admin_level", "2")]),
        (3, [("type", "boundary"), ("boundary", "administrative"), ("admin_level", "x")]),
        (4, [("type", "route"), ("route", "bus"), ("ref", "12")]),
        (5, [("type", "route"), ("route", "bus"), ("ref", "3")]),
    ], "rel_id")
    members = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 100), (5, 100), (3, 200)],
        "rel_id bigint, way_id bigint",
    )
    out = {r.way_id: r for r in geo.relation_tags(rels, members).collect()}
    assert out[100].min_admin_level == "2"      # "x" skipped (unparsable)
    assert out[100].max_admin_level == "4"
    assert out[100].bus_routes == "12; 3"       # sorted-string distinct join
    assert 200 not in out                       # only unparsable values → omitted


def _fwd(lon, lat):
    x = (lon * 1e-7) * gs.EARTH_WIDTH / 180.0
    y = math.log(math.tan(math.pi * (1.0 + (lat * 1e-7) / 90.0) / 4.0)) * gs.EARTH_WIDTH / math.pi
    return x, y


def test_fold_math_matches_scalar_reference(spark):
    rng = np.random.default_rng(3)
    lons = rng.integers(-1500000000, 1500000000, 7).tolist()
    lats = rng.integers(-800000000, 800000000, 7).tolist()
    lons.append(lons[0]); lats.append(lats[0])  # closed ring

    pts = [_fwd(a, b) for a, b in zip(lons, lats)]
    exp_len = sum(
        math.sqrt((pts[i][0] - pts[i-1][0]) ** 2 + (pts[i][1] - pts[i-1][1]) ** 2)
        for i in range(1, len(pts))
    )
    area = 0.0
    for i in range(1, len(pts)):
        area += pts[i-1][0] * pts[i][1]
        area -= pts[i-1][1] * pts[i][0]
    exp_area = -1.0 * area / 2.0

    nodes = spark.createDataFrame(
        list(zip(range(len(lons)), lons, lats)), "node_id bigint, lon bigint, lat bigint"
    )
    refs = spark.createDataFrame(
        [(1, i, i) for i in range(len(lons))], "way_id bigint, node_id bigint, pos bigint"
    )
    coords = geo.way_coord_arrays(refs, nodes)
    row = coords.select(
        geo.line_length_col(F.col("xs"), F.col("ys")).alias("ln"),
        geo.ring_area_col(F.col("xs"), F.col("ys")).alias("ar"),
    ).collect()[0]
    assert math.isclose(row.ln, exp_len, rel_tol=1e-12)
    assert math.isclose(row.ar, exp_area, rel_tol=1e-9)


def test_style_json_round_trip():
    """The config surface (GeometryStyle JSON analog): serialize → parse
    must reproduce the exact operator-facing tables, and the parsed tables
    must drive the operators identically to the module constants."""
    import json

    jj = json.loads(json.dumps(gs.style_to_json()))
    back = gs.style_from_json(jj)
    assert back["feature_keys"] == gs.FEATURE_KEYS
    assert back["other_keys"] == gs.OTHER_KEYS
    assert back["drop_keys"] == gs.DROP_KEYS
    assert back["polygon_tags"] == gs.POLYGON_TAGS
    assert back["z_order"] == gs.Z_ORDER
    assert back["parent_tags"] == gs.PARENT_TAG_SPECS
    assert back["relation_tags"] == gs.RELATION_TAG_SPECS
    assert back["minzoom_spec"] == gs.MINZOOM_SPEC


def test_ring_centroid_col_matches_kernel(spark):
    """Column-expression centroid (geometry.ring_centroid_cols) vs the
    python kernel restatement of utils.cpp:107-138 on synthetic rings."""
    import math

    from pyspark.sql import functions as F

    from osmquadtree_spark.operators import geometry as geo
    from osmquadtree_spark.operators.multipolygons import ring_centroid

    rows = []
    for k in range(1, 40):
        cx = (k * 7919) % 3_000_000_000 - 1_500_000_000
        cy = (k * 104729) % 1_400_000_000 - 700_000_000
        s = (k % 10) * 100_000 + 1_000_000
        pts = [
            (cx - s, cy - s), (cx + s, cy - s), (cx + s, cy + s),
            (cx - s, cy + s), (cx - s, cy - s),
        ]
        if k % 3 == 0:
            pts = list(reversed(pts))
        rows.append((k, [p[0] for p in pts], [p[1] for p in pts]))
    df = spark.createDataFrame(rows, "k bigint, lons array<bigint>, lats array<bigint>")
    ew = geo.gs.EARTH_WIDTH
    xs = F.transform("lons", lambda v: v * F.lit(1e-7) * F.lit(ew) / F.lit(180.0))
    ys = F.transform(
        "lats",
        lambda v: F.log(F.tan(F.lit(math.pi) * (F.lit(1.0) + v * F.lit(1e-7) / F.lit(90.0)) / F.lit(4.0)))
        * F.lit(ew) / F.lit(math.pi),
    )
    d = df.select("k", xs.alias("xs"), ys.alias("ys"))
    cxc, cyc = geo.ring_centroid_cols(F.col("xs"), F.col("ys"))
    got = {r.k: (r.cx, r.cy) for r in d.select("k", cxc.alias("cx"), cyc.alias("cy")).collect()}
    for k, lons, lats in rows:
        ex, ey = ring_centroid(list(zip(lons, lats)))
        gx, gy = got[k]
        assert abs(gx - ex) <= 1e-9 * max(1.0, abs(ex)), (k, gx, ex)
        assert abs(gy - ey) <= 1e-9 * max(1.0, abs(ey)), (k, gy, ey)


def test_minzoom_usage_counters(spark):
    """Usage counters (findminzoom.cpp:58-64): each element credits the spec
    row that decided its minzoom (smallest zoom; exact shadows wildcard)."""
    from pyspark.sql import functions as F

    from osmquadtree_spark.operators import geometry as geo

    spec = [
        (1, "highway", "motorway", 6),
        (1, "highway", "*", 13),
        (1, "railway", "rail", 8),
    ]
    rows = [
        (1, [("highway", "motorway")]),            # exact, z6
        (2, [("highway", "service")]),             # wildcard, z13
        (3, [("highway", "service"), ("railway", "rail")]),  # rail z8 wins
        (4, [("name", "x")]),                      # no match → no credit
    ]
    df = spark.createDataFrame(rows, "id bigint, tags array<struct<key:string,val:string>>")
    got = {
        (r.cls, r.key, r.val): r.n_used
        for r in geo.minzoom_usage(df, "tags", F.lit(1), ["id"], spec=spec).collect()
    }
    assert got == {
        (1, "highway", "motorway"): 1,
        (1, "highway", "*"): 1,
        (1, "railway", "rail"): 1,
    }


def test_way_stats_kernel_matches_column_folds(spark):
    """The Arrow-batch way_stats_kernel vs the Catalyst column folds
    (project_3857 ∘ line_length/ring_area) — including ring closing,
    degenerate sizes (0/1/2/3 points), and non-ring open polylines.

    Two gates: (1) the ACCUMULATION is bit-identical to a scalar
    left-to-right fold over the kernel's own projected points (the
    _seq_group_sums contract); (2) against the JVM column twin the values
    agree within the cross-libm envelope (np.tan and java.lang.Math.tan
    differ by a last ulp on some inputs — the same envelope the driver's
    floor-scaled gates absorb vs DuckDB), and every floor-gated driver
    output value is equal on this fixed seed."""
    rng = np.random.default_rng(11)
    rows_nodes = []
    rows_refs = []
    nid = 0
    for wid in range(1, 26):  # way_id 6,12,18,24 are rings under ring_mod=6
        npts = int(rng.integers(0, 9))
        for p in range(npts):
            rows_nodes.append((nid, int(rng.integers(-1700000000, 1700000000)),
                               int(rng.integers(-850000000, 850000000))))
            rows_refs.append((wid, nid, p))
            nid += 1
    nodes = spark.createDataFrame(rows_nodes, "node_id bigint, lon bigint, lat bigint")
    refs = spark.createDataFrame(rows_refs, "way_id bigint, node_id bigint, pos bigint")
    raw = geo.collect_way_coords(refs, nodes)

    is_ring = F.col("way_id") % 6 == 0
    cols = geo.project_3857(raw, close_ring=is_ring).select(
        "way_id",
        geo.line_length_col(F.col("xs"), F.col("ys")).alias("length_m"),
        geo.ring_area_col(F.col("xs"), F.col("ys")).alias("ring_area"),
        F.size("xs").alias("n_pts"),
    )
    kern = geo.way_stats_kernel(raw, ring_mod=6)
    a = {r.way_id: r for r in cols.collect()}
    b = {r.way_id: r for r in kern.collect()}
    assert set(a) == set(b) and len(a) > 0
    for wid in a:
        assert a[wid].n_pts == b[wid].n_pts, wid
        # cross-libm envelope vs the JVM twin (tan last-ulp)
        assert math.isclose(a[wid].length_m, b[wid].length_m, rel_tol=1e-13, abs_tol=0.0), wid
        assert math.isclose(a[wid].ring_area, b[wid].ring_area, rel_tol=1e-11, abs_tol=1e-6), wid
        # the driver-gate projections must be equal on this seed
        assert math.floor(a[wid].length_m) == math.floor(b[wid].length_m), wid
        assert math.floor(a[wid].ring_area / 65536.0) == math.floor(b[wid].ring_area / 65536.0), wid

    # accumulation-order contract: bit-identical to a scalar left-to-right
    # fold over the kernel's OWN projected points (_project_np — glibc
    # tan/log, the libm the DuckDB oracle pins; this block tests the FOLD
    # order, so it must share the kernel's projection exactly)
    from osmquadtree_spark.operators.multipolygons import _project_np

    raw_rows = {r.way_id: (list(r._lons), list(r._lats)) for r in raw.collect()}
    for wid, (lons, lats) in raw_rows.items():
        if wid % 6 == 0 and lons:
            lons = lons + [lons[0]]
            lats = lats + [lats[0]]
        x, y = _project_np(
            np.asarray(lons, np.int64), np.asarray(lats, np.int64)
        )
        ln = 0.0
        for i in range(1, len(x)):
            ln = ln + math.sqrt(
                (float(x[i]) - float(x[i - 1])) ** 2 + (float(y[i]) - float(y[i - 1])) ** 2
            )
        ar = 0.0
        for i in range(1, len(x)):
            ar = ar + float(x[i - 1]) * float(y[i])
            ar = ar + (-(float(y[i - 1]) * float(x[i])))
        exp_len = ln if len(x) >= 2 else 0.0
        exp_area = (-1.0 * ar / 2.0) if len(x) >= 3 else 0.0
        assert b[wid].length_m == exp_len, wid
        assert b[wid].ring_area == exp_area, wid


def test_layer_stoll_prefix_parse_last_wins(spark):
    """Reference layer parse is std::stoll (makegeometries.cpp:181-187):
    leading-integer prefix parse ('5.5'→5, '2;3'→2, '1a'→1), unparsable
    ignored, and the LAST parseable layer tag wins."""
    df = _tags_df(spark, [
        (1, [("layer", "5.5")]),
        (2, [("layer", "2;3")]),
        (3, [("layer", " +7a")]),
        (4, [("layer", "abc"), ("layer", "4")]),   # first unparsable, later wins
        (5, [("layer", "1"), ("layer", "9")]),     # last parseable wins
        (6, [("layer", "abc"), ("layer", "x2")]),  # none parseable
    ])
    out = {r.id: r.layer for r in geo.filter_tags_summary(df).collect()}
    assert out == {1: 5, 2: 2, 3: 7, 4: 4, 5: 9, 6: None}


def test_relation_tags_all_empty_values_omitted(spark):
    """find_list inserts '' values into the set but finish_way drops the
    tag when the joined result is EMPTY (handlerelations.cpp) — a way whose
    only route refs are '' must receive no bus_routes tag, not ''."""
    rels = _tags_df(spark, [
        (1, [("type", "route"), ("route", "bus"), ("ref", "")]),
        (2, [("type", "route"), ("route", "bus"), ("ref", "")]),
        (3, [("type", "route"), ("route", "bus"), ("ref", "9")]),
    ], "rel_id")
    members = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 300), (1, 300)],
        "rel_id bigint, way_id bigint",
    )
    out = {r.way_id: r for r in geo.relation_tags(rels, members).collect()}
    assert 100 not in out                 # all-empty set → tag omitted → no row
    assert out[300].bus_routes == "; 9"   # mixed set keeps the empty component
