"""Geometry-enrichment operators — the reference's process_geometry stages
(tag filter / typing / z_order, parent-tag join, relation-tag join, line
length + ring area) as DataFrame transformations.

Tags are `array<struct<key:string,val:string>>` (the reference's ordered tag
vector). Everything here is JVM-side column algebra over a broadcast-size
style spec (functions/geostyle.py) — the reference drives the same tables
through per-element C++ loops (makegeometries.cpp, addparenttags.cpp,
handlerelations.cpp); in Spark each stage is one join + one aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import geostyle as gs


def _tag_map(tags_col):
    return F.map_from_entries(tags_col)


def fix_str_col(s):
    """fix_str (/root/reference/src/elements/element.cpp:111-127): remove
    every U+007F (DEL) code point. The reference decodes to UTF-32, drops
    char 127, re-encodes; ``replace`` on the one-codepoint string is the
    same transformation without the round-trip."""
    return F.replace(s, F.lit("\x7f"), F.lit(""))


def fix_tags_col(tags_col):
    """fix_tags (/root/reference/src/elements/element.cpp:89-109): sort tags
    by their (original) key, then strip char-127 from keys and values in
    place — note the reference sorts BEFORE fixing, so ordering follows the
    dirty keys. std::sort's order for duplicate keys is unspecified; we
    tie-break deterministically on the value (array_sort's struct compare),
    a legal refinement."""
    col = F.col(tags_col) if isinstance(tags_col, str) else tags_col
    return F.transform(
        F.array_sort(col),
        lambda t: F.struct(
            fix_str_col(t["key"]).alias("key"), fix_str_col(t["val"]).alias("val")
        ),
    )


def filter_tags_summary(
    df: DataFrame,
    tags_col: str = "tags",
    feature_keys=gs.FEATURE_KEYS,
    other_keys=gs.OTHER_KEYS,
    drop_keys=gs.DROP_KEYS,
    all_other_keys: bool = True,
    all_objs: bool = False,
) -> DataFrame:
    """Adds has_feature / n_kept / layer per filter_tags
    (makegeometries.cpp:156-195): feature keys always kept and set
    has_feature; other keys kept unless dropped (exact key or its
    ``prefix:`` up to the first colon ∈ drop_keys); ``layer`` parsed from
    the raw tags (invalid integers ignored)."""
    tags = F.col(tags_col)
    feats = F.array(*[F.lit(k) for k in sorted(feature_keys)])
    others = F.array(*[F.lit(k) for k in sorted(other_keys)])
    drops = F.array(*[F.lit(k) for k in sorted(drop_keys)])

    def is_drop(k):
        prefix = F.concat(F.substring_index(k, ":", 1), F.lit(":"))
        return F.array_contains(drops, k) | (
            k.contains(":") & F.array_contains(drops, prefix)
        )

    def kept(t):
        k = t["key"]
        is_feat = F.array_contains(feats, k)
        is_other = F.lit(all_other_keys) | F.array_contains(others, k)
        return is_feat | (is_other & ~is_drop(k))

    n_kept = F.size(F.filter(tags, kept))
    has_feature = F.exists(tags, lambda t: F.array_contains(feats, t["key"]))
    if all_objs:
        has_feature = has_feature | (n_kept > 0)
    # reference layer parse is std::stoll (makegeometries.cpp:181-187):
    # leading whitespace/sign/digits prefix ("5.5"→5, "2;3"→2, "1a"→1),
    # unparsable values ignored, and the loop overwrites on success so the
    # LAST parseable layer tag wins — not a strict full-string cast of the
    # first one
    layer_vals = F.filter(tags, lambda t: t["key"] == F.lit("layer"))
    parsed = F.filter(
        F.transform(
            layer_vals,
            lambda t: F.nullif(
                F.regexp_extract(t["val"], r"^\s*([+-]?\d+)", 1), F.lit("")
            ),
        ),
        lambda v: v.isNotNull(),
    )
    layer = F.when(F.size(parsed) > 0, F.element_at(parsed, -1).cast("bigint"))
    return df.withColumn("has_feature", has_feature).withColumn(
        "n_kept", n_kept.cast("bigint")
    ).withColumn("layer", layer)


def z_order_col(tags_col):
    """calc_zorder (makegeometries.cpp:124-131): max over the per-key value
    tables; absent → NULL. The tables are compiled into one CASE chain."""
    m = _tag_map(F.col(tags_col))
    per_key = []
    for key in sorted(gs.Z_ORDER):
        v = m[key]
        expr = None
        for val, z in sorted(gs.Z_ORDER[key].items()):
            cond = v == F.lit(val)
            expr = F.when(cond, F.lit(z)) if expr is None else expr.when(cond, F.lit(z))
        per_key.append(expr)
    return F.greatest(*per_key).cast("bigint")


def is_polygon_col(tags_col):
    """check_polygon_tags (makegeometries.cpp:197-222): any tag whose key's
    rule accepts the value (All / Include-set / Exclude-set)."""
    m = _tag_map(F.col(tags_col))
    conds = []
    for key in sorted(gs.POLYGON_TAGS):
        typ, vals = gs.POLYGON_TAGS[key]
        v = m[key]
        if typ == "all":
            conds.append(v.isNotNull())
        elif typ == "include":
            conds.append(v.isin(*sorted(vals)))
        else:
            conds.append(v.isNotNull() & ~v.isin(*sorted(vals)))
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return F.coalesce(out, F.lit(False))


def parent_tags(
    node_tags: DataFrame,
    way_tags: DataFrame,
    way_refs: DataFrame,
    specs=gs.PARENT_TAG_SPECS,
) -> DataFrame:
    """Parent-tag join (addparenttags.cpp:53-209): a node carrying any
    qualifier key receives, per spec, the containing way's value of
    ``way_key`` — the highest-priority value when the spec has a priority
    table (ties and the no-priority case resolve to the smallest way_id,
    the reference's first-in-stream order for id-sorted tiles).

    node_tags: (node_id, tags); way_tags: (way_id, tags);
    way_refs: (way_id, node_id). Output: (node_id, <out_tag> per spec)."""
    out = None
    for out_tag, node_keys, way_key, prio in specs:
        nk = F.array(*[F.lit(k) for k in node_keys])
        qual = node_tags.filter(
            F.exists(F.col("tags"), lambda t: F.array_contains(nk, t["key"]))
        ).select("node_id")
        wval = _tag_map(F.col("tags"))[way_key]
        ways = way_tags.select("way_id", wval.alias("_val")).filter(F.col("_val").isNotNull())
        if prio:
            pr = None
            for val, p in sorted(prio.items()):
                c = F.col("_val") == F.lit(val)
                pr = F.when(c, F.lit(p)) if pr is None else pr.when(c, F.lit(p))
            ways = ways.withColumn("_prio", pr).filter(F.col("_prio").isNotNull())
        else:
            ways = ways.withColumn("_prio", F.lit(0))
        cand = qual.join(way_refs, "node_id").join(ways, "way_id")
        w = Window.partitionBy("node_id").orderBy(
            F.col("_prio").desc(), F.col("way_id").asc()
        )
        best = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node_id", F.col("_val").alias(out_tag))
        )
        picked = qual.join(best, "node_id", "left")
        out = picked if out is None else out.join(picked, "node_id", "outer")
    return out


def relation_tags(
    rel_tags: DataFrame,
    rel_way_members: DataFrame,
    specs=gs.RELATION_TAG_SPECS,
) -> DataFrame:
    """Relation-tag join (handlerelations.cpp:37-167): relations passing a
    spec's source filter send their ``source_key`` value to every way
    member; each way aggregates per spec — min / max over integer-parsed
    values (unparsable skipped, stringified back) or the "; "-joined sorted
    distinct list. Ways with no non-empty result are omitted.

    rel_tags: (rel_id, tags); rel_way_members: (rel_id, way_id)."""
    m = _tag_map(F.col("tags"))
    per_spec = []
    for idx, (target, source_filter, source_key, typ) in enumerate(specs):
        cond = m[source_key].isNotNull()
        for k, v in sorted(source_filter.items()):
            cond = cond & ((m[k] == F.lit(v)) if v != "*" else m[k].isNotNull())
        vals = (
            rel_tags.filter(cond)
            .select("rel_id", m[source_key].alias("_val"))
            .join(rel_way_members, "rel_id")
        )
        if typ in ("min", "max"):
            iv = F.col("_val").try_cast("bigint")
            agg = F.min(iv) if typ == "min" else F.max(iv)
            res = (
                vals.groupBy("way_id")
                .agg(agg.alias("_i"))
                .select("way_id", F.col("_i").cast("string").alias(target))
            )
        else:
            res = (
                vals.groupBy("way_id")
                .agg(F.array_sort(F.collect_set("_val")).alias("_l"))
                .select("way_id", F.array_join("_l", "; ").alias(target))
            )
        # reference find_list/find_min/find_max return "" for an all-empty
        # (or all-unparsable) value set and finish_way drops the tag on
        # empty (handlerelations.cpp) — != '' covers both that and the
        # NULL min/max case (NULL != '' is NULL, filtered)
        per_spec.append(res.filter(F.col(target) != F.lit("")))
    out = per_spec[0]
    for p in per_spec[1:]:
        out = out.join(p, "way_id", "outer")
    return out


def res_zoom_col(res):
    """res_zoom (findminzoom.cpp:35-38): log2 of earth_width*2/res/256 via
    the ln-ratio (identical op sequence in the SQL twin); |res|<0.001 → 20."""
    z = F.log(F.lit(gs.EARTH_WIDTH) * F.lit(2.0) / res / F.lit(256.0)) / F.log(F.lit(2.0))
    return F.when(F.abs(res) < F.lit(0.001), F.lit(20.0)).otherwise(z)


def minzoom_tags_col(tags_col, geom_class_col, spec=None):
    """tags_zoom (findminzoom.cpp:67-125): minimum spec minzoom over the
    element's tags for its geometry class; an exact (class, key, value)
    entry shadows the (class, key, *) wildcard. NULL = no spec tag."""
    spec = spec if spec is not None else gs.MINZOOM_SPEC
    m = _tag_map(F.col(tags_col))
    per_class: dict[int, list] = {}
    by_ck: dict[tuple[int, str], dict[str, int]] = {}
    for cls, key, val, z in spec:
        by_ck.setdefault((cls, key), {})[val] = z
    for (cls, key), vals in sorted(by_ck.items()):
        v = m[key]
        expr = None
        wildcard = vals.get("*")
        for val, z in sorted(vals.items()):
            if val == "*":
                continue
            cond = v == F.lit(val)
            expr = F.when(cond, F.lit(z)) if expr is None else expr.when(cond, F.lit(z))
        if expr is None:
            cand = F.when(v.isNotNull(), F.lit(wildcard))
        elif wildcard is not None:
            cand = F.when(v.isNotNull(), expr.otherwise(F.lit(wildcard)))
        else:
            cand = expr
        per_class.setdefault(cls, []).append(cand)
    out = None
    for cls in sorted(per_class):
        cands = per_class[cls]
        val = F.least(*cands) if len(cands) > 1 else cands[0]
        branch = (geom_class_col == F.lit(cls), val)
        out = F.when(*branch) if out is None else out.when(*branch)
    return out.cast("bigint")


def tags_minzoom_join(
    df: DataFrame,
    tags_col,
    geom_class_col,
    id_cols: list[str],
    spec=None,
) -> DataFrame:
    """Tag minzoom via a broadcast spec join — the full-default-spec path.

    The 726-row default table is DATA, not code: compiling it into one CASE
    expression produces a thousand-node Catalyst tree that falls out of
    whole-stage codegen, and at 10^12 rows an interpreted 726-branch CASE
    per row loses badly to a broadcast hash lookup. The reference itself
    does a map lookup per tag (findminzoom.cpp:105-121); this restates it as
    explode(tags) ⨝ broadcast(spec): exact (class, key, value) hits shadow
    the (class, key, *) wildcard via coalesce, and the element's tag zoom is
    the MIN over its matching tags (check_tag keeps the smallest).

    Returns one row per input element with ≥1 matching tag:
    (*id_cols, _zt bigint)."""
    spec = spec if spec is not None else gs.MINZOOM_SPEC
    spark = df.sparkSession
    sdf = spark.createDataFrame(
        [(c, k, v, z) for c, k, v, z in spec], "cls int, key string, val string, z bigint"
    )
    exact = sdf.filter(F.col("val") != "*").withColumnRenamed("z", "_ze")
    wild = sdf.filter(F.col("val") == "*").select("cls", "key", F.col("z").alias("_zw"))
    t = df.select(
        *id_cols,
        geom_class_col.cast("int").alias("cls"),
        F.explode(F.col(tags_col) if isinstance(tags_col, str) else tags_col).alias("_t"),
    ).select(*id_cols, "cls", F.col("_t.key").alias("key"), F.col("_t.val").alias("val"))
    j = (
        t.join(F.broadcast(exact), ["cls", "key", "val"], "left")
        .join(F.broadcast(wild), ["cls", "key"], "left")
        .withColumn("_cand", F.coalesce(F.col("_ze"), F.col("_zw")))
    )
    return j.groupBy(*id_cols).agg(F.min("_cand").alias("_zt")).filter(
        F.col("_zt").isNotNull()
    )


def minzoom_usage(
    df: DataFrame,
    tags_col,
    geom_class_col,
    id_cols: list[str],
    spec=None,
) -> DataFrame:
    """findminzoom usage counters (the tagmap's second slot,
    findminzoom.cpp:58-64, incremented at 121): how many elements each spec
    row decided. Winner per element = the matching row with the smallest
    zoom; equal-zoom ties break deterministically (exact before wildcard,
    then key, then value) — the reference's tie order is its per-element
    tag iteration order, which is data-dependent; counts can differ only
    between equal-zoom multi-matches. Returns (cls, key, val, z, n_used)."""
    spec = spec if spec is not None else gs.MINZOOM_SPEC
    spark = df.sparkSession
    sdf = spark.createDataFrame(
        [(c, k, v, z) for c, k, v, z in spec], "cls int, key string, val string, z bigint"
    )
    exact = sdf.filter(F.col("val") != "*").select(
        "cls", "key", "val", F.col("z").alias("_ze")
    )
    wild = sdf.filter(F.col("val") == "*").select(
        "cls", "key", F.col("z").alias("_zw")
    )
    t = df.select(
        *id_cols,
        geom_class_col.cast("int").alias("cls"),
        F.explode(F.col(tags_col) if isinstance(tags_col, str) else tags_col).alias("_t"),
    ).select(*id_cols, "cls", F.col("_t.key").alias("key"), F.col("_t.val").alias("val"))
    j = (
        t.join(F.broadcast(exact), ["cls", "key", "val"], "left")
        .join(F.broadcast(wild), ["cls", "key"], "left")
        .withColumn("_z", F.coalesce(F.col("_ze"), F.col("_zw")))
        .withColumn("_wildcard", F.col("_ze").isNull() & F.col("_zw").isNotNull())
        .filter(F.col("_z").isNotNull())
    )
    w = Window.partitionBy(*id_cols).orderBy(
        F.col("_z").asc(), F.col("_wildcard").asc(), F.col("key").asc(), F.col("val").asc()
    )
    winners = j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return (
        winners.select(
            "cls",
            "key",
            F.when(F.col("_wildcard"), F.lit("*")).otherwise(F.col("val")).alias("val"),
            F.col("_z").alias("z"),
        )
        .groupBy("cls", "key", "val", "z")
        .agg(F.count(F.lit(1)).alias("n_used"))
    )


def with_minzoom(
    df: DataFrame,
    tags_col,
    geom_class_col,
    id_cols: list[str],
    length_col=None,
    area_col=None,
    minlen: float = None,
    minarea: float = None,
    spec=None,
    out_col: str = "minzoom",
) -> DataFrame:
    """findminzoom calculate (findminzoom.cpp:127-161) over the full spec:
    join-based tag zoom (tags_minzoom_join) raised by the geometric zoom —
    length_zoom for linestrings (class 1), area_zoom for polygons (class 2).
    NULL minzoom = no spec tag matched (the reference drops those features;
    callers decide)."""
    minlen = gs.MINZOOM_MINLEN if minlen is None else minlen
    minarea = gs.MINZOOM_MINAREA if minarea is None else minarea
    zt_df = tags_minzoom_join(df, tags_col, geom_class_col, id_cols, spec)
    out = df.join(zt_df, id_cols, "left")
    zt = F.col("_zt")
    zg = _geom_zoom_col(geom_class_col, length_col, area_col, minlen, minarea)
    return out.withColumn(
        out_col,
        F.when(zt.isNull(), F.lit(None).cast("bigint")).otherwise(F.greatest(zt, zg)),
    ).drop("_zt")


def _geom_zoom_col(geom_class_col, length_col, area_col, minlen, minarea):
    """Geometric zoom floor (findminzoom.cpp:127-161): length_zoom for
    linestrings (class 1), area_zoom for polygons (class 2), 0 otherwise —
    the one definition shared by with_minzoom and minzoom_col so a clamp
    or cast fix cannot fork between them."""
    zg = F.lit(0).cast("bigint")
    if length_col is not None and minlen > 0:
        zl = res_zoom_col(length_col / F.lit(minlen))
        zg = F.when(geom_class_col == 1, zl.cast("bigint")).otherwise(zg)
    if area_col is not None and minarea > 0:
        za = res_zoom_col(F.sqrt(area_col / F.lit(minarea)))
        zg = F.when(geom_class_col == 2, za.cast("bigint")).otherwise(zg)
    return zg


def minzoom_col(
    tags_col,
    geom_class_col,
    length_col=None,
    area_col=None,
    minlen: float = gs.MINZOOM_MINLEN,
    minarea: float = gs.MINZOOM_MINAREA,
    spec=None,
):
    """calculate (findminzoom.cpp:127-161): tag minzoom raised by the
    geometric zoom — length_zoom(len/minlen) for linestrings (class 1),
    area_zoom(sqrt(area/minarea)) for polygons (class 2); truncation toward
    zero like the C cast."""
    zt = minzoom_tags_col(tags_col, geom_class_col, spec)
    zg = _geom_zoom_col(geom_class_col, length_col, area_col, minlen, minarea)
    return F.when(zt.isNull(), F.lit(None).cast("bigint")).otherwise(
        F.greatest(zt, zg)
    )


# -- metric geometry (EPSG:3857 fold math, utils.cpp:51-105) ------------------


def collect_way_coords(way_refs: DataFrame, nodes: DataFrame) -> DataFrame:
    """(way_id, _lons, _lats): raw fixed-point member coordinates ordered by
    ref position — the shared upstream of every coordinate consumer
    (metrics, minzoom, WKB, GeoJSON); callers memoize/checkpoint it once."""
    located = way_refs.join(nodes.select("node_id", "lon", "lat"), "node_id")
    return (
        located.groupBy("way_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))).alias("_pts"))
        .select(
            "way_id",
            F.transform("_pts", lambda p: p["lon"]).alias("_lons"),
            F.transform("_pts", lambda p: p["lat"]).alias("_lats"),
        )
    )


def project_3857(pts: DataFrame, close_ring=None) -> DataFrame:
    """(way_id, _lons, _lats) → (way_id, xs, ys) in EPSG:3857; when
    ``close_ring`` (a way_id predicate column) holds, the first point is
    appended to close the ring (OSM rings store first==last; the fixture
    stores open rings)."""
    if close_ring is not None:
        pts = pts.select(
            "way_id",
            F.when(close_ring, F.concat("_lons", F.slice("_lons", 1, 1))).otherwise(F.col("_lons")).alias("_lons"),
            F.when(close_ring, F.concat("_lats", F.slice("_lats", 1, 1))).otherwise(F.col("_lats")).alias("_lats"),
        )
    xs = F.transform("_lons", lambda v: v * F.lit(1e-7) * F.lit(gs.EARTH_WIDTH) / F.lit(180.0))
    ys = F.transform(
        "_lats",
        lambda v: F.log(
            F.tan(F.lit(math.pi) * (F.lit(1.0) + v * F.lit(1e-7) / F.lit(90.0)) / F.lit(4.0))
        )
        * F.lit(gs.EARTH_WIDTH)
        / F.lit(math.pi),
    )
    return pts.select("way_id", xs.alias("xs"), ys.alias("ys"))


def way_coord_arrays(way_refs: DataFrame, nodes: DataFrame, close_ring=None) -> DataFrame:
    """(way_id, xs, ys): member coordinates projected to 3857, ordered by
    ref position (collect_way_coords ∘ project_3857)."""
    return project_3857(collect_way_coords(way_refs, nodes), close_ring)


def line_length_col(xs, ys):
    """calc_line_length (utils.cpp:68-81): left-to-right fold of segment
    hypotenuses — the fold order fixes float associativity so the DuckDB
    twin is bit-identical."""
    idx = F.sequence(F.lit(2), F.size(xs))
    seg = F.transform(
        idx,
        lambda i: F.sqrt(
            (F.element_at(xs, i) - F.element_at(xs, i - 1))
            * (F.element_at(xs, i) - F.element_at(xs, i - 1))
            + (F.element_at(ys, i) - F.element_at(ys, i - 1))
            * (F.element_at(ys, i) - F.element_at(ys, i - 1))
        ),
    )
    total = F.aggregate(seg, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(F.size(xs) >= 2, total).otherwise(F.lit(0.0))


def ring_centroid_cols(xs, ys):
    """calc_ring_centroid (utils.cpp:107-138) as fold expressions over the
    3857 coordinate arrays: per step cross = x·y' - x'·y, the axis sums
    accumulate (c + c')·cross, area accumulates cross and is halved before
    the /6. Returns (x, y) Columns; NULL below 3 points (the reference's
    1/2-point special cases live in the kernel form,
    operators/multipolygons.ring_centroid)."""
    idx = F.sequence(F.lit(2), F.size(xs))

    def cross(i):
        return F.element_at(xs, i - 1) * F.element_at(ys, i) - F.element_at(
            xs, i
        ) * F.element_at(ys, i - 1)

    def acc(cs):
        terms = F.transform(
            idx, lambda i: (F.element_at(cs, i - 1) + F.element_at(cs, i)) * cross(i)
        )
        return F.aggregate(terms, F.lit(0.0), lambda a, v: a + v)

    area = (
        F.aggregate(F.transform(idx, cross), F.lit(0.0), lambda a, v: a + v) / F.lit(2.0)
    )
    guard = F.size(xs) >= 3
    return (
        F.when(guard, acc(xs) / (area * F.lit(6.0))),
        F.when(guard, acc(ys) / (area * F.lit(6.0))),
    )


def ring_area_col(xs, ys):
    """calc_ring_area (utils.cpp:84-105): shoelace fold in 3857,
    anticlockwise-positive via the final -area/2. Same accumulation order
    as the reference (x*y' added, y*x' subtracted per step)."""
    idx = F.sequence(F.lit(2), F.size(xs))
    # two single-product terms per step — the reference adds x·y' then
    # subtracts y·x' as SEPARATE accumulations (utils.cpp:98-99), and a
    # combined x·y'-y·x' expression invites engine-dependent FMA fusion
    terms = F.flatten(
        F.transform(
            idx,
            lambda i: F.array(
                F.element_at(xs, i - 1) * F.element_at(ys, i),
                -(F.element_at(ys, i - 1) * F.element_at(xs, i)),
            ),
        )
    )
    area = F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(F.size(xs) >= 3, F.lit(-1.0) * area / F.lit(2.0)).otherwise(F.lit(0.0))


def way_stats_kernel(coords: DataFrame, ring_mod: int = 6) -> DataFrame:
    """Arrow-batch twin of project_3857 ∘ (line_length_col, ring_area_col)
    over the raw coordinate arrays: (way_id, _lons, _lats) →
    (way_id, length_m, ring_area, n_pts).

    Same math as the reference folds (utils.cpp:68-105) and BIT-IDENTICAL
    to the Catalyst column forms (the parity oracle, tests/test_geometry):
    the mercator projection is numpy float64 through the same libm, and the
    per-way fold runs through multipolygons._seq_group_sums — a strictly
    left-to-right accumulation (numpy's pairwise ``sum``/``reduceat`` would
    drift by ulps the floor-scaled driver gates can amplify). Rings
    (way_id % ring_mod == 0) are closed by appending the first point, so
    the closing segment / closing shoelace terms land LAST in the fold,
    exactly where F.concat(xs, slice(xs,1,1)) puts them. ``n_pts`` is the
    closed point count (the degenerate-ring gate input).

    Scale shape: one mapInPandas stage, per-vertex work all vectorized —
    replaces interpreted per-element Catalyst lambda folds (~5-10× on the
    sf0.1 fixture) while keeping the column twin as the parity oracle."""
    import numpy as np
    import pandas as pd

    from .multipolygons import _project_np, _seq_group_sums

    def gen(batches):
        for pdf in batches:
            ids = pdf["way_id"].to_numpy(np.int64)
            n = len(ids)
            if n == 0:
                yield pd.DataFrame(
                    {"way_id": ids, "length_m": [], "ring_area": [], "n_pts": []}
                )
                continue
            lens = pdf["_lons"].map(len).to_numpy(np.int64)
            total0 = int(lens.sum())
            flon = (
                np.concatenate([np.asarray(a, np.int64) for a in pdf["_lons"]])
                if total0
                else np.zeros(0, np.int64)
            )
            flat = (
                np.concatenate([np.asarray(a, np.int64) for a in pdf["_lats"]])
                if total0
                else np.zeros(0, np.int64)
            )
            offs = np.zeros(n + 1, np.int64)
            np.cumsum(lens, out=offs[1:])
            # close rings: append each ring row's first point (no-op when empty)
            ring = (ids % ring_mod == 0) & (lens > 0)
            newlens = lens + ring.astype(np.int64)
            noffs = np.zeros(n + 1, np.int64)
            np.cumsum(newlens, out=noffs[1:])
            total = int(noffs[-1])
            rid = np.repeat(np.arange(n), newlens)
            pos = np.arange(total) - noffs[rid]
            src = offs[rid] + np.where(pos == lens[rid], 0, pos)
            X, Y = _project_np(flon[src], flat[src])

            # edge heads: every index that is not a row's last point
            head = np.ones(total, dtype=bool)
            ends = noffs[1:]
            ends = ends[ends > 0]
            head[ends - 1] = False
            h = np.flatnonzero(head)
            ec = np.maximum(newlens - 1, 0)
            estarts = np.zeros(n, np.int64)
            np.cumsum(ec[:-1], out=estarts[1:])

            dx = X[h + 1] - X[h]
            dy = Y[h + 1] - Y[h]
            seg = np.sqrt(dx * dx + dy * dy)
            length = _seq_group_sums(seg, estarts, ec)
            length = np.where(newlens >= 2, length, 0.0)

            # shoelace: x·y' then -(y·x') as SEPARATE accumulations (the
            # reference's order; a fused x·y'-y·x' invites FMA divergence)
            terms = np.empty(2 * len(h))
            terms[0::2] = X[h] * Y[h + 1]
            terms[1::2] = -(Y[h] * X[h + 1])
            asum = _seq_group_sums(terms, 2 * estarts, 2 * ec)
            area = np.where(newlens >= 3, -1.0 * asum / 2.0, 0.0)

            yield pd.DataFrame(
                {
                    "way_id": ids,
                    "length_m": length,
                    "ring_area": area,
                    "n_pts": newlens,
                }
            )

    return coords.select("way_id", "_lons", "_lats").mapInPandas(
        gen, "way_id bigint, length_m double, ring_area double, n_pts int"
    )
