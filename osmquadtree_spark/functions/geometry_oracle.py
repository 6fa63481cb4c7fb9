"""DuckDB oracle SQL for the geometry-enrichment operators, generated from
the SAME rule tables as the fixture (sources/osm_fixture.py WAY/NODE/REL_TAG_RULES)
and the SAME style tables (functions/geostyle.py) the Spark operators compile.

The oracles restate each stage as flat per-key columns (the fixture's tag
rules are static, so "tags array" logic lowers to CASE columns) — a match
therefore validates the operator's array/map algebra against the plain
relational spec.
"""

from __future__ import annotations

from . import geostyle as gs
from ..sources.osm_fixture import (
    NODE_TAG_RULES,
    REL_TAG_RULES,
    WAY_TAG_RULES,
    nodes_sql,
    way_pairs_sql,
)

EW = "CAST('20037508.342789244' AS DOUBLE)"


def _kv_cte(rules, src_sql: str, id_col: str) -> str:
    """One row per element with a v_<key> column per rule (NULL = absent)."""
    cols = []
    for key, val_sql, cond_sql in rules:
        w = f"CAST({id_col} AS BIGINT)"
        v = val_sql.replace("{w}", w)
        c = cond_sql.replace("{w}", w)
        cname = key.replace(":", "__")
        cols.append(f"CASE WHEN {c} THEN {v} END AS v_{cname}")
    return f"SELECT {id_col}, {', '.join(cols)} FROM ({src_sql})"


def _ways_src() -> str:
    return "SELECT o_orderkey AS way_id FROM orders"


def _present(rules):
    return [k for k, _, _ in rules]


def _z_order_sql(present_keys) -> str:
    per_key = []
    for key in sorted(gs.Z_ORDER):
        if key not in present_keys:
            continue
        cname = key.replace(":", "__")
        whens = " ".join(
            f"WHEN '{v}' THEN {z}" for v, z in sorted(gs.Z_ORDER[key].items())
        )
        per_key.append(f"CASE v_{cname} {whens} END")
    return "GREATEST(" + ", ".join(per_key) + ")" if per_key else "NULL"


def _is_polygon_sql(present_keys) -> str:
    conds = []
    for key in sorted(gs.POLYGON_TAGS):
        if key not in present_keys:
            continue
        typ, vals = gs.POLYGON_TAGS[key]
        cname = key.replace(":", "__")
        if typ == "all":
            conds.append(f"v_{cname} IS NOT NULL")
        elif typ == "include":
            vs = ", ".join(f"'{v}'" for v in sorted(vals))
            conds.append(f"v_{cname} IN ({vs})")
        else:
            vs = ", ".join(f"'{v}'" for v in sorted(vals))
            conds.append(f"(v_{cname} IS NOT NULL AND v_{cname} NOT IN ({vs}))")
    return "COALESCE(" + " OR ".join(conds) + ", FALSE)"


def geom_ways_sql() -> str:
    """(way_id, has_feature, n_kept, layer, z_order, is_polygon, geom_type):
    the make_geometries summary. geom_type: 2=Linestring,
    5=SimplePolygon (ring AND polygon-tagged) — baseelement.hpp:44-54."""
    keys = _present(WAY_TAG_RULES)
    feat = [k for k in keys if k in gs.FEATURE_KEYS]
    has_feature = " OR ".join(f"v_{k.replace(':','__')} IS NOT NULL" for k in feat)

    kept_terms = []
    for k in keys:
        cname = k.replace(":", "__")
        if k in gs.FEATURE_KEYS:
            kept_terms.append(f"(v_{cname} IS NOT NULL)::BIGINT")
        else:
            dropped = k in gs.DROP_KEYS or (
                ":" in k and (k.split(":", 1)[0] + ":") in gs.DROP_KEYS
            )
            if not dropped:  # all_other_keys=True
                kept_terms.append(f"(v_{cname} IS NOT NULL)::BIGINT")
    return f"""
WITH kv AS ({_kv_cte(WAY_TAG_RULES, _ways_src(), "way_id")})
SELECT way_id,
       ({has_feature}) AS has_feature,
       ({' + '.join(kept_terms)}) AS n_kept,
       -- stoll prefix parse (leading ws/sign/digits), unparsable -> NULL
       CAST(NULLIF(regexp_extract(v_layer, '^\\s*([+-]?[0-9]+)', 1), '') AS BIGINT) AS layer,
       ({_z_order_sql(keys)})::BIGINT AS z_order,
       {_is_polygon_sql(keys)} AS is_polygon,
       CASE WHEN way_id % 6 = 0 AND {_is_polygon_sql(keys)} THEN 5 ELSE 2 END AS geom_type
FROM kv
""".strip()


def geom_parent_tags_sql() -> str:
    """(node_id, parent_highway, parent_service) for qualifying nodes —
    max-priority (ties/no-priority → min way_id) value of the containing
    ways' spec key."""
    prio_whens = " ".join(f"WHEN '{v}' THEN {p}" for v, p in sorted(gs.HIGHWAY_PRIO.items()))
    return f"""
WITH nkv AS ({_kv_cte(NODE_TAG_RULES, nodes_sql(), "node_id")}),
wkv AS ({_kv_cte(WAY_TAG_RULES, _ways_src(), "way_id")}),
pairs AS (SELECT way_id, node_id FROM ({way_pairs_sql()})
          WHERE way_id IN (SELECT way_id FROM wkv)),
hw AS (
  SELECT node_id, v_highway AS val,
         ROW_NUMBER() OVER (PARTITION BY node_id
                            ORDER BY (CASE v_highway {prio_whens} END) DESC, way_id ASC) AS rn
  FROM pairs JOIN wkv USING (way_id)
  WHERE (CASE v_highway {prio_whens} END) IS NOT NULL
),
sv AS (
  SELECT node_id, v_service AS val,
         ROW_NUMBER() OVER (PARTITION BY node_id ORDER BY way_id ASC) AS rn
  FROM pairs JOIN wkv USING (way_id)
  WHERE v_service IS NOT NULL
)
SELECT n.node_id,
       CASE WHEN n.v_highway IS NOT NULL OR n.v_railway IS NOT NULL
            THEN h.val END AS parent_highway,
       CASE WHEN n.v_highway IS NOT NULL THEN s.val END AS parent_service
FROM nkv n
LEFT JOIN (SELECT node_id, val FROM hw WHERE rn = 1) h ON h.node_id = n.node_id
LEFT JOIN (SELECT node_id, val FROM sv WHERE rn = 1) s ON s.node_id = n.node_id
WHERE n.v_highway IS NOT NULL OR n.v_railway IS NOT NULL
""".strip()


def geom_rel_tags_sql() -> str:
    """(way_id, min_admin_level, max_admin_level, bus_routes,
    bicycle_routes) for ways receiving at least one value."""
    return """
WITH rkv AS ({kv}),
members AS (
  SELECT CAST(c_custkey AS BIGINT) AS rel_id,
         unnest([CAST(c_custkey AS BIGINT) * 3, CAST(c_custkey AS BIGINT) * 3 + 1]) AS way_id
  FROM customer
),
wexist AS (SELECT o_orderkey AS way_id FROM orders),
admin AS (
  SELECT m.way_id, TRY_CAST(r.v_admin_level AS BIGINT) AS av
  FROM rkv r JOIN members m USING (rel_id) JOIN wexist USING (way_id)
  WHERE r.v_type = 'boundary' AND r.v_boundary = 'administrative'
    AND r.v_admin_level IS NOT NULL
),
routes AS (
  SELECT m.way_id, r.v_route AS route, r.v_ref AS ref
  FROM rkv r JOIN members m USING (rel_id) JOIN wexist USING (way_id)
  WHERE r.v_type = 'route' AND r.v_ref IS NOT NULL
),
agg AS (
  -- all-unparsable values yield an empty result → tag omitted
  -- (handlerelations.cpp find_min/find_max return "")
  SELECT way_id,
         CAST(MIN(av) AS VARCHAR) AS min_admin_level,
         CAST(MAX(av) AS VARCHAR) AS max_admin_level
  FROM admin GROUP BY way_id
  HAVING MIN(av) IS NOT NULL
),
bus AS (
  -- all-empty ref set joins to '' -> tag omitted (find_list semantics)
  SELECT way_id, string_agg(DISTINCT ref, '; ' ORDER BY ref) AS bus_routes
  FROM routes WHERE route = 'bus' GROUP BY way_id
  HAVING string_agg(DISTINCT ref, '; ' ORDER BY ref) <> ''
),
bike AS (
  SELECT way_id, string_agg(DISTINCT ref, '; ' ORDER BY ref) AS bicycle_routes
  FROM routes WHERE route = 'bicycle' GROUP BY way_id
  HAVING string_agg(DISTINCT ref, '; ' ORDER BY ref) <> ''
)
SELECT COALESCE(a.way_id, b.way_id, k.way_id) AS way_id,
       a.min_admin_level, a.max_admin_level, b.bus_routes, k.bicycle_routes
FROM agg a
FULL OUTER JOIN bus b ON b.way_id = a.way_id
FULL OUTER JOIN bike k ON k.way_id = COALESCE(a.way_id, b.way_id)
""".format(kv=_kv_cte(REL_TAG_RULES, "SELECT CAST(c_custkey AS BIGINT) AS rel_id FROM customer", "rel_id")).strip()


def multipolygon_sql() -> str:
    """Ground truth for the multipolygon-assembly fixture: the member ways
    are constructed squares (split/reversed segments, optional inner hole,
    optional open fragment), so ring counts and shoelace areas are
    closed-form in the order key. Matching the assembled output therefore
    validates the stitching itself, not just bookkeeping."""

    def X(v):
        return f"(({v}) * 1e-7) * {EW} / 180e0"

    def Y(v):
        return f"ln(tan(pi() * (1e0 + (({v}) * 1e-7) / 90e0) / 4e0)) * {EW} / pi()"

    def _corners(cx, cy, s):
        # the members trace the square counterclockwise; the reference
        # formula (-sum/2, utils.cpp:103) makes CCW negative, so the
        # operator normalizes by REVERSING the assembled ring — its final
        # traversal is c0→c3→c2→c1→c0, walked here for bit-exact parity
        xs = [X(f"{cx} - {s}"), X(f"{cx} - {s}"), X(f"{cx} + {s}"), X(f"{cx} + {s}")]
        ys = [Y(f"{cy} - {s}"), Y(f"{cy} + {s}"), Y(f"{cy} + {s}"), Y(f"{cy} - {s}")]
        return xs, ys

    def square_area(cx, cy, s):
        xs, ys = _corners(cx, cy, s)
        terms = []
        for i in range(4):
            j = (i + 1) % 4
            terms.append(f"+ ({xs[i]}) * ({ys[j]})")
            terms.append(f"- ({ys[i]}) * ({xs[j]})")
        return f"(-1e0 * (0e0 {' '.join(terms)}) / 2e0)"

    def square_centroid(cx, cy, s, axis):
        # calc_ring_centroid's fold over the same traversal: per step
        # cross = x·y' - x'·y; acc += (c + c')·cross; area += cross;
        # result = acc / ((area/2) * 6) — left-assoc sums mirror the += order
        xs, ys = _corners(cx, cy, s)
        cs = xs if axis == "x" else ys
        crosses, accs = [], []
        for i in range(4):
            j = (i + 1) % 4
            cr = f"(({xs[i]}) * ({ys[j]}) - ({xs[j]}) * ({ys[i]}))"
            crosses.append(cr)
            accs.append(f"(({cs[i]}) + ({cs[j]})) * {cr}")
        acc = "(0e0 + " + " + ".join(accs) + ")"
        area = "((0e0 + " + " + ".join(crosses) + ") / 2e0)"
        return f"({acc} / ({area} * 6e0))"

    return f"""
WITH ks AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         (o_orderkey * 7919) % 3000000000 - 1500000000 AS cx,
         (o_orderkey * 104729) % 1400000000 - 700000000 AS cy,
         (o_orderkey % 10) * 100000 + 1000000 AS s
  FROM orders
)
SELECT k AS rel_id,
       1::BIGINT AS n_outers,
       (k % 3 = 0)::BIGINT AS n_inners,
       (k % 5 = 0)::BIGINT AS n_open,
       CAST(floor({square_area('cx', 'cy', 's')} / 65536e0) AS BIGINT) AS outer_area_64k,
       CAST(floor((CASE WHEN k % 3 = 0 THEN {square_area('cx', 'cy', '(s // 2)')} ELSE 0e0 END) / 65536e0) AS BIGINT) AS inner_area_64k,
       (1 + (k % 3 = 0)::INT)::BIGINT AS wkb_n_rings,
       (5 + 5 * (k % 3 = 0)::INT)::BIGINT AS wkb_n_points,
       CAST(floor({square_centroid('cx', 'cy', 's', 'x')} / 16e0) AS BIGINT) AS centroid_x_16,
       CAST(floor({square_centroid('cx', 'cy', 's', 'y')} / 16e0) AS BIGINT) AS centroid_y_16
FROM ks
""".strip()


def geom_minzoom_sql() -> str:
    """findminzoom over the fixture: nodes class 0, ways class 1 or
    (polygon-typed rings) class 2 with the geometric zoom raise."""
    keys = _present(WAY_TAG_RULES)

    # per-class tag-zoom CASE chains from MINZOOM_SPEC (exact shadows *)
    by_ck: dict[tuple[int, str], dict[str, int]] = {}
    for cls, key, val, z in gs.MINZOOM_SPEC:
        by_ck.setdefault((cls, key), {})[val] = z

    def cls_expr(cls: int, present) -> str:
        cands = []
        for (c, key), vals in sorted(by_ck.items()):
            if c != cls or key not in present:
                continue
            cname = key.replace(":", "__")
            wild = vals.get("*")
            whens = " ".join(
                f"WHEN '{v}' THEN {z}" for v, z in sorted(vals.items()) if v != "*"
            )
            if whens:
                tail = f"ELSE {wild}" if wild is not None else "ELSE NULL"
                cands.append(
                    f"CASE WHEN v_{cname} IS NOT NULL THEN (CASE v_{cname} {whens} {tail} END) END"
                )
            else:
                cands.append(f"CASE WHEN v_{cname} IS NOT NULL THEN {wild} END")
        if not cands:
            return "NULL"
        return "LEAST(" + ", ".join(cands) + ")" if len(cands) > 1 else cands[0]

    node_keys = _present(NODE_TAG_RULES)
    rz = lambda res: (
        f"(CASE WHEN abs({res}) < 0.001e0 THEN 20e0 "
        f"ELSE ln({EW} * 2e0 / ({res}) / 256e0) / ln(2e0) END)"
    )
    x = f"(lon * 1e-7) * {EW} / 180e0"
    y = f"ln(tan(pi() * (1e0 + (lat * 1e-7) / 90e0) / 4e0)) * {EW} / pi()"
    length = (
        "CASE WHEN len(xs) >= 2 THEN "
        "list_reduce(list_prepend(0e0, list_transform(range(2, len(xs) + 1), "
        "i -> sqrt((xs[i] - xs[i-1]) * (xs[i] - xs[i-1]) "
        "+ (ys[i] - ys[i-1]) * (ys[i] - ys[i-1])))), (a, b) -> a + b) ELSE 0e0 END"
    )
    area = (
        "abs(CASE WHEN len(xs) >= 3 THEN "
        "-1e0 * list_reduce(list_prepend(0e0, flatten(list_transform(range(2, len(xs) + 1), "
        "i -> [xs[i-1] * ys[i], -(ys[i-1] * xs[i])]))), (a, b) -> a + b) / 2e0 ELSE 0e0 END)"
    )
    ml, ma = gs.MINZOOM_MINLEN, gs.MINZOOM_MINAREA
    return f"""
WITH nkv AS ({_kv_cte(NODE_TAG_RULES, nodes_sql(), "node_id")}),
wkv AS ({_kv_cte(WAY_TAG_RULES, _ways_src(), "way_id")}),
pts AS (
  SELECT way_id, list({x} ORDER BY node_id) AS xs0, list({y} ORDER BY node_id) AS ys0
  FROM ({way_pairs_sql()}) p JOIN ({nodes_sql()}) n USING (node_id)
  GROUP BY way_id
), closed AS (
  SELECT way_id,
         CASE WHEN way_id % 6 = 0 THEN list_append(xs0, xs0[1]) ELSE xs0 END AS xs,
         CASE WHEN way_id % 6 = 0 THEN list_append(ys0, ys0[1]) ELSE ys0 END AS ys
  FROM pts
), wstats AS (
  SELECT way_id, {length} AS ln_m, {area} AS area_m, len(xs) AS npts FROM closed
), wc AS (
  SELECT w.way_id,
         CASE WHEN w.way_id % 6 = 0 AND {_is_polygon_sql(keys)} THEN 2 ELSE 1 END AS gclass,
         s.ln_m, s.area_m, s.npts,
         {cls_expr(1, keys)} AS zt1, {cls_expr(2, keys)} AS zt2
  FROM wkv w JOIN wstats s USING (way_id)
)
SELECT 0 AS element_type, node_id AS id, ({cls_expr(0, node_keys)})::BIGINT AS minzoom
FROM nkv
UNION ALL
SELECT 1, way_id,
  CASE WHEN gclass = 1 THEN
    CASE WHEN zt1 IS NULL THEN NULL
         ELSE GREATEST(zt1::BIGINT, trunc({rz(f'ln_m / {ml!r}')})::BIGINT) END
  ELSE
    CASE WHEN zt2 IS NULL THEN NULL
         ELSE GREATEST(zt2::BIGINT, trunc({rz(f'sqrt(area_m / {ma!r})')})::BIGINT) END
  END
FROM wc
WHERE NOT (way_id % 6 = 0 AND npts < 4)
""".strip()


def tag_packers_sql() -> str:
    """hstore text / sorted-key json / binary-hex packers from the way tag
    rules (fixture values are escape-free; escaping is unit-tested)."""
    entries = []  # (key, value_expr, cond) in rule (tag) order
    for key, val_sql, cond_sql in WAY_TAG_RULES:
        w = "CAST(way_id AS BIGINT)"
        entries.append((key, val_sql.replace("{w}", w), cond_sql.replace("{w}", w)))

    hstore_items = ", ".join(
        f"CASE WHEN {c} THEN '\"{k}\"=>\"' || ({v}) || '\"' END" for k, v, c in entries
    )
    json_items = ", ".join(
        f"CASE WHEN {c} THEN '\"{k}\":\"' || ({v}) || '\"' END"
        for k, v, c in sorted(entries)
    )
    bin_items = ", ".join(
        f"CASE WHEN {c} THEN upper(printf('%08x', length('{k}'))) || hex(encode('{k}'))"
        f" || upper(printf('%08x', length({v}))) || hex(encode({v})) END"
        for k, v, c in entries
    )
    n_tags = " + ".join(f"({c})::BIGINT" for _, _, c in entries)
    return f"""
SELECT way_id,
  COALESCE(array_to_string(list_filter([{hstore_items}], x -> x IS NOT NULL), ', '), '') AS hstore,
  '{{' || COALESCE(array_to_string(list_filter([{json_items}], x -> x IS NOT NULL), ','), '') || '}}' AS json,
  upper(printf('%08x', {n_tags}))
    || COALESCE(array_to_string(list_filter([{bin_items}], x -> x IS NOT NULL), ''), '') AS hstore_bin_hex
FROM (SELECT o_orderkey AS way_id FROM orders)
""".strip()


def geojson_tiles_sql() -> str:
    """Per-(tile, kind) FeatureCollections: points from the node rules +
    point cell (depth 17) rounded to level 3; LineStrings / Polygons from
    the ways at round(way-bbox cell, 3), rings closed by re-appending the
    first vertex."""
    from . import sql_oracle as so
    from .calcqts_oracle import way_qts_sql

    def _props(rules, idc):
        entries = []
        for key, val_sql, cond_sql in rules:
            w = f"CAST({idc} AS BIGINT)"
            entries.append((key, val_sql.replace("{w}", w), cond_sql.replace("{w}", w)))
        json_items = ", ".join(
            f"CASE WHEN {c} THEN '\"{k}\":\"' || ({v}) || '\"' END"
            for k, v, c in sorted(entries)
        )
        return (
            "'{' || COALESCE(array_to_string(list_filter(["
            + json_items
            + "], x -> x IS NOT NULL), ','), '') || '}'"
        )

    point_base = f"""
SELECT node_id, lon AS minx, lat AS miny, lon AS maxx, lat AS maxy
FROM ({nodes_sql()})"""
    nprops = _props(NODE_TAG_RULES, "node_id")
    point_feature = (
        "'{\"type\":\"Feature\",\"geometry\":{\"type\":\"Point\",\"coordinates\":['"
        " || printf('%.7f', lon * 1e-7) || ',' || printf('%.7f', lat * 1e-7)"
        f" || ']}},\"properties\":' || {nprops} || '}}'"
    )
    wprops = _props(WAY_TAG_RULES, "way_id")
    line_feature = (
        "'{\"type\":\"Feature\",\"geometry\":{\"type\":\"LineString\",\"coordinates\":['"
        " || array_to_string(cl, ',')"
        f" || ']}},\"properties\":' || {wprops} || '}}'"
    )
    poly_feature = (
        "'{\"type\":\"Feature\",\"geometry\":{\"type\":\"Polygon\",\"coordinates\":[['"
        " || array_to_string(list_append(cl, cl[1]), ',')"
        f" || ']]}},\"properties\":' || {wprops} || '}}'"
    )
    collection = (
        "'{\"type\":\"FeatureCollection\",\"features\":['"
        " || array_to_string(list(feature ORDER BY oid), ',') || ']}'"
    )
    return f"""
WITH pq AS ({so.calculate_cte(point_base, "node_id")}),
nfeats AS (
  SELECT n.node_id AS oid, {so.round_sql('pq.qt', 3)} AS tile, {point_feature} AS feature
  FROM ({nodes_sql()}) n JOIN pq USING (node_id)
),
wq AS ({way_qts_sql()}),
wpts AS (
  SELECT way_id, list(printf('[%.7f,%.7f]', lon * 1e-7, lat * 1e-7) ORDER BY node_id) AS cl
  FROM ({way_pairs_sql()}) p JOIN ({nodes_sql()}) n USING (node_id)
  GROUP BY way_id
),
wfeats AS (
  SELECT w.way_id AS oid, {so.round_sql('wq.qt', 3)} AS tile,
         way_id % 6 = 0 AS isring,
         CASE WHEN way_id % 6 = 0 THEN {poly_feature} ELSE {line_feature} END AS feature
  FROM wpts w JOIN wq USING (way_id)
)
SELECT tile, 'point' AS kind, {collection} AS geojson FROM nfeats GROUP BY tile
UNION ALL
SELECT tile, 'line', {collection} FROM wfeats WHERE NOT isring GROUP BY tile
UNION ALL
SELECT tile, 'polygon', {collection} FROM wfeats WHERE isring GROUP BY tile
""".strip()


def geom_way_stats_sql() -> str:
    """(way_id, length_3857, ring_area): fold-ordered segment sums in 3857;
    rings (way_id % 6 = 0) are closed by appending the first point."""
    x = f"(lon * 1e-7) * {EW} / 180e0"
    y = f"ln(tan(pi() * (1e0 + (lat * 1e-7) / 90e0) / 4e0)) * {EW} / pi()"
    return f"""
WITH pts AS (
  SELECT way_id,
         list({x} ORDER BY node_id) AS xs0,
         list({y} ORDER BY node_id) AS ys0
  FROM ({way_pairs_sql()}) p JOIN ({nodes_sql()}) n USING (node_id)
  GROUP BY way_id
), closed AS (
  SELECT way_id,
         CASE WHEN way_id % 6 = 0 THEN list_append(xs0, xs0[1]) ELSE xs0 END AS xs,
         CASE WHEN way_id % 6 = 0 THEN list_append(ys0, ys0[1]) ELSE ys0 END AS ys
  FROM pts
)
SELECT way_id,
       CAST(floor(CASE WHEN len(xs) >= 2 THEN
         list_reduce(list_prepend(0e0, list_transform(range(2, len(xs) + 1),
           i -> sqrt((xs[i] - xs[i-1]) * (xs[i] - xs[i-1])
                   + (ys[i] - ys[i-1]) * (ys[i] - ys[i-1])))), (a, b) -> a + b)
       ELSE 0e0 END) AS BIGINT) AS length_m_floor,
       CASE WHEN way_id % 6 = 0 AND len(xs) < 4 THEN NULL ELSE
       CAST(floor((CASE WHEN len(xs) >= 3 THEN
         -1e0 * list_reduce(list_prepend(0e0, flatten(list_transform(range(2, len(xs) + 1),
           i -> [xs[i-1] * ys[i], -(ys[i-1] * xs[i])]))), (a, b) -> a + b) / 2e0
       ELSE 0e0 END) / 65536e0) AS BIGINT) END AS ring_area_64k
FROM closed
""".strip()
